"""NeuralShader: positional-encoded position -> diffuse MLP, then specular
head over [features, normal, view_dir] with sigmoid output.

Flax port of the reference shader (deformer/modules/neuralshader.py:8-90 with
the default config of garment_deformer_configs.yml: fourier_features
'positional', fft_scale 4, 3x256 hidden, relu, sigmoid last):

* positional encoding = [x, sin(2^k x), cos(2^k x)] for k=0..3
  (embedder.py:5-50 with include_input, log_sampling);
* diffuse = FC(enc -> 256, 3 hidden layers of 256, relu, no last activation)
  (fc.py FC + neuralshader.py:27-29);
* specular = FC(256+3+3 -> 3, one hidden layer of 128, relu, sigmoid).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["NeuralShaderConfig", "NeuralShader", "positional_encoding"]


@dataclasses.dataclass(frozen=True)
class NeuralShaderConfig:
    hidden_features_size: int = 256
    hidden_features_layers: int = 3
    fft_scale: int = 4  # num_freqs; max_freq_log2 = fft_scale - 1


def positional_encoding(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """NeRF-style encoding (embedder.py:10-38): [x] + [sin/cos(2^k x)]."""
    out = [x]
    for k in range(num_freqs):
        f = 2.0 ** k
        out.append(jnp.sin(x * f))
        out.append(jnp.cos(x * f))
    return jnp.concatenate(out, axis=-1)


class NeuralShader(nn.Module):
    cfg: NeuralShaderConfig = NeuralShaderConfig()

    @nn.compact
    def __call__(self, position, normal, view_dir):
        c = self.cfg
        h = positional_encoding(position, c.fft_scale)
        # FC(in, out, [hidden]*layers): hidden blocks with relu, then a plain
        # output layer (fc.py FC semantics)
        for i in range(c.hidden_features_layers):
            h = nn.relu(nn.Dense(c.hidden_features_size, name=f"diffuse{i}")(h))
        h = nn.Dense(c.hidden_features_size, name="diffuse_out")(h)
        h = jnp.concatenate([h, normal, view_dir], axis=-1)
        h = nn.relu(nn.Dense(c.hidden_features_size // 2, name="specular0")(h))
        return nn.sigmoid(nn.Dense(3, name="specular_out")(h))

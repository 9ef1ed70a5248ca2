"""DrapeNet-style decoder components (alternative UDF decoder family).

JAX rebuild of the reference's alternative decoder module (reference:
AutoEncoder-Garment_Diffusion/AutoEncoder_dgcnn/models/drapenet.py:8-252 --
present in the reference tree but not imported by any trainer; kept for
component parity). Pieces:

* :class:`SkipMLP` -- ``skip_connection`` (drapenet.py:8-80): width x depth
  MLP with weight-normalized linears, the ORIGINAL input re-concatenated at
  the configured skip layers, LeakyReLU (or ReLU) between layers, optional
  softmax head;
* :class:`LbsPbs` -- ``lbs_pbs`` (drapenet.py:164-200): a pose encoder and a
  per-point deformation-matrix network combined with
  ``einsum("bpi,bpij->bpj")``, optional softmax over blend weights;
* :func:`nerf_embedder` -- the vendored NeRF positional embedding
  (drapenet.py:204-252): identity ++ sin/cos at ``2^0..2^(multires-1)``
  log-spaced frequencies.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["SkipMLP", "LbsPbs", "nerf_embedder"]


class WNDense(nn.Module):
    """Weight-normalized Dense: W = g * v / ||v||_rows (torch weight_norm
    dim=0 semantics: one gain per output unit, norm over the input axis)."""

    features: int

    @nn.compact
    def __call__(self, x):
        d_in = x.shape[-1]
        v = self.param(
            "v", nn.initializers.lecun_normal(), (d_in, self.features), jnp.float32
        )
        g = self.param(
            "g",
            lambda k, s: jnp.linalg.norm(
                nn.initializers.lecun_normal()(k, (d_in, self.features)), axis=0
            ),
            (self.features,),
        )
        b = self.param("b", nn.initializers.zeros, (self.features,))
        w = v * (g / (jnp.linalg.norm(v, axis=0) + 1e-12))[None, :]
        return x @ w + b


class SkipMLP(nn.Module):
    """``skip_connection`` MLP (drapenet.py:8-80)."""

    d_out: int
    width: int = 256
    depth: int = 8
    skip_layer: Tuple[int, ...] = ()
    weight_norm: bool = True
    relu: bool = False

    @nn.compact
    def __call__(self, x, softmax: bool = False):
        act = jax.nn.relu if self.relu else (lambda h: jax.nn.leaky_relu(h, 0.01))
        dims = [x.shape[-1]] + [self.width] * self.depth + [self.d_out]
        inp = x
        h = x
        n_layers = len(dims)
        for l in range(n_layers - 1):
            if l in self.skip_layer:
                h = jnp.concatenate([h, inp], axis=-1)
            layer = WNDense if self.weight_norm else nn.Dense
            h = layer(dims[l + 1], name=f"lin{l}")(h)
            if l < n_layers - 2:
                h = act(h)
        return jax.nn.softmax(h, axis=-1) if softmax else h


class _LbsModule(nn.Module):
    """``lbs_pbs_module`` (drapenet.py:83-161): 5-linear LeakyReLU MLP with
    optional input-skip before lin3; ``matrix=True`` reshapes to (..., K, 3)."""

    d_out: int
    hidden: int = 256
    matrix: bool = False
    skip: bool = False

    @nn.compact
    def __call__(self, x):
        inp = x
        h = jax.nn.leaky_relu(nn.Dense(self.hidden, name="lin1")(x), 0.01)
        h = jax.nn.leaky_relu(nn.Dense(self.hidden, name="lin2")(h), 0.01)
        if self.skip:
            h = jnp.concatenate([h, inp], axis=-1)
        h = jax.nn.leaky_relu(nn.Dense(self.hidden, name="lin3")(h), 0.01)
        h = nn.Dense(self.hidden, name="lin4")(h)
        h = nn.Dense(self.d_out, name="lin5")(jax.nn.leaky_relu(h, 0.01))
        if self.matrix:
            return h.reshape(*h.shape[:-1], -1, 3)
        return h


class LbsPbs(nn.Module):
    """``lbs_pbs`` (drapenet.py:164-200): delta_x = enc(theta) . M(x)."""

    d_out_p: int
    hidden_theta: int = 256
    hidden_matrix: int = 256
    skip: bool = False
    soft_max: bool = False

    @nn.compact
    def __call__(self, theta, x):
        enc = _LbsModule(self.d_out_p, self.hidden_theta, skip=self.skip,
                         name="lbs_theta")(theta)  # (B, N, P)
        mat = _LbsModule(self.d_out_p * 3, self.hidden_matrix, matrix=True,
                         skip=self.skip, name="lbs_matrix")(x)  # (B, N, P, 3)
        if self.soft_max:
            enc = jax.nn.softmax(enc, axis=-1)
        return jnp.einsum("bpi,bpij->bpj", enc, mat)


def nerf_embedder(multires: int):
    """-> (embed_fn, out_dim): identity ++ sin/cos at log-spaced 2^k freqs
    (drapenet.py:204-252, include_input=True, input_dims=3)."""
    freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires)
    out_dim = 3 + 3 * 2 * multires

    def embed(x):
        parts = [x]
        for f in freqs:
            parts.append(jnp.sin(x * f))
            parts.append(jnp.cos(x * f))
        return jnp.concatenate(parts, axis=-1)

    return embed, out_dim

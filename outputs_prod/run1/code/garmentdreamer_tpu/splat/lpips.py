"""LPIPS perceptual metric (VGG16 backbone) in Flax.

Rebuild of the reference's vendored lpipsPyTorch (reference:
gaussiansplatting/lpipsPyTorch/modules/lpips.py + networks.py, used by
gaussiansplatting/metrics.py:45 for the vanilla-3DGS eval): input scaled by
the LPIPS shift/scale constants, VGG16 relu{1_2,2_2,3_3,4_3,5_3} features,
channel-unit-normalized, squared diffs through non-negative 1x1 "lin" heads,
spatial mean, summed over stages.

No torchvision/lpips wheels (and no egress) exist in this image, so weights
load through :func:`convert_lpips_torch` from a standard
``lpips.LPIPS(net='vgg')`` state dict when one is provided; random-init
otherwise (architecture/shape parity, same policy as the SD/ViT converters).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LPIPS", "lpips_distance", "convert_lpips_torch"]

# lpips.ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv plan: (out_channels, n_convs) per stage; features tapped after
# the last relu of each stage (torchvision vgg16.features indices 3,8,15,22,29)
_STAGES: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class _VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        feats = []
        li = 0
        for si, (ch, n_convs) in enumerate(_STAGES):
            for _ in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{li}")(x)
                x = nn.relu(x)
                li += 1
            feats.append(x)
            if si < len(_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """x, y: (B, H, W, 3) in [0, 1] -> (B,) LPIPS distances."""
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        def prep(im):
            im = im * 2.0 - 1.0  # lpips expects [-1, 1]
            return (im - shift) / scale

        vgg = _VGG16Features(name="vgg")
        fx = vgg(prep(x))
        fy = vgg(prep(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(
                f"lin{i}", nn.initializers.uniform(0.1), (d.shape[-1],), jnp.float32
            )
            # non-negative 1x1 head (lpips clamps lin weights >= 0)
            total = total + jnp.mean(
                jnp.sum(d * jnp.abs(w)[None, None, None, :], axis=-1), axis=(1, 2)
            )
        return total


def lpips_distance(params, x, y) -> jnp.ndarray:
    return LPIPS().apply(params, jnp.asarray(x), jnp.asarray(y))


def convert_lpips_torch(state_dict: Dict[str, "np.ndarray"]) -> Dict:
    """``lpips.LPIPS(net='vgg')`` torch state dict -> our param tree.

    torch keys: ``net.slice{1..5}.{idx}.weight/bias`` (conv, OIHW) and
    ``lin{0..4}.model.1.weight`` ((1, C, 1, 1) non-negative heads).
    """
    params: Dict = {"vgg": {}}
    # rebuild the flat conv ordering from slices
    li = 0
    for slice_i, (_, n_convs) in enumerate(_STAGES, start=1):
        idxs = sorted(
            {
                int(k.split(".")[2])
                for k in state_dict
                if k.startswith(f"net.slice{slice_i}.") and k.endswith(".weight")
            }
        )
        assert len(idxs) == n_convs, (slice_i, idxs)
        for idx in idxs:
            w = np.asarray(state_dict[f"net.slice{slice_i}.{idx}.weight"])
            b = np.asarray(state_dict[f"net.slice{slice_i}.{idx}.bias"])
            params["vgg"][f"conv{li}"] = {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # OIHW->HWIO
                "bias": jnp.asarray(b),
            }
            li += 1
    for i in range(len(_STAGES)):
        w = np.asarray(state_dict[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        params[f"lin{i}"] = jnp.asarray(w.reshape(-1))
    return {"params": params}

"""DINOv2 vision transformer backbone (Flax, NHWC patches) for the Metric3D
normal estimator -- stage 2 of the pipeline.

TPU-native re-design of the reference backbone
(reference: Normal_estimator_Metric3D/mono/model/backbones/ViT_DINO_reg.py:755-1290,
factory ``vit_large_reg`` at :1251-1268 -- patch 14, embed 1024, depth 24,
heads 16, mlp_ratio 4, layerscale 1e-5, 4 register tokens).

Key behavioral facts mirrored from the reference:

* tokens = [cls, reg0..reg3, patch...] with the register tokens inserted
  *after* position embedding is added to [cls, patch...]
  (ViT_DINO_reg.py:936-955 -- registers get NO position embedding);
* the position table is stored for a 37x37 grid (img 518 / patch 14) and
  bicubically resized to the actual patch grid (ViT_DINO_reg.py:906-934);
* ``vit_large_reg`` has ``multi_output=False``, so the "four feature taps"
  consumed by the decoder are all the SAME final-layer layernormed tokens
  (ViT_DINO_reg.py:1015-1029) -- we therefore return one token tensor and let
  the decoder read it four times;
* inputs whose H/W are not multiples of the patch size are bilinearly resized
  up (not padded) to the next multiple (ViT_DINO_reg.py:981-991); the
  canonical 616x1064 crop divides evenly so this is a no-op in the pipeline.

TPU design: attention uses ``jax.nn.dot_product_attention`` (fused flash-style
kernel on TPU); everything runs in a configurable compute dtype (bf16 for the
MXU) with f32 params; the 3349-token sequence (44*76+5) is padded to a
128-lane-friendly shape by XLA automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ViTConfig", "DinoViT"]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    layerscale_init: float = 1e-5
    pos_grid: int = 37  # img_size 518 // patch 14
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def large_reg() -> "ViTConfig":
        """vit_large_reg (ViT_DINO_reg.py:1251-1268)."""
        return ViTConfig()

    @staticmethod
    def tiny() -> "ViTConfig":
        """Small config for tests: same topology, ~1000x fewer params."""
        return ViTConfig(patch_size=14, embed_dim=64, depth=2, num_heads=4, pos_grid=4)


def _torch_bicubic_matrix(
    g_in: int, g_out: int, offset: float = 0.1, a: float = -0.75
) -> np.ndarray:
    """(g_out, g_in) weight matrix reproducing torch
    ``F.interpolate(mode="bicubic", align_corners=False, antialias=False)``
    called with DINOv2's ``scale_factor=(g_out + offset)/g_in`` workaround
    (reference ViT_DINO_reg.py:918-928, interpolate_offset=0.1). Border taps
    are index-clamped, like torch's bounded access."""

    def W(x: float) -> float:
        x = abs(x)
        if x <= 1.0:
            return (a + 2) * x**3 - (a + 3) * x**2 + 1.0
        if x < 2.0:
            return a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a
        return 0.0

    s = (g_out + offset) / g_in
    M = np.zeros((g_out, g_in), np.float64)
    for i in range(g_out):
        src = (i + 0.5) / s - 0.5
        i0 = int(np.floor(src))
        t = src - i0
        for k in range(-1, 3):
            j = min(max(i0 + k, 0), g_in - 1)
            M[i, j] += W(k - t)
    return M.astype(np.float32)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        d = self.cfg.embed_dim
        h = int(d * self.cfg.mlp_ratio)
        x = nn.Dense(h, dtype=self.cfg.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(d, dtype=self.cfg.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, N, D = x.shape
        qkv = nn.Dense(3 * D, dtype=c.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = D // c.num_heads
        q = q.reshape(B, N, c.num_heads, hd)
        k = k.reshape(B, N, c.num_heads, hd)
        v = v.reshape(B, N, c.num_heads, hd)
        o = jax.nn.dot_product_attention(q, k, v)
        o = o.reshape(B, N, D)
        return nn.Dense(D, dtype=c.dtype, name="proj")(o)


class LayerScale(nn.Module):
    dim: int
    init: float

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.constant(self.init), (self.dim,))
        return x * gamma.astype(x.dtype)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        y = nn.LayerNorm(dtype=c.dtype, name="norm1")(x)
        y = Attention(c, name="attn")(y)
        x = x + LayerScale(c.embed_dim, c.layerscale_init, name="ls1")(y)
        y = nn.LayerNorm(dtype=c.dtype, name="norm2")(x)
        y = Mlp(c, name="mlp")(y)
        x = x + LayerScale(c.embed_dim, c.layerscale_init, name="ls2")(y)
        return x


class DinoViT(nn.Module):
    """Returns final-layer layernormed tokens ``(B, 1+R+HW, D)`` plus the
    patch-grid shape; the decoder splits cls+registers from patches
    (reference return contract: ViT_DINO_reg.py:1015-1029 feeding
    RAFTDepthNormalDPTDecoder5.py:888-904)."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> Tuple[jnp.ndarray, Tuple[int, int]]:
        c = self.cfg
        B, H, W, _ = img.shape
        p = c.patch_size
        # Resize (not pad) to a multiple of the patch size (ViT_DINO_reg.py:981-991).
        Hp, Wp = H, W
        if H % p or W % p:
            Hp = H + (p - H % p) % p
            Wp = W + (p - W % p) % p
            img = jax.image.resize(img, (B, Hp, Wp, img.shape[-1]), method="bilinear")
        gh, gw = Hp // p, Wp // p

        x = nn.Conv(
            c.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=c.dtype, name="patch_embed",
        )(img.astype(c.dtype))
        x = x.reshape(B, gh * gw, c.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(1e-6), (1, 1, c.embed_dim)
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, c.pos_grid * c.pos_grid + 1, c.embed_dim),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, c.embed_dim)).astype(x.dtype), x], axis=1)
        x = x + self._interp_pos(pos, gh, gw).astype(x.dtype)

        if c.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.truncated_normal(1e-6),
                (1, c.num_register_tokens, c.embed_dim),
            )
            reg = jnp.broadcast_to(reg, (B, c.num_register_tokens, c.embed_dim))
            x = jnp.concatenate([x[:, :1], reg.astype(x.dtype), x[:, 1:]], axis=1)

        for i in range(c.depth):
            x = Block(c, name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=c.dtype, name="norm")(x)
        return x, (gh, gw)

    def _interp_pos(self, pos: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
        """Bicubic resize of the 37x37 patch position table to (gh, gw),
        exactly matching the reference (ViT_DINO_reg.py:906-934): torch
        bicubic (a=-0.75, align_corners=False, antialias=False) with the
        DINOv2 scale_factor +0.1 offset workaround. Expressed as two small
        matmuls (host-built weight matrices), which is both MXU-friendly and
        kernel-exact -- jax.image.resize's bicubic uses the Keys a=-0.5
        kernel, a real numeric divergence vs the checkpoint's pretraining."""
        g = self.cfg.pos_grid
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (gh, gw) != (g, g):
            grid = patch_pos.reshape(g, g, self.cfg.embed_dim).astype(jnp.float32)
            Mh = jnp.asarray(_torch_bicubic_matrix(g, gh))
            Mw = jnp.asarray(_torch_bicubic_matrix(g, gw))
            out = jnp.einsum("ai,ijd,bj->abd", Mh, grid, Mw)
            patch_pos = out.reshape(1, gh * gw, self.cfg.embed_dim).astype(pos.dtype)
        return jnp.concatenate([cls_pos, patch_pos], axis=1)

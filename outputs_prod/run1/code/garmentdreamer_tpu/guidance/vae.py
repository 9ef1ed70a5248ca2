"""AutoencoderKL (the SD VAE) in Flax, NHWC.

Architecture of the "stabilityai/stable-diffusion-2-1-base" VAE the reference
encodes renders with (reference: stable_diffusion_guidance.py:159-183
encode_images / decode_latents; scaling_factor 0.18215). Encoder downsamples
512^2x3 -> 64^2x8 (mean ++ logvar), decoder mirrors. Mid blocks carry a single
full self-attention at 64^2 tokens -- fine as one fused XLA attention.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn

from garmentdreamer_tpu.core.fused_gn import FusedGroupNorm
import jax
import jax.numpy as jnp

__all__ = ["VAEConfig", "Encoder", "Decoder", "AutoencoderKL"]

SD_VAE_SCALING = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = SD_VAE_SCALING
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def sd() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(16, 32), layers_per_block=1, norm_groups=8)


class VaeResnet(nn.Module):
    out_channels: int
    norm_groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = FusedGroupNorm(num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = FusedGroupNorm(num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VaeSelfAttention(nn.Module):
    norm_groups: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = FusedGroupNorm(num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        attn = jnp.einsum("bnc,bmc->bnm", q, k) / math.sqrt(c)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bnm,bmc->bnc", attn, v)
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return res + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dt = cfg.dtype
        x = x.astype(dt)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dt, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VaeResnet(ch, cfg.norm_groups, dt, name=f"down_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), dtype=dt, name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = VaeResnet(ch, cfg.norm_groups, dt, name="mid_res_0")(h)
        h = VaeSelfAttention(cfg.norm_groups, dt, name="mid_attn")(h)
        h = VaeResnet(ch, cfg.norm_groups, dt, name="mid_res_1")(h)
        h = FusedGroupNorm(num_groups=cfg.norm_groups, epsilon=1e-6, dtype=dt, name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(h)
        # diffusers applies a 1x1 quant_conv on [mean ++ logvar]
        h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=dt, name="quant_conv")(h)
        return h.astype(jnp.float32)  # (B, H/8, W/8, 2*latent)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dt = cfg.dtype
        z = z.astype(dt)
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=dt, name="post_quant_conv")(z)
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=dt, name="conv_in")(z)
        h = VaeResnet(ch, cfg.norm_groups, dt, name="mid_res_0")(h)
        h = VaeSelfAttention(cfg.norm_groups, dt, name="mid_attn")(h)
        h = VaeResnet(ch, cfg.norm_groups, dt, name="mid_res_1")(h)
        for i, ch_i in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = VaeResnet(ch_i, cfg.norm_groups, dt, name=f"up_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), method="nearest")
                h = nn.Conv(cc, (3, 3), padding=1, dtype=dt, name=f"up_{i}_upsample")(h)
        h = FusedGroupNorm(num_groups=cfg.norm_groups, epsilon=1e-6, dtype=dt, name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(h)
        return h.astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """encode(images in [-1,1]) -> (mean, logvar); decode(latents) -> images."""

    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")

    def encode(self, x):
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def sample_latents(self, x, rng):
        """posterior sample * scaling_factor (reference encode_images)."""
        mean, logvar = self.encode(x)
        eps = jax.random.normal(rng, mean.shape, mean.dtype)
        z = mean + jnp.exp(0.5 * logvar) * eps
        return z * self.config.scaling_factor

    def decode(self, z):
        return self.decoder(z / self.config.scaling_factor)

    def __call__(self, x, rng):
        z = self.sample_latents(x, rng)
        return self.decode(z)

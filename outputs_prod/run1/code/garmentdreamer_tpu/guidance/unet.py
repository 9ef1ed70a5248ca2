"""UNet2DCondition in Flax (NHWC, bf16-capable) -- the SD 2.1 denoiser architecture.

TPU-native reimplementation of the diffusers ``UNet2DConditionModel`` consumed
by the reference guidance (reference: stable_diffusion_guidance.py:83-99 loads
"stabilityai/stable-diffusion-2-1-base"; the vendored LoRA variant with
camera/shading conditioning is netf/vsd/lora_unet.py:415-422,636-645; the
offline latent diffusion uses the same class at
AutoEncoder-Garment_Diffusion/Garment_Diffusion/run_df_*.py).

Design choices for TPU:
* NHWC layout end-to-end (XLA TPU's native conv layout; torch weights get
  transposed OIHW->HWIO during conversion);
* compute dtype is a config knob (bf16 for the MXU, f32 params);
* attention is plain batched einsum -- XLA fuses softmax(QK^T)V fine at the
  64^2=4096-token sequence lengths this pipeline runs;
* optional LoRA rank on attention projections (used by VSD's LoRA UNet) and an
  optional ``extra_emb`` added to the time embedding (the LoRA UNet's camera +
  shading embeddings enter exactly there).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn

from garmentdreamer_tpu.core.fused_gn import FusedGroupNorm
import jax
import jax.numpy as jnp

__all__ = ["UNetConfig", "UNet2DCondition", "timestep_embedding"]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64  # channels per head
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    use_linear_projection: bool = True
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    norm_groups: int = 32
    lora_rank: Optional[int] = None
    extra_emb_dim: Optional[int] = None  # camera/shading conditioning width
    dtype: jnp.dtype = jnp.float32  # compute dtype
    # Pallas flash attention for LONG self-attention. MEASURED SLOWER on
    # v5e at SD-2.1 shapes (B=8, 5 heads, 4096 tokens, head_dim 64: 152 ms
    # vs 71 ms einsum UNet forward, scripts/profile_guidance2.py) -- XLA's
    # fused softmax(QK^T)V wins at these small head counts, so the default
    # is OFF; the knob stays for larger-resolution experiments.
    flash_attention: bool = False
    flash_min_seq: int = 1024

    @staticmethod
    def sd21() -> "UNetConfig":
        return UNetConfig()

    @staticmethod
    def sd21_lora(rank: int = 4, extra_emb_dim: Optional[int] = None) -> "UNetConfig":
        return dataclasses.replace(UNetConfig(), lora_rank=rank, extra_emb_dim=extra_emb_dim)

    @staticmethod
    def tiny(cross_attention_dim: int = 32) -> "UNetConfig":
        """Small config for tests (same topology, ~1000x fewer params)."""
        return UNetConfig(
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention_dim=cross_attention_dim,
            attention_head_dim=16,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            norm_groups=8,
        )

    @staticmethod
    def garment_latent(cross_attention_dim: int = 768) -> "UNetConfig":
        """The offline garment latent-diffusion denoiser (8x8x1 latents;
        reference: Garment_Diffusion/run_df_*.py UNet2DConditionModel cfg)."""
        return UNetConfig(
            in_channels=1,
            out_channels=1,
            block_out_channels=(128, 256, 512),
            layers_per_block=2,
            cross_attention_dim=cross_attention_dim,
            attention_head_dim=8,
            down_block_types=(
                "CrossAttnDownBlock2D",
                "CrossAttnDownBlock2D",
                "DownBlock2D",
            ),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D"),
            use_linear_projection=False,
        )


def timestep_embedding(
    t: jnp.ndarray, dim: int, flip_sin_to_cos: bool = True, freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep features (diffusers get_timestep_embedding semantics)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin], axis=-1) if flip_sin_to_cos else jnp.concatenate([sin, cos], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class LoraDense(nn.Module):
    """Dense with optional low-rank update: y = xW + scale * x A B."""

    features: int
    use_bias: bool = True
    rank: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias, dtype=self.dtype, name="base")(x)
        if self.rank:
            a = nn.Dense(self.rank, use_bias=False, dtype=self.dtype, name="lora_down")(x)
            b = nn.Dense(
                self.features,
                use_bias=False,
                dtype=self.dtype,
                kernel_init=nn.initializers.zeros,
                name="lora_up",
            )(a)
            y = y + b
        return y


class Attention(nn.Module):
    """Multi-head attention; cross-attention when ``context`` is given."""

    query_dim: int
    head_dim: int
    context_dim: Optional[int] = None
    lora_rank: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    flash_min_seq: int = 1024

    @nn.compact
    def __call__(self, x, context=None):
        self_attn = context is None
        context = x if context is None else context
        heads = max(self.query_dim // self.head_dim, 1)
        inner = heads * self.head_dim

        q = LoraDense(inner, use_bias=False, rank=self.lora_rank, dtype=self.dtype, name="to_q")(x)
        k = LoraDense(inner, use_bias=False, rank=self.lora_rank, dtype=self.dtype, name="to_k")(context)
        v = LoraDense(inner, use_bias=False, rank=self.lora_rank, dtype=self.dtype, name="to_v")(context)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, heads, self.head_dim)
        k = k.reshape(b, m, heads, self.head_dim)
        v = v.reshape(b, m, heads, self.head_dim)

        scale = 1.0 / math.sqrt(self.head_dim)
        if (
            self.use_flash and self_attn and n >= self.flash_min_seq
            and n % 512 == 0 and jax.default_backend() != "cpu"
        ):
            # Pallas flash attention: the (n, n) score matrix never leaves
            # VMEM -- at 4096 tokens the einsum path round-trips a
            # (b, h, n, n) f32 softmax through HBM
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            o = flash_attention(
                jnp.transpose(q, (0, 2, 1, 3)).astype(self.dtype),
                jnp.transpose(k, (0, 2, 1, 3)).astype(self.dtype),
                jnp.transpose(v, (0, 2, 1, 3)).astype(self.dtype),
                causal=False,
                sm_scale=scale,
            )
            out = jnp.transpose(o, (0, 2, 1, 3)).reshape(b, n, inner)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        return LoraDense(self.query_dim, rank=self.lora_rank, dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        # GEGLU
        h = nn.Dense(inner * 2, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class TransformerBlock(nn.Module):
    dim: int
    head_dim: int
    context_dim: int
    lora_rank: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    flash_min_seq: int = 1024

    @nn.compact
    def __call__(self, x, context):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.dim, self.head_dim, lora_rank=self.lora_rank, dtype=self.dtype,
                          use_flash=self.use_flash, flash_min_seq=self.flash_min_seq, name="attn1")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + Attention(
            self.dim, self.head_dim, context_dim=self.context_dim,
            lora_rank=self.lora_rank, dtype=self.dtype, name="attn2",
        )(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)


class SpatialTransformer(nn.Module):
    """GroupNorm -> proj_in -> N transformer blocks -> proj_out, residual."""

    channels: int
    head_dim: int
    context_dim: int
    depth: int = 1
    use_linear_projection: bool = True
    norm_groups: int = 32
    lora_rank: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    flash_min_seq: int = 1024

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        x = FusedGroupNorm(num_groups=self.norm_groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(c, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = TransformerBlock(
                c, self.head_dim, self.context_dim, lora_rank=self.lora_rank,
                dtype=self.dtype, use_flash=self.use_flash,
                flash_min_seq=self.flash_min_seq, name=f"block_{i}",
            )(x, context)
        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, c)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class ResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        c_in = x.shape[-1]
        h = FusedGroupNorm(num_groups=self.norm_groups, epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = FusedGroupNorm(num_groups=self.norm_groups, epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class UNet2DCondition(nn.Module):
    """The conditional UNet denoiser. Inputs NHWC latents + (B,) timesteps +
    (B, L, D) encoder hidden states; returns the noise/velocity prediction."""

    config: UNetConfig

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states, extra_emb=None):
        cfg = self.config
        dt = cfg.dtype
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4

        sample = sample.astype(dt)
        encoder_hidden_states = encoder_hidden_states.astype(dt)

        # time embedding
        t_feat = timestep_embedding(timesteps, ch0, cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = nn.Dense(temb_dim, dtype=dt, name="time_embed_1")(t_feat.astype(dt))
        temb = nn.Dense(temb_dim, dtype=dt, name="time_embed_2")(nn.silu(temb))
        if extra_emb is not None:
            # camera/shading conditioning joins the time embedding
            # (reference: lora_unet.py:636-645)
            temb = temb + nn.Dense(temb_dim, dtype=dt, name="extra_embed")(extra_emb.astype(dt))

        h = nn.Conv(ch0, (3, 3), padding=1, dtype=dt, name="conv_in")(sample)

        skips = [h]
        # down path
        for i, block_type in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[i]
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, cfg.norm_groups, dtype=dt, name=f"down_{i}_res_{j}")(h, temb)
                if block_type == "CrossAttnDownBlock2D":
                    h = SpatialTransformer(
                        ch, cfg.attention_head_dim, cfg.cross_attention_dim,
                        use_linear_projection=cfg.use_linear_projection,
                        norm_groups=cfg.norm_groups, lora_rank=cfg.lora_rank,
                        use_flash=cfg.flash_attention,
                        flash_min_seq=cfg.flash_min_seq,
                        dtype=dt, name=f"down_{i}_attn_{j}",
                    )(h, encoder_hidden_states)
                skips.append(h)
            if i < len(cfg.down_block_types) - 1:
                h = Downsample(ch, dtype=dt, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # mid
        ch_mid = cfg.block_out_channels[-1]
        h = ResnetBlock(ch_mid, cfg.norm_groups, dtype=dt, name="mid_res_0")(h, temb)
        h = SpatialTransformer(
            ch_mid, cfg.attention_head_dim, cfg.cross_attention_dim,
            use_linear_projection=cfg.use_linear_projection,
            norm_groups=cfg.norm_groups, lora_rank=cfg.lora_rank,
            use_flash=cfg.flash_attention, flash_min_seq=cfg.flash_min_seq,
            dtype=dt, name="mid_attn",
        )(h, encoder_hidden_states)
        h = ResnetBlock(ch_mid, cfg.norm_groups, dtype=dt, name="mid_res_1")(h, temb)

        # up path (reversed channels, layers_per_block+1 resnets with skip concat)
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            ch = rev_channels[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(ch, cfg.norm_groups, dtype=dt, name=f"up_{i}_res_{j}")(h, temb)
                if block_type == "CrossAttnUpBlock2D":
                    h = SpatialTransformer(
                        ch, cfg.attention_head_dim, cfg.cross_attention_dim,
                        use_linear_projection=cfg.use_linear_projection,
                        norm_groups=cfg.norm_groups, lora_rank=cfg.lora_rank,
                        use_flash=cfg.flash_attention,
                        flash_min_seq=cfg.flash_min_seq,
                        dtype=dt, name=f"up_{i}_attn_{j}",
                    )(h, encoder_hidden_states)
            if i < len(cfg.up_block_types) - 1:
                h = Upsample(ch, dtype=dt, name=f"up_{i}_upsample")(h)

        h = FusedGroupNorm(num_groups=cfg.norm_groups, epsilon=1e-5, dtype=dt, name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dt, name="conv_out")(h)
        return h.astype(jnp.float32)

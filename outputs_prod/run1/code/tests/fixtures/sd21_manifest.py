"""Key manifest of the diffusers stabilityai/stable-diffusion-2-1-base
checkpoint (UNet + VAE state dicts): every weight name with its torch shape.

VERDICT r2 next-7: no checkpoint exists in this offline environment, so the
torch-key -> Flax-tree mapping in guidance/convert.py had only roundtrip
tests on synthesized trees. This manifest pins the CONTRACT side: the key
names follow diffusers' UNet2DConditionModel / AutoencoderKL state-dict
naming (stable across diffusers releases; the reference loads this exact
layout, stable_diffusion_guidance.py:83-99), generated structurally from the
SD-2.1-base architecture (block_out 320/640/1280/1280, layers_per_block 2,
cross-attn dim 1024, linear projections; VAE 128/256/512/512, latent 4).

A renamed or missing key in the converter now fails tests/test_convert_manifest.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

Shape = Tuple[int, ...]


def _conv(d, name, o, i, k=3):
    d[f"{name}.weight"] = (o, i, k, k)
    d[f"{name}.bias"] = (o,)


def _lin(d, name, o, i, bias=True):
    d[f"{name}.weight"] = (o, i)
    if bias:
        d[f"{name}.bias"] = (o,)


def _norm(d, name, c):
    d[f"{name}.weight"] = (c,)
    d[f"{name}.bias"] = (c,)


def _resnet(d, p, cin, cout, temb=None):
    _norm(d, f"{p}.norm1", cin)
    _conv(d, f"{p}.conv1", cout, cin)
    if temb:
        _lin(d, f"{p}.time_emb_proj", cout, temb)
    _norm(d, f"{p}.norm2", cout)
    _conv(d, f"{p}.conv2", cout, cout)
    if cin != cout:
        _conv(d, f"{p}.conv_shortcut", cout, cin, k=1)


def _attn_block(d, p, c, ctx):
    _norm(d, f"{p}.norm1", c)
    _lin(d, f"{p}.attn1.to_q", c, c, bias=False)
    _lin(d, f"{p}.attn1.to_k", c, c, bias=False)
    _lin(d, f"{p}.attn1.to_v", c, c, bias=False)
    _lin(d, f"{p}.attn1.to_out.0", c, c)
    _norm(d, f"{p}.norm2", c)
    _lin(d, f"{p}.attn2.to_q", c, c, bias=False)
    _lin(d, f"{p}.attn2.to_k", c, ctx, bias=False)
    _lin(d, f"{p}.attn2.to_v", c, ctx, bias=False)
    _lin(d, f"{p}.attn2.to_out.0", c, c)
    _norm(d, f"{p}.norm3", c)
    _lin(d, f"{p}.ff.net.0.proj", 8 * c, c)
    _lin(d, f"{p}.ff.net.2", c, 4 * c)


def _spatial_transformer(d, p, c, ctx, depth=1):
    _norm(d, f"{p}.norm", c)
    _lin(d, f"{p}.proj_in", c, c)  # use_linear_projection=True in SD 2.1
    for k in range(depth):
        _attn_block(d, f"{p}.transformer_blocks.{k}", c, ctx)
    _lin(d, f"{p}.proj_out", c, c)


def sd21_unet_manifest() -> Dict[str, Shape]:
    """diffusers UNet2DConditionModel state-dict keys+shapes for SD-2.1-base."""
    ch = (320, 640, 1280, 1280)
    layers = 2
    ctx = 1024
    temb = 4 * ch[0]
    down_types = ("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",)
    up_types = ("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3
    d: Dict[str, Shape] = {}
    _conv(d, "conv_in", ch[0], 4)
    _lin(d, "time_embedding.linear_1", temb, ch[0])
    _lin(d, "time_embedding.linear_2", temb, temb)

    out_c = ch[0]
    for i, bt in enumerate(down_types):
        in_c, out_c = out_c, ch[i]
        for j in range(layers):
            _resnet(d, f"down_blocks.{i}.resnets.{j}",
                    in_c if j == 0 else out_c, out_c, temb)
            if "CrossAttn" in bt:
                _spatial_transformer(
                    d, f"down_blocks.{i}.attentions.{j}", out_c, ctx
                )
        if i < len(down_types) - 1:
            _conv(d, f"down_blocks.{i}.downsamplers.0.conv", out_c, out_c)

    _resnet(d, "mid_block.resnets.0", ch[-1], ch[-1], temb)
    _spatial_transformer(d, "mid_block.attentions.0", ch[-1], ctx)
    _resnet(d, "mid_block.resnets.1", ch[-1], ch[-1], temb)

    rev = list(reversed(ch))  # (1280, 1280, 640, 320)
    out_c = rev[0]
    for i, bt in enumerate(up_types):
        prev_c, out_c = out_c, rev[i]
        skip_c_in = rev[min(i + 1, len(ch) - 1)]
        for j in range(layers + 1):
            res_skip = skip_c_in if j == layers else out_c
            res_in = prev_c if j == 0 else out_c
            _resnet(d, f"up_blocks.{i}.resnets.{j}",
                    res_in + res_skip, out_c, temb)
            if "CrossAttn" in bt:
                _spatial_transformer(
                    d, f"up_blocks.{i}.attentions.{j}", out_c, ctx
                )
        if i < len(up_types) - 1:
            _conv(d, f"up_blocks.{i}.upsamplers.0.conv", out_c, out_c)

    _norm(d, "conv_norm_out", ch[0])
    _conv(d, "conv_out", 4, ch[0])
    return d


def sd21_vae_manifest() -> Dict[str, Shape]:
    """diffusers AutoencoderKL state-dict keys+shapes for SD-2.1-base
    (newer-diffusers attention naming: to_q/to_k/to_v/to_out.0 Linears)."""
    ch = (128, 256, 512, 512)
    layers = 2
    lat = 4
    d: Dict[str, Shape] = {}

    def vae_attn(p, c):
        _norm(d, f"{p}.group_norm", c)
        _lin(d, f"{p}.to_q", c, c)
        _lin(d, f"{p}.to_k", c, c)
        _lin(d, f"{p}.to_v", c, c)
        _lin(d, f"{p}.to_out.0", c, c)

    # encoder
    _conv(d, "encoder.conv_in", ch[0], 3)
    out_c = ch[0]
    for i in range(len(ch)):
        in_c, out_c = out_c, ch[i]
        for j in range(layers):
            _resnet(d, f"encoder.down_blocks.{i}.resnets.{j}",
                    in_c if j == 0 else out_c, out_c)
        if i < len(ch) - 1:
            _conv(d, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                  out_c, out_c)
    _resnet(d, "encoder.mid_block.resnets.0", ch[-1], ch[-1])
    vae_attn("encoder.mid_block.attentions.0", ch[-1])
    _resnet(d, "encoder.mid_block.resnets.1", ch[-1], ch[-1])
    _norm(d, "encoder.conv_norm_out", ch[-1])
    _conv(d, "encoder.conv_out", 2 * lat, ch[-1])
    _conv(d, "quant_conv", 2 * lat, 2 * lat, k=1)

    # decoder
    _conv(d, "post_quant_conv", lat, lat, k=1)
    _conv(d, "decoder.conv_in", ch[-1], lat)
    _resnet(d, "decoder.mid_block.resnets.0", ch[-1], ch[-1])
    vae_attn("decoder.mid_block.attentions.0", ch[-1])
    _resnet(d, "decoder.mid_block.resnets.1", ch[-1], ch[-1])
    rev = list(reversed(ch))  # (512, 512, 256, 128)
    out_c = rev[0]
    for i in range(len(ch)):
        in_c, out_c = out_c, rev[i]
        for j in range(layers + 1):
            _resnet(d, f"decoder.up_blocks.{i}.resnets.{j}",
                    in_c if j == 0 else out_c, out_c)
        if i < len(ch) - 1:
            _conv(d, f"decoder.up_blocks.{i}.upsamplers.0.conv", out_c, out_c)
    _norm(d, "decoder.conv_norm_out", rev[-1])
    _conv(d, "decoder.conv_out", 3, rev[-1])
    return d

"""Diffusers (torch) SD-2.1 checkpoint -> Flax parameter conversion.

The reference pulls "stabilityai/stable-diffusion-2-1-base" from HuggingFace
(reference: stable_diffusion_guidance.py:83-99, sd_vsd_utils.py:46-66). This
module maps a locally downloaded diffusers checkpoint directory (the usual
``unet/diffusion_pytorch_model.(bin|safetensors)`` +
``vae/diffusion_pytorch_model.*`` + ``text_encoder/*`` layout) onto our
NHWC Flax trees (guidance/unet.py, guidance/vae.py).

Layout rules:
* Conv2d (O,I,kh,kw)   -> (kh,kw,I,O)
* Linear (O,I)         -> (I,O)
* Group/LayerNorm      -> scale/bias as-is
* attention to_out.0   -> to_out

Usage: ``load_sd_weights(dir)`` -> (unet_params, vae_params) consumed by
pipeline/models.build_guidance_stack.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np

__all__ = [
    "load_torch_weights",
    "convert_sd_unet",
    "convert_sd_vae",
    "convert_sd_text_encoder",
    "load_sd_weights",
    "load_sd_text_encoder",
]


def load_torch_weights(path: str) -> Dict[str, np.ndarray]:
    """Read a diffusers weight file (.safetensors or .bin) -> numpy dict."""
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file

            return dict(load_file(path))
        except ImportError:
            from safetensors.torch import load_file as tl

            return {k: v.float().numpy() for k, v in tl(path).items()}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def _conv(sd, name):
    out = {"kernel": np.transpose(sd[name + ".weight"], (2, 3, 1, 0))}
    if name + ".bias" in sd:
        out["bias"] = sd[name + ".bias"]
    return out


def _dense(sd, name):
    out = {"kernel": np.transpose(sd[name + ".weight"])}
    if name + ".bias" in sd:
        out["bias"] = sd[name + ".bias"]
    return out


def _norm(sd, name):
    return {"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]}


def _resnet(sd, p):
    out = {
        "norm1": _norm(sd, p + ".norm1"),
        "conv1": _conv(sd, p + ".conv1"),
        "norm2": _norm(sd, p + ".norm2"),
        "conv2": _conv(sd, p + ".conv2"),
    }
    if p + ".time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _dense(sd, p + ".time_emb_proj")
    if p + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, p + ".conv_shortcut")
    return out


def _attention(sd, p):
    # our attention projections are LoraDense modules: the pretrained weight
    # lives in the inner "base" Dense (guidance/unet.py LoraDense)
    return {
        "to_q": {"base": _dense(sd, p + ".to_q")},
        "to_k": {"base": _dense(sd, p + ".to_k")},
        "to_v": {"base": _dense(sd, p + ".to_v")},
        "to_out": {"base": _dense(sd, p + ".to_out.0")},
    }


def _transformer_block(sd, p):
    return {
        "norm1": _norm(sd, p + ".norm1"),
        "attn1": _attention(sd, p + ".attn1"),
        "norm2": _norm(sd, p + ".norm2"),
        "attn2": _attention(sd, p + ".attn2"),
        "norm3": _norm(sd, p + ".norm3"),
        "ff": {
            "proj_in": _dense(sd, p + ".ff.net.0.proj"),
            "proj_out": _dense(sd, p + ".ff.net.2"),
        },
    }


def _spatial_transformer(sd, p, linear_proj: bool):
    proj = _dense if linear_proj else _conv
    out = {
        "norm": _norm(sd, p + ".norm"),
        "proj_in": proj(sd, p + ".proj_in"),
        "proj_out": proj(sd, p + ".proj_out"),
    }
    k = 0
    while f"{p}.transformer_blocks.{k}.norm1.weight" in sd:
        out[f"block_{k}"] = _transformer_block(sd, f"{p}.transformer_blocks.{k}")
        k += 1
    return out


def convert_sd_unet(
    sd: Dict[str, np.ndarray],
    down_block_types=("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
    up_block_types=("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3,
    layers_per_block: int = 2,
    use_linear_projection: bool = True,
) -> Dict[str, Any]:
    """Diffusers UNet2DConditionModel state dict -> our param tree value."""
    out: Dict[str, Any] = {
        "conv_in": _conv(sd, "conv_in"),
        "conv_out": _conv(sd, "conv_out"),
        "norm_out": _norm(sd, "conv_norm_out"),
        "time_embed_1": _dense(sd, "time_embedding.linear_1"),
        "time_embed_2": _dense(sd, "time_embedding.linear_2"),
    }
    for i, btype in enumerate(down_block_types):
        for j in range(layers_per_block):
            out[f"down_{i}_res_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if "CrossAttn" in btype:
                out[f"down_{i}_attn_{j}"] = _spatial_transformer(
                    sd, f"down_blocks.{i}.attentions.{j}", use_linear_projection
                )
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            out[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")
            }
    out["mid_res_0"] = _resnet(sd, "mid_block.resnets.0")
    out["mid_res_1"] = _resnet(sd, "mid_block.resnets.1")
    out["mid_attn"] = _spatial_transformer(
        sd, "mid_block.attentions.0", use_linear_projection
    )
    for i, btype in enumerate(up_block_types):
        for j in range(layers_per_block + 1):
            out[f"up_{i}_res_{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if "CrossAttn" in btype:
                out[f"up_{i}_attn_{j}"] = _spatial_transformer(
                    sd, f"up_blocks.{i}.attentions.{j}", use_linear_projection
                )
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            out[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
            }
    return out


def _vae_attn(sd, p):
    # newer diffusers: to_q/to_k/to_v/to_out.0 Linear; older: query/key/value/
    # proj_attn as 1x1 convs
    if p + ".to_q.weight" in sd:
        def lin(n):
            return _dense(sd, p + "." + n)

        return {
            "norm": _norm(sd, p + ".group_norm"),
            "to_q": lin("to_q"),
            "to_k": lin("to_k"),
            "to_v": lin("to_v"),
            "to_out": _dense(sd, p + ".to_out.0"),
        }

    def conv1x1(n):
        w = sd[p + "." + n + ".weight"]
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        return {"kernel": np.transpose(w), "bias": sd[p + "." + n + ".bias"]}

    return {
        "norm": _norm(sd, p + ".group_norm"),
        "to_q": conv1x1("query"),
        "to_k": conv1x1("key"),
        "to_v": conv1x1("value"),
        "to_out": conv1x1("proj_attn"),
    }


def convert_sd_vae(
    sd: Dict[str, np.ndarray], num_blocks: int = 4, layers_per_block: int = 2
) -> Dict[str, Any]:
    """Diffusers AutoencoderKL state dict -> our param tree value."""
    enc: Dict[str, Any] = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "norm_out": _norm(sd, "encoder.conv_norm_out"),
        "mid_res_0": _resnet(sd, "encoder.mid_block.resnets.0"),
        "mid_res_1": _resnet(sd, "encoder.mid_block.resnets.1"),
        "mid_attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
        "quant_conv": _conv(sd, "quant_conv"),
    }
    for i in range(num_blocks):
        for j in range(layers_per_block):
            enc[f"down_{i}_res_{j}"] = _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            enc[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
    dec: Dict[str, Any] = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "norm_out": _norm(sd, "decoder.conv_norm_out"),
        "mid_res_0": _resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_res_1": _resnet(sd, "decoder.mid_block.resnets.1"),
        "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }
    for i in range(num_blocks):
        for j in range(layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            dec[f"up_{i}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv"
            )
    return {"encoder": enc, "decoder": dec}


def convert_sd_text_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """transformers CLIPTextModel state dict -> our Flax CLIP param tree
    (reference consumer: stable_diffusion_prompt_processor.py:15-41)."""
    from garmentdreamer_tpu.guidance.clip import convert_clip_text_encoder

    return convert_clip_text_encoder(sd)


def _find_weight_file(d: str, names=("diffusion_pytorch_model.safetensors",
                                     "diffusion_pytorch_model.bin")) -> str:
    for n in names:
        p = os.path.join(d, n)
        if os.path.isfile(p):
            return p
    raise FileNotFoundError(f"no diffusers weight file in {d}")


def load_sd_text_encoder(weights_dir: str):
    """Checkpoint dir -> (CLIPTextConfig, flax params) for the text encoder.

    Reads ``text_encoder/config.json`` for the architecture (hidden size,
    layers, heads, activation) and converts the torch weights.
    """
    import json

    from garmentdreamer_tpu.guidance.clip import CLIPTextConfig

    d = os.path.join(weights_dir, "text_encoder")
    sd = load_torch_weights(
        _find_weight_file(d, ("model.safetensors", "pytorch_model.bin",
                              "model.fp16.safetensors"))
    )
    cfg_path = os.path.join(d, "config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            hf = json.load(f)
        cfg = CLIPTextConfig(
            vocab_size=hf.get("vocab_size", 49408),
            hidden_size=hf.get("hidden_size", 1024),
            num_layers=hf.get("num_hidden_layers", 23),
            num_heads=hf.get("num_attention_heads", 16),
            intermediate_size=hf.get("intermediate_size", 4096),
            max_position_embeddings=hf.get("max_position_embeddings", 77),
            hidden_act=hf.get("hidden_act", "gelu"),
        )
    else:
        cfg = CLIPTextConfig.sd21()
    return cfg, convert_sd_text_encoder(sd)


def load_sd_weights(weights_dir: str):
    """Diffusers checkpoint dir -> ({'params': unet_tree}, {'params': vae_tree})."""
    unet_sd = load_torch_weights(_find_weight_file(os.path.join(weights_dir, "unet")))
    vae_sd = load_torch_weights(_find_weight_file(os.path.join(weights_dir, "vae")))
    return (
        {"params": convert_sd_unet(unet_sd)},
        {"params": convert_sd_vae(vae_sd)},
    )

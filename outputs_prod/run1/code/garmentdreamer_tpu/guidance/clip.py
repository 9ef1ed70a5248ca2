"""CLIP text encoder in Flax -- the SD-2.1 prompt embedder.

TPU-native reimplementation of the transformers ``CLIPTextModel`` the
reference loads for prompt embedding (reference:
threestudio/models/prompt_processors/stable_diffusion_prompt_processor.py:15-41
loads tokenizer + CLIPTextModel from the SD checkpoint and returns
``last_hidden_state``; the VSD guidance does the same at
Garment_Deformer_NeTF/netf/guidance/sd_vsd_utils.py:46-66).

Tokenization stays on host (a vocab/BPE lookup is not accelerator work); the
transformer itself runs as one jitted Flax call so prompt embedding shares the
device path with everything else instead of needing the reference's
subprocess-to-free-VRAM dance (base.py:377-395).

SD 2.1-base text encoder config: 23 hidden layers (the checkpoint is already
truncated to the penultimate layer), hidden 1024, 16 heads, intermediate 4096,
gelu activation, causal mask, final layer norm -- ``CLIPTextConfig`` of
stabilityai/stable-diffusion-2-1-base.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CLIPTextConfig", "CLIPTextModel", "convert_clip_text_encoder"]


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    num_layers: int = 23
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"  # "gelu" (SD2.x / OpenCLIP) or "quick_gelu" (SD1.x)
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @staticmethod
    def sd21() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def tiny(vocab_size: int = 1000) -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=vocab_size,
            hidden_size=32,
            num_layers=2,
            num_heads=4,
            intermediate_size=64,
            max_position_embeddings=77,
        )


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: jax.nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        D, H = c.hidden_size, c.num_heads
        hd = D // H
        dense = lambda name: nn.Dense(D, dtype=c.dtype, name=name)
        q = dense("q_proj")(x) * (hd**-0.5)
        k = dense("k_proj")(x)
        v = dense("v_proj")(x)
        B, L, _ = x.shape
        split = lambda t: t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        logits = jnp.where(causal_mask, logits, jnp.finfo(logits.dtype).min)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return dense("out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype, name=name)
        x = x + CLIPAttention(c, name="self_attn")(ln("layer_norm1")(x), causal_mask)
        h = ln("layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=c.dtype, name="fc1")(h)
        h = _act(c.hidden_act)(h)
        h = nn.Dense(c.hidden_size, dtype=c.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Token ids (B, L) int32 -> last hidden state (B, L, D)."""

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B, L = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype, name="token_embedding")
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, dtype=c.dtype,
            name="position_embedding",
        )
        x = tok(input_ids) + pos(jnp.arange(L, dtype=jnp.int32))[None]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        for i in range(c.num_layers):
            x = CLIPEncoderLayer(c, name=f"layer_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype, name="final_layer_norm")(x)
        return x


def _dense(sd, name):
    return {"kernel": np.transpose(sd[name + ".weight"]), "bias": sd[name + ".bias"]}


def _ln(sd, name):
    return {"scale": sd[name + ".weight"], "bias": sd[name + ".bias"]}


def convert_clip_text_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """transformers CLIPTextModel state dict -> our param tree value.

    Accepts both the standalone-module key layout (``text_model.*``) and
    already-stripped keys.
    """
    if any(k.startswith("text_model.") for k in sd):
        sd = {k[len("text_model."):]: v for k, v in sd.items() if k.startswith("text_model.")}
    out: Dict[str, Any] = {
        "token_embedding": {"embedding": sd["embeddings.token_embedding.weight"]},
        "position_embedding": {"embedding": sd["embeddings.position_embedding.weight"]},
        "final_layer_norm": _ln(sd, "final_layer_norm"),
    }
    i = 0
    while f"encoder.layers.{i}.layer_norm1.weight" in sd:
        p = f"encoder.layers.{i}"
        out[f"layer_{i}"] = {
            "layer_norm1": _ln(sd, p + ".layer_norm1"),
            "layer_norm2": _ln(sd, p + ".layer_norm2"),
            "self_attn": {
                "q_proj": _dense(sd, p + ".self_attn.q_proj"),
                "k_proj": _dense(sd, p + ".self_attn.k_proj"),
                "v_proj": _dense(sd, p + ".self_attn.v_proj"),
                "out_proj": _dense(sd, p + ".self_attn.out_proj"),
            },
            "fc1": _dense(sd, p + ".mlp.fc1"),
            "fc2": _dense(sd, p + ".mlp.fc2"),
        }
        i += 1
    return {"params": out}

"""T5 text encoder in Flax -- the DeepFloyd-IF prompt embedder.

TPU-native reimplementation of the transformers ``T5EncoderModel`` the
reference's IF-II guidance conditions on (reference:
Garment_Deformer_NeTF/netf/guidance/if2_utils.py:47-48 keeps
``pipe.tokenizer``/``pipe.text_encoder`` from the DeepFloyd pipeline and
embeds the per-direction prompts at if2_utils.py:79-81). DeepFloyd IF ships
google/t5-v1_1-xxl, so the architecture here is the v1.1 variant: RMS
layer norm (no mean subtraction, no bias), UNscaled attention logits (the
1/sqrt(d_kv) factor is folded into T5's initializer, not the forward pass),
a single relative-position-bias table owned by block 0 and shared by every
layer, and a gated-GELU feed-forward with untied input/output embeddings.

Tokenization stays on host (sentencepiece lookup is not accelerator work);
the transformer runs as one jitted Flax call. All matmuls are kept in the
param dtype; the RMS norms compute in f32 like the torch reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "T5Config",
    "T5EncoderModel",
    "convert_t5_encoder",
    "make_t5_encode_fn",
]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @staticmethod
    def xxl() -> "T5Config":
        """google/t5-v1_1-xxl -- the encoder DeepFloyd IF ships."""
        return T5Config()

    @staticmethod
    def base() -> "T5Config":
        """google/t5-v1_1-base dims: the weights-free stand-in tower (the
        real xxl is 4.7B params -- pointless to random-init)."""
        return T5Config(d_model=768, d_kv=64, d_ff=2048, num_layers=12, num_heads=12)

    @staticmethod
    def tiny(vocab_size: int = 1000) -> "T5Config":
        return T5Config(
            vocab_size=vocab_size, d_model=32, d_kv=8, d_ff=64,
            num_layers=2, num_heads=4,
        )


def _rms_norm(cfg: T5Config, name: str):
    class _RMSNorm(nn.Module):
        @nn.compact
        def __call__(self, x):
            scale = self.param("weight", nn.initializers.ones, (cfg.d_model,))
            var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
            y = x * jax.lax.rsqrt(var + cfg.layer_norm_epsilon).astype(x.dtype)
            return y * scale.astype(x.dtype)

    return _RMSNorm(name=name)


def _relative_position_bucket(
    relative_position: jnp.ndarray, num_buckets: int, max_distance: int
) -> jnp.ndarray:
    """Bidirectional (encoder) bucketing: half the buckets for each sign,
    half of each half exact, the rest logarithmic out to max_distance."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return ret + jnp.where(is_small, n, large)


class T5RelativeBias(nn.Module):
    """(1, H, L, L) relative position bias -- one table, shared by all
    layers (HF stores it inside block 0's attention; the converter remaps)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, length: int) -> jnp.ndarray:
        c = self.cfg
        table = self.param(
            "relative_attention_bias",
            nn.initializers.normal(1.0),
            (c.relative_attention_num_buckets, c.num_heads),
        )
        ctx = jnp.arange(length)[:, None]
        mem = jnp.arange(length)[None, :]
        buckets = _relative_position_bucket(
            mem - ctx, c.relative_attention_num_buckets,
            c.relative_attention_max_distance,
        )
        return table[buckets].transpose(2, 0, 1)[None].astype(c.dtype)


class T5Attention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, position_bias):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        B, L, _ = x.shape
        dense = lambda d, name: nn.Dense(d, use_bias=False, dtype=c.dtype, name=name)
        split = lambda t: t.reshape(B, L, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)
        # NO 1/sqrt(d_kv): T5 folds the scale into the initializer
        q = split(dense(inner, "q")(x))
        k = split(dense(inner, "k")(x))
        v = split(dense(inner, "v")(x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) + position_bias
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        return dense(c.d_model, "o")(out.transpose(0, 2, 1, 3).reshape(B, L, inner))


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, position_bias):
        c = self.cfg
        h = _rms_norm(c, "attn_layer_norm")(x)
        x = x + T5Attention(c, name="self_attn")(h, position_bias)
        h = _rms_norm(c, "ff_layer_norm")(x)
        # v1.1 gated-GELU FF; HF's "gated-gelu" is the tanh approximation
        dense = lambda d, name: nn.Dense(d, use_bias=False, dtype=c.dtype, name=name)
        g = jax.nn.gelu(dense(c.d_ff, "wi_0")(h), approximate=True)
        h = g * dense(c.d_ff, "wi_1")(h)
        return x + dense(c.d_model, "wo")(h)


class T5EncoderModel(nn.Module):
    """Token ids (B, L) int32 [+ attention mask (B, L)] -> (B, L, d_model)."""

    cfg: T5Config

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        c = self.cfg
        x = nn.Embed(c.vocab_size, c.d_model, dtype=c.dtype, name="embed_tokens")(
            input_ids
        )
        L = input_ids.shape[1]
        position_bias = T5RelativeBias(c, name="bias_owner")(L)
        if attention_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            position_bias = position_bias + jnp.where(
                attention_mask[:, None, None, :] > 0, 0.0, neg
            ).astype(position_bias.dtype)
        for i in range(c.num_layers):
            x = T5Block(c, name=f"block_{i}")(x, position_bias)
        return _rms_norm(c, "final_layer_norm")(x)


def _hash_tokenize(prompts, vocab_size: int, max_length: int) -> np.ndarray:
    """Deterministic weights-free tokenizer stand-in: words hash to stable
    ids in [3, vocab), EOS=1, pad=0 (T5's sentencepiece conventions). Used
    ONLY when no checkpoint tokenizer files exist -- the ids are arbitrary
    but stable, so the (random-init) tower still conditions the UNet on
    DISTINCT per-prompt embeddings instead of constant placeholders."""
    import hashlib
    import re

    out = np.zeros((len(prompts), max_length), np.int32)
    for i, p in enumerate(prompts):
        words = re.findall(r"[a-z0-9]+", p.lower())[: max_length - 1]
        for j, w in enumerate(words):
            h = int.from_bytes(hashlib.sha1(w.encode()).digest()[:4], "little")
            out[i, j] = 3 + h % (vocab_size - 3)
        out[i, len(words)] = 1  # </s>
    return out


def make_t5_encode_fn(
    weights_dir: Optional[str] = None,
    fallback_cfg: Optional[T5Config] = None,
    max_length: int = 77,
    seed: int = 0,
):
    """``prompts -> (N, max_length, d_model)`` via the Flax T5 encoder.

    With ``weights_dir/t5`` present (``config.json`` + torch/safetensors
    state dict + sentencepiece tokenizer), this is the reference's real
    DeepFloyd path (if2_utils.py:47-81). Without it, the REAL tower runs
    random-init at ``fallback_cfg`` dims with the hash tokenizer -- same
    policy as the SD-2.1 random-init fallback (pipeline/models.py)."""
    import os

    sub = os.path.join(weights_dir, "t5") if weights_dir else None
    if sub and os.path.isdir(sub):
        import json

        with open(os.path.join(sub, "config.json")) as f:
            hc = json.load(f)
        cfg = T5Config(
            vocab_size=hc["vocab_size"], d_model=hc["d_model"],
            d_kv=hc["d_kv"], d_ff=hc["d_ff"], num_layers=hc["num_layers"],
            num_heads=hc["num_heads"],
            relative_attention_num_buckets=hc["relative_attention_num_buckets"],
        )
        sd = _load_state_dict(sub)
        params = convert_t5_encoder(sd)

        def tokenize(prompts):
            from transformers import T5Tokenizer

            tok = T5Tokenizer.from_pretrained(sub)
            enc = tok(list(prompts), padding="max_length", max_length=max_length,
                      truncation=True, return_tensors="np")
            return enc.input_ids.astype(np.int32), enc.attention_mask.astype(np.int32)
    else:
        cfg = fallback_cfg or T5Config.base()
        model0 = T5EncoderModel(cfg)
        params = model0.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, max_length), jnp.int32)
        )

        def tokenize(prompts):
            ids = _hash_tokenize(prompts, cfg.vocab_size, max_length)
            return ids, (ids > 0).astype(np.int32)

    model = T5EncoderModel(cfg)

    def encode(prompts) -> np.ndarray:
        ids, mask = tokenize(prompts)
        out = jax.jit(model.apply)(
            params, jnp.asarray(ids), jnp.asarray(mask)
        )
        return np.asarray(out, np.float32)

    return encode, cfg


def _load_state_dict(folder: str) -> Dict[str, np.ndarray]:
    import glob
    import os

    st = sorted(glob.glob(os.path.join(folder, "*.safetensors")))
    if st:
        from safetensors.numpy import load_file

        sd: Dict[str, np.ndarray] = {}
        for f in st:
            sd.update(load_file(f))
        return sd
    import torch

    bins = sorted(
        glob.glob(os.path.join(folder, "*.bin"))
        + glob.glob(os.path.join(folder, "*.pth"))
    )
    sd = {}
    for f in bins:
        for k, v in torch.load(f, map_location="cpu", weights_only=True).items():
            sd[k] = v.float().numpy()
    return sd


def _w(sd, name):
    return {"kernel": np.transpose(sd[name + ".weight"])}


def convert_t5_encoder(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """transformers ``T5EncoderModel`` state dict -> our param tree.

    Accepts both the full-model layout (``encoder.block.*`` + ``shared``)
    and already-stripped encoder keys."""
    pre = "encoder." if any(k.startswith("encoder.") for k in sd) else ""
    emb_key = "shared.weight" if "shared.weight" in sd else pre + "embed_tokens.weight"
    out: Dict[str, Any] = {
        "embed_tokens": {"embedding": np.asarray(sd[emb_key])},
        "final_layer_norm": {"weight": np.asarray(sd[pre + "final_layer_norm.weight"])},
        "bias_owner": {
            "relative_attention_bias": np.asarray(
                sd[pre + "block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
            )
        },
    }
    i = 0
    while f"{pre}block.{i}.layer.0.SelfAttention.q.weight" in sd:
        p = f"{pre}block.{i}.layer"
        out[f"block_{i}"] = {
            "attn_layer_norm": {"weight": np.asarray(sd[f"{p}.0.layer_norm.weight"])},
            "self_attn": {
                "q": _w(sd, f"{p}.0.SelfAttention.q"),
                "k": _w(sd, f"{p}.0.SelfAttention.k"),
                "v": _w(sd, f"{p}.0.SelfAttention.v"),
                "o": _w(sd, f"{p}.0.SelfAttention.o"),
            },
            "ff_layer_norm": {"weight": np.asarray(sd[f"{p}.1.layer_norm.weight"])},
            "wi_0": _w(sd, f"{p}.1.DenseReluDense.wi_0"),
            "wi_1": _w(sd, f"{p}.1.DenseReluDense.wi_1"),
            "wo": _w(sd, f"{p}.1.DenseReluDense.wo"),
        }
        i += 1
    return {"params": out}

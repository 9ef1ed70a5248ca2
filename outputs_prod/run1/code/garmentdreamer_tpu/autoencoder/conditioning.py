"""Conditioning models for the garment latent diffusion.

Rebuilds the two conditioning variants of the reference's offline diffusion
scripts (reference: Garment_Diffusion/run_df_textconditioned.py:69-72,186
``BERTEmbedder(n_embed, n_layer)`` from latent-diffusion's bert_networks;
run_df_categoryconditioned.py:16-23,65 ``UNet2DModel(num_class_embeds=K,
class_labels=index)``):

* :class:`BertTextEmbedder` -- a compact BERT-style transformer text encoder
  (token embedding + learned positions + pre-LN self-attention blocks)
  producing (B, 77, n_embed) conditioning sequences for cross-attention,
  the role LDM's ``BERTEmbedder`` plays in the reference. The reference
  tokenizes with the HuggingFace bert-base-uncased vocab; this environment is
  offline, so tokenization here is a self-contained deterministic
  lowercase-word hash into the same vocab size (documented deviation -- the
  embedder is trained from scratch either way, so any injective-enough
  tokenizer works).
* :class:`category_embedding_table` -- the class-conditional variant: a
  learned (num_categories, dim) table; the chosen row enters the UNet through
  the time-embedding pathway (``extra_emb``), the same mechanism diffusers
  implements ``num_class_embeds`` with.
* :func:`category_to_index` -- the reference's ``'_'.join(id.split('_')[:-1])``
  filename -> category convention (run_df_categoryconditioned.py:43-44).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BertConfig",
    "BertTextEmbedder",
    "hash_tokenize",
    "category_embedding_table",
    "category_to_index",
]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522  # bert-base-uncased vocabulary size
    n_embed: int = 768
    n_layer: int = 12
    n_head: int = 8
    max_seq_len: int = 77

    @staticmethod
    def tiny() -> "BertConfig":
        return BertConfig(vocab_size=512, n_embed=32, n_layer=2, n_head=2)


def hash_tokenize(
    texts: Sequence[str], vocab_size: int = 30522, max_seq_len: int = 77
) -> np.ndarray:
    """Deterministic offline tokenizer: id 0 = PAD, 1 = BOS; words hash into
    [2, vocab_size). Stable across processes (no PYTHONHASHSEED dependence)."""
    import hashlib

    out = np.zeros((len(texts), max_seq_len), np.int32)
    for i, t in enumerate(texts):
        ids = [1]
        for w in t.lower().split():
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "little")
            ids.append(2 + h % (vocab_size - 2))
        ids = ids[:max_seq_len]
        out[i, : len(ids)] = ids
    return out


class _Block(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        h = nn.LayerNorm(name="ln1")(x)
        h = nn.SelfAttention(
            num_heads=c.n_head, qkv_features=c.n_embed, name="attn",
            deterministic=True,
        )(h, mask=mask)
        x = x + h
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(4 * c.n_embed, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(c.n_embed, name="fc2")(h)
        return x + h


class BertTextEmbedder(nn.Module):
    """(B, L) token ids -> (B, L, n_embed) conditioning sequence."""

    cfg: BertConfig = BertConfig()

    @nn.compact
    def __call__(self, token_ids: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        B, L = token_ids.shape
        x = nn.Embed(c.vocab_size, c.n_embed, name="tok")(token_ids)
        pos = self.param(
            "pos", nn.initializers.normal(0.02), (c.max_seq_len, c.n_embed)
        )
        x = x + pos[None, :L]
        pad = token_ids != 0  # (B, L)
        mask = pad[:, None, None, :] & pad[:, None, :, None]
        for i in range(c.n_layer):
            x = _Block(c, name=f"block{i}")(x, mask)
        return nn.LayerNorm(name="ln_f")(x)

    def embed_texts(self, params, texts: Sequence[str]) -> jnp.ndarray:
        ids = jnp.asarray(
            hash_tokenize(list(texts), self.cfg.vocab_size, self.cfg.max_seq_len)
        )
        return self.apply(params, ids)


def category_embedding_table(
    rng: jax.Array, num_categories: int, dim: int
) -> jnp.ndarray:
    """Learned class-embedding table (diffusers num_class_embeds analog)."""
    return jax.random.normal(rng, (num_categories, dim)) * 0.02


def category_to_index(ids: Sequence[str]) -> Dict[str, int]:
    """Filename ids like 'shirt_0042' -> {'shirt': 0, ...}
    (run_df_categoryconditioned.py:43-44 convention)."""
    cats: List[str] = []
    for s in ids:
        c = "_".join(s.split("_")[:-1]) or s
        if c not in cats:
            cats.append(c)
    return {c: i for i, c in enumerate(sorted(cats))}

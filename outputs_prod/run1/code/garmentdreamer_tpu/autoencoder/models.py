"""Garment autoencoder models: DGCNN point-cloud encoder + conditional-
batchnorm UDF decoder.

TPU-native rebuild of the reference AutoEncoder_dgcnn models:

* ``Dgcnn`` (reference AutoEncoder_dgcnn/models/dgcnn.py:27-115): 4 edge-conv
  blocks over K=20 graph features (knn_gather(x)[k] - x ++ x), each a
  bias-free Linear -> BatchNorm -> leaky_relu(0.2) -> max over K; final
  Linear(512 -> latent) + BN + leaky_relu + global max pool. The pytorch3d
  knn (component N8) becomes a chunked brute-force top-k over pairwise
  distances -- B x 10k^2 distance tiles are MXU-friendly;
* ``CoordsEncoder`` (models/coordsenc.py:7-64): NeRF encoding, 10 freqs,
  max_freq_log2=9, include_input -> 63 dims;
* ``CbnDecoder`` (models/cbndec.py:1-126): 1x1-conv MLP with conditional
  batch norm (gamma/beta from the latent, BN without affine), 5 residual
  blocks of width 512 by default; outputs a logit whose sigmoid maps to
  udf = (1 - sigmoid(pred)) * max_dist (trainers/encdec.py:152-156).

BatchNorm uses batch statistics in training (mutable 'batch_stats') matching
torch BatchNorm1d semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["knn_indices", "Dgcnn", "CoordsEncoder", "CbnDecoder"]


def knn_indices(x: jnp.ndarray, k: int, chunk: int = 2048) -> jnp.ndarray:
    """(B, N, 3) -> (B, N, K) indices of the K nearest neighbors (including
    self, like pytorch3d knn_points). Brute force in row chunks."""
    B, N, _ = x.shape
    n_chunks = (N + chunk - 1) // chunk
    pad = n_chunks * chunk - N

    def one_batch(pts):
        sq = jnp.sum(pts * pts, axis=-1)
        # pad the QUERY side only; padded rows produce garbage indices that
        # are sliced away below
        pts_q = jnp.pad(pts, ((0, pad), (0, 0)))

        def row_chunk(start):
            q = jax.lax.dynamic_slice_in_dim(pts_q, start, chunk, axis=0)
            d = (
                jnp.sum(q * q, axis=-1)[:, None]
                + sq[None, :]
                - 2.0 * q @ pts.T
            )
            _, idx = jax.lax.top_k(-d, k)
            return idx

        idxs = jnp.concatenate(
            [row_chunk(i * chunk) for i in range(n_chunks)], axis=0
        )[:N]
        return idxs

    return jax.vmap(one_batch)(x)


class Dgcnn(nn.Module):
    size_latent: int = 64
    k: int = 20

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """(B, N, 3) -> (B, size_latent)."""
        idx = jax.lax.stop_gradient(knn_indices(x, self.k))

        def graph_feature(feat):
            # (B,N,D) -> (B,N,K,2D): [neighbor - x, x] (dgcnn.py:9-24)
            gathered = jnp.take_along_axis(
                feat[:, None, :, :].repeat(feat.shape[1], 1),
                idx[..., None].repeat(feat.shape[-1], -1),
                axis=2,
            )
            center = feat[:, :, None, :].repeat(self.k, 2)
            return jnp.concatenate([gathered - center, center], axis=-1)

        def block(feat, width, name):
            h = graph_feature(feat)
            h = nn.Dense(width, use_bias=False, name=f"conv_{name}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=f"bn_{name}"
            )(h)
            h = nn.leaky_relu(h, 0.2)
            return jnp.max(h, axis=2)  # max over K

        x1 = block(x, 64, "1")
        x2 = block(x1, 64, "2")
        x3 = block(x2, 128, "3")
        x4 = block(x3, 256, "4")
        h = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # (B,N,512)
        h = nn.Dense(self.size_latent, use_bias=False, name="conv_5")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn_5")(h)
        h = nn.leaky_relu(h, 0.2)
        return jnp.max(h, axis=1)  # global max pool


class CoordsEncoder(nn.Module):
    """NeRF positional encoding (coordsenc.py:7-64): include_input + 10
    log-sampled freqs in [2^0, 2^9]."""

    num_freqs: int = 10
    max_freq_log2: int = 9

    @property
    def out_dim(self) -> int:
        return 3 * (1 + 2 * self.num_freqs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = [x]
        freqs = 2.0 ** jnp.linspace(0.0, self.max_freq_log2, self.num_freqs)
        for f in freqs:
            out.append(jnp.sin(x * f))
            out.append(jnp.cos(x * f))
        return jnp.concatenate(out, axis=-1)


class _CBN(nn.Module):
    """Conditional batch norm (cbndec.py:50-80): BN without affine, then
    gamma/beta predicted from the per-point condition."""

    f_dim: int

    @nn.compact
    def __call__(self, x, c, train: bool):
        # x: (B, N, F); c: (B, N, C)
        gamma = nn.Dense(self.f_dim, name="conv_gamma",
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.ones)(c)
        beta = nn.Dense(self.f_dim, name="conv_beta",
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(c)
        h = nn.BatchNorm(
            use_running_average=not train, use_bias=False, use_scale=False,
            momentum=0.9, name="bn",
        )(x)
        return gamma * h + beta


class _CResBlock(nn.Module):
    size: int

    @nn.compact
    def __call__(self, x, c, train: bool):
        h = nn.Dense(self.size, name="fc_0")(nn.relu(_CBN(self.size, name="bn_0")(x, c, train)))
        dx = nn.Dense(self.size, name="fc_1", kernel_init=nn.initializers.zeros)(
            nn.relu(_CBN(self.size, name="bn_1")(h, c, train))
        )
        return x + dx


class CbnDecoder(nn.Module):
    """(B, N, enc_dim) coords encoding + (B, latent) codes -> (B, N) logits
    (cbndec.py:105-126; udf = (1 - sigmoid) * max_dist is applied by the
    caller, trainers/encdec.py:152-156)."""

    latent_dim: int = 64
    hidden_dim: int = 512
    num_hidden_layers: int = 5

    @nn.compact
    def __call__(self, coords_enc, codes, train: bool = True):
        B, N, _ = coords_enc.shape
        if codes.ndim == 2:
            c = jnp.broadcast_to(codes[:, None, :], (B, N, codes.shape[-1]))
        else:
            c = codes
        h = nn.Dense(self.hidden_dim, name="fc_p")(coords_enc)
        for i in range(self.num_hidden_layers):
            h = _CResBlock(self.hidden_dim, name=f"block_{i}")(h, c, train)
        h = nn.relu(_CBN(self.hidden_dim, name="bn")(h, c, train))
        out = nn.Dense(1, name="fc_out")(h)
        return out[..., 0]

"""Texture-field encoders for the NeTF stage: instant-ngp hash grid,
frequency, triplane, and the small decoder MLP.

TPU-native replacement for the tinycudann encoders (reference component N7,
netf/render/texture_encoder.py:8-112): a multires hash encoding is just
gathers + trilinear lerp, which XLA fuses well on TPU; no custom kernel
needed at the NeTF query sizes (<= 1024^2 points per bake batch).

Config parity (texture_encoder.py:9-16): 16 levels x 2 features, 2^19 table,
base res 16, per_level_scale = exp2(log2(desired/num_levels)/(num_levels-1))
with desired 1024 -> top res 1024. Inputs are mapped (x+bound)/(2*bound) into
[0,1] (texture_encoder.py:36-37).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["HashGridConfig", "HashGridEncoder", "FrequencyEncoder", "TriplaneEncoder", "MLP"]

_PRIMES = (1, 2654435761, 805459861)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _table_lookup(flat_table: jnp.ndarray, idx: jnp.ndarray, n_rows: int):
    """One merged gather for ALL (level, corner) lookups.

    Measured on v5e (scripts/probe_gather_width.py): gather cost is per-ROW
    (~2.6 ns marginal) with a ~4-5 ms fixed cost PER OP, so 128 separate
    per-level-per-corner gathers at 1M queries cost ~620 ms while one merged
    gather of the same rows costs ~340 ms; scatter-add (the autodiff
    backward) is ~4x the gather per row. The custom VJP exists so the
    backward variant is pinned (and swappable) rather than whatever autodiff
    emits per call site."""
    return flat_table[idx]


def _table_lookup_fwd(flat_table, idx, n_rows):
    return flat_table[idx], idx


def _table_lookup_bwd(n_rows, idx, ct):
    """Table cotangent via wide-row grouped scatter-add.

    Measured (scripts/probe_scatter_variants.py, 16.8M/33.5M rows): the
    native narrow scatter-add costs ~61 ms per 1M rows and sorted
    segment_sum is no better; grouping 64 table slots into one 128-lane row
    (cotangent placed on its lane with an on-the-fly one-hot) cuts that to
    ~20 ms/M. Chunked so the (chunk, 128) temp stays ~0.5 GB."""
    (M,) = idx.shape
    C = ct.shape[-1]
    g = max(1, 128 // C)
    n_groups = -(-n_rows // g)

    # chunk size bounds the (CH, 128) one-hot temp at 512 MB f32: a 2 GB
    # temp measured fine standalone but regressed the SD-scale VSD program
    # 3x (HBM pressure -> spills) with the UNet/VAE/LoRA resident. Small
    # backwards (tests, dryruns, per-device strip slices) must NOT pad up to
    # a full chunk -- a 8k-row backward padded to 1M rows did 128x redundant
    # one-hot work, which on the 8-virtual-device 1-core CPU mesh stretched a
    # tiny fit step past XLA's 40 s collective-rendezvous termination.
    CH = min(1 << 20, max(128, 1 << (M - 1).bit_length()))
    n_chunks = max(1, -(-M // CH))
    pad = n_chunks * CH - M
    if pad:
        # pad rows scatter zeros into slot 0: harmless for an ADD
        idx = jnp.concatenate([idx, jnp.zeros((pad,), idx.dtype)])
        ct = jnp.concatenate([ct, jnp.zeros((pad, C), ct.dtype)])

    lanes = jnp.arange(g, dtype=idx.dtype)

    def body(acc, args):
        ic, cc = args
        row = ic // g
        oh = ((ic % g)[:, None] == lanes[None, :]).astype(cc.dtype)
        wide = (oh[:, :, None] * cc[:, None, :]).reshape(-1, g * C)
        return acc.at[row].add(wide), None

    zero = jnp.zeros((n_groups, g * C), ct.dtype)
    grad, _ = jax.lax.scan(
        body, zero, (idx.reshape(n_chunks, -1), ct.reshape(n_chunks, -1, C))
    )
    return grad.reshape(n_groups * g, C)[:n_rows], None


_table_lookup.defvjp(_table_lookup_fwd, _table_lookup_bwd)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    num_levels: int = 16
    level_dim: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    desired_resolution: int = 1024

    @property
    def per_level_scale(self) -> float:
        return float(
            np.exp2(
                np.log2(self.desired_resolution / self.num_levels)
                / (self.num_levels - 1)
            )
        )

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    def level_resolution(self, level: int) -> int:
        return int(round(self.base_resolution * self.per_level_scale ** level))


class HashGridEncoder(nn.Module):
    """Multi-resolution hash encoding (instant-ngp). x in [-bound, bound]^3."""

    cfg: HashGridConfig = HashGridConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray, bound: float = 1.0) -> jnp.ndarray:
        c = self.cfg
        T = 1 << c.log2_hashmap_size
        # STORED as (L, T*C), reshaped to (L, T, C) inside the program.
        # FORMAT BREAK (round 4): params/optimizer state serialized before
        # this change used (L, T, C) and will fail to load with a shape
        # mismatch; no such state ships in-repo, so no migration shim. A
        # stored trailing dim of C=2 pads 64x under the TPU's (8,128) tile
        # whenever a boundary copy pins the default layout -- inside a
        # lax.scan carry that turned each Adam moment into a 4 GB buffer
        # (fit chunk program OOM, round 4). With the big axis minor the
        # param/optimizer buffers tile cleanly; the gather operand below is
        # program-internal and keeps whatever layout the gather wants.
        table = self.param(
            "table",
            nn.initializers.uniform(scale=2e-4),  # tcnn init: U(-1e-4, 1e-4) shifted
            (c.num_levels, T * c.level_dim),
        ).reshape(c.num_levels, T, c.level_dim)
        table = table - 1e-4  # center the uniform init at 0

        u = (x + bound) / (2.0 * bound)  # [0, 1]
        # one merged gather for all levels x corners (see _table_lookup):
        # per-level offsets index the flattened (L*T, C) table
        idx_all, w_all = [], []
        for lvl in range(c.num_levels):
            res = c.level_resolution(lvl)
            pos = u * res
            p0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - p0

            for corner in range(8):
                off = jnp.asarray(
                    [(corner >> 0) & 1, (corner >> 1) & 1, (corner >> 2) & 1],
                    jnp.int32,
                )
                pc = jnp.clip(p0 + off, 0, res)
                if (res + 1) ** 3 <= T:
                    # dense indexing when the level fits the table (tcnn does this)
                    idx = (pc[:, 0] * (res + 1) + pc[:, 1]) * (res + 1) + pc[:, 2]
                else:
                    pu = pc.astype(jnp.uint32)
                    idx = (
                        pu[:, 0] * jnp.uint32(_PRIMES[0])
                        ^ pu[:, 1] * jnp.uint32(_PRIMES[1])
                        ^ pu[:, 2] * jnp.uint32(_PRIMES[2])
                    ) & jnp.uint32(T - 1)
                    idx = idx.astype(jnp.int32)
                w = jnp.prod(
                    jnp.where(off[None, :] == 1, frac, 1.0 - frac), axis=-1
                )
                idx_all.append(idx + lvl * T)
                w_all.append(w)

        L, N = c.num_levels, x.shape[0]
        idx_all = jnp.stack(idx_all)  # (L*8, N)
        w_all = jnp.stack(w_all).astype(table.dtype)  # (L*8, N)
        vals = _table_lookup(
            table.reshape(L * T, c.level_dim), idx_all.reshape(-1), L * T
        ).reshape(L, 8, N, c.level_dim)
        # weighted corner sum -> (L, N, C) -> (N, L*C), matching the
        # per-level concat order of the loop formulation
        feats = (vals * w_all.reshape(L, 8, N)[..., None]).sum(axis=1)
        return jnp.moveaxis(feats, 0, 1).reshape(N, L * c.level_dim)


class FrequencyEncoder(nn.Module):
    """Frequency encoding + implicit MLP (texture_encoder.py:39-59)."""

    n_frequencies: int = 12
    output_dim: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, bound: float = 1.0) -> jnp.ndarray:
        out = []
        for k in range(self.n_frequencies):
            f = (2.0 ** k) * jnp.pi
            out.append(jnp.sin(x * f))
            out.append(jnp.cos(x * f))
        h = jnp.concatenate(out, axis=-1)
        return MLP(self.output_dim, 128, 5, name="implicit_mlp")(h)


class TriplaneEncoder(nn.Module):
    """Three axis-aligned feature planes, bilinear sampled and summed
    (texture_encoder.py:62-91)."""

    output_dim: int = 32
    resolution: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, bound: float = 1.0) -> jnp.ndarray:
        planes = self.param(
            "planes",
            nn.initializers.kaiming_normal(),
            (3, self.resolution, self.resolution, self.output_dim),
        )
        u = jnp.clip((x / bound * 0.5 + 0.5) * (self.resolution - 1), 0, self.resolution - 1)
        ids = [(0, 1), (0, 2), (1, 2)]
        out = 0.0
        for p, (i, j) in enumerate(ids):
            a, b = u[:, i], u[:, j]
            a0 = jnp.floor(a).astype(jnp.int32)
            b0 = jnp.floor(b).astype(jnp.int32)
            a1 = jnp.clip(a0 + 1, 0, self.resolution - 1)
            b1 = jnp.clip(b0 + 1, 0, self.resolution - 1)
            fa, fb = (a - a0)[:, None], (b - b0)[:, None]
            out = out + (
                planes[p, a0, b0] * (1 - fa) * (1 - fb)
                + planes[p, a1, b0] * fa * (1 - fb)
                + planes[p, a0, b1] * (1 - fa) * fb
                + planes[p, a1, b1] * fa * fb
            )
        return out


class MLP(nn.Module):
    """Plain relu MLP (texture_encoder.py:93-112): num_layers linear layers,
    relu between (not after the last)."""

    dim_out: int
    dim_hidden: int = 32
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        for l in range(self.num_layers):
            last = l == self.num_layers - 1
            x = nn.Dense(self.dim_out if last else self.dim_hidden, name=f"fc{l}")(x)
            if not last:
                x = nn.relu(x)
        return x

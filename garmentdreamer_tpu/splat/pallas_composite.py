"""Pallas TPU kernel for the per-tile splat compositing pass.

This is the framework's hottest loop (SURVEY.md section 3.2: FORWARD::render,
reference forward.cu:261-381 -- one 16x16 CUDA block per tile). Mapping:

* each grid program composites ``TPB`` tiles; per-tile instance windows are
  DMA'd from the tile-sorted (16, L) HBM attribute matrix with double
  buffering, so tile i+1's window streams in while tile i computes;
* window starts come from the scalar-prefetched ``starts`` array, aligned
  down to 128 lanes (Mosaic slice alignment) with [s, e) masking of
  neighbors' rows;
* the front-to-back transmittance recurrence is evaluated with a
  lower-triangular MXU matmul over log(1 - alpha) -- prefix sums on the MXU
  instead of a sequential scan;
* per tile the kernel emits a (5, 256) block: rgb, alpha, expected depth.

The XLA path (rasterize.py tile_body) remains the autodiff/backward
implementation; this kernel serves inference (render_ring, bench).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
PIX = TILE * TILE
T_EPS = 1e-4
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
ALIGN = 128  # lane alignment quantum for the HBM window start
TPB = 8  # tiles per grid program

__all__ = ["composite_tiles_pallas", "TPB"]


def _unpack2(block_u32):
    """(R, W) u32 block -> (hi, lo) f32 blocks: the bf16 pairs packed by
    rasterize._pack2 ((bf16(a) << 16) | bf16(b)). 2D because Mosaic bitcast
    requires rank >= 2."""
    hi = pltpu.bitcast((block_u32 >> 16).astype(jnp.uint16), jnp.bfloat16)
    lo = pltpu.bitcast((block_u32 & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
    return hi.astype(jnp.float32), lo.astype(jnp.float32)


def _kernel(starts_ref, attrs_ref, bg_ref, out_ref, scratch, sem, *, W, tiles_x,
            max_off, tpb, relative_means, packed):
    blk = pl.program_id(0)
    t_base = blk * tpb

    row = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    tri_incl = (col <= row).astype(jnp.float32)  # inclusive lower-triangular
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    bg = bg_ref[0, :]  # (3,)

    def off_of(t):
        s = starts_ref[t]
        return pl.multiple_of(
            jnp.minimum((s // ALIGN) * ALIGN, max_off), ALIGN
        )

    def get_dma(slot, t):
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(off_of(t), W)], scratch.at[slot], sem.at[slot]
        )

    get_dma(0, t_base).start()

    def body(i, _):
        t = t_base + i
        slot = i % 2

        @pl.when(i + 1 < tpb)
        def _():
            get_dma((i + 1) % 2, t + 1).start()

        get_dma(slot, t).wait()
        s = starts_ref[t]
        e = starts_ref[t + 1]
        off = off_of(t)

        ty = t // tiles_x
        tx = t % tiles_x
        if relative_means or packed:
            # bf16 payload modes: means are stored tile-relative, so pixel
            # coordinates are tile-local too (keeps bf16 sub-pixel precision)
            px = (lin % TILE).astype(jnp.float32)  # (1, PIX)
            py = (lin // TILE).astype(jnp.float32)
        else:
            px = (tx * TILE + (lin % TILE)).astype(jnp.float32)  # (1, PIX)
            py = (ty * TILE + (lin // TILE)).astype(jnp.float32)

        idx = off + jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        # cap at s+K exactly like the XLA tile path's max_per_tile window
        e_cap = jnp.minimum(e, s + (W - ALIGN))
        in_range = ((idx >= s) & (idx < e_cap)).astype(jnp.float32)  # (W, 1)

        if packed:
            raw = scratch[slot]  # (8, W) u32; rows 5..7 pad
            hi, lo = _unpack2(raw)  # (8, W) f32 each
            mx_v, my_v = hi[0, :], lo[0, :]
            ca_v, cb_v = hi[1, :], lo[1, :]
            cc_v, op_v = hi[2, :], lo[2, :]
            r_v, g_v = hi[3, :], lo[3, :]
            b_v, dp_v = hi[4, :], lo[4, :]
            rgb_rows = jnp.stack([r_v, g_v, b_v], axis=0)  # (3, W)
        else:
            rows = scratch[slot].astype(jnp.float32)  # (16, W); rows 10+ pad
            mx_v, my_v = rows[0, :], rows[1, :]
            ca_v, cb_v, cc_v = rows[2, :], rows[3, :], rows[4, :]
            op_v, dp_v = rows[8, :], rows[9, :]
            rgb_rows = rows[5:8, :]

        mx = mx_v[:, None]  # (W, 1)
        my = my_v[:, None]
        ca = ca_v[:, None]
        cb = cb_v[:, None]
        cc = cc_v[:, None]
        op = op_v[:, None] * in_range

        dx = px - mx  # (W, PIX)
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = op * jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
        alpha = jnp.minimum(alpha, ALPHA_MAX)

        logs = jnp.log1p(-alpha)  # (W, PIX)
        incl = jnp.dot(tri_incl, logs, preferred_element_type=jnp.float32)
        t_after = jnp.exp(incl)
        t_prefix = jnp.exp(incl - logs)  # (W, PIX)
        contrib = (t_after >= T_EPS).astype(jnp.float32)  # CUDA early-exit analog
        w = alpha * t_prefix * contrib  # (W, PIX)

        rgb = jnp.dot(rgb_rows, w, preferred_element_type=jnp.float32)
        acc_d = jnp.sum(w * dp_v[:, None], axis=0, keepdims=True)
        t_final = jnp.exp(jnp.sum(logs * contrib, axis=0, keepdims=True))

        out_ref[i, 0:3, :] = rgb + bg[:, None] * t_final
        out_ref[i, 3:4, :] = 1.0 - t_final
        out_ref[i, 4:5, :] = acc_d
        return 0

    jax.lax.fori_loop(0, tpb, body, 0)


@functools.partial(jax.jit, static_argnames=("n_tiles", "tiles_x", "K"))
def composite_tiles_pallas(
    starts: jnp.ndarray,  # (T+1,) int32
    inst_attrs_t: jnp.ndarray,  # (10, L) f32, tile-sorted columns
    bg: jnp.ndarray,  # (3,)
    n_tiles: int,
    tiles_x: int,
    K: int = 256,
):
    """-> (T, 5, 256): per-tile [r, g, b, alpha, depth] x pixels (row-major
    16x16, x fastest).

    ``inst_attrs_t`` may be float32 (10 rows, absolute pixel means), bfloat16
    (10 rows, means tile-relative; halves sort+DMA bytes, ~0.4% value error),
    or uint32 (5 rows of packed bf16 pairs from rasterize._pack2 -- halves
    the SORT-operand count on top).
    """
    assert K % ALIGN == 0, "K must be a multiple of 128"
    tpb = next(d for d in (TPB, 4, 2, 1) if n_tiles % d == 0)
    W = K + ALIGN  # window width: K capacity + slack for the align-down shift
    dtype = inst_attrs_t.dtype
    relative_means = dtype == jnp.bfloat16
    packed = dtype == jnp.uint32
    n_rows = 8 if packed else 16  # Mosaic sublane alignment of the HBM slice
    L = inst_attrs_t.shape[1]
    # L and max_off must stay ALIGN-multiples for the divisibility hint
    pad_l = max(W - L, (-L) % ALIGN)
    inst_attrs_t = jnp.pad(
        inst_attrs_t, ((0, n_rows - inst_attrs_t.shape[0]), (0, pad_l))
    )
    L = L + pad_l
    max_off = L - W

    kernel = functools.partial(
        _kernel, W=W, tiles_x=tiles_x, max_off=max_off, tpb=tpb,
        relative_means=relative_means, packed=packed,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // tpb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # inst_attrs stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bg
        ],
        out_specs=pl.BlockSpec(
            (tpb, 5, PIX), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, n_rows, W), dtype),  # double-buffered windows
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 5, PIX), jnp.float32),
        # Mosaic only compiles for real TPUs; on the CPU backend (tests,
        # virtual multi-device mesh) fall back to the interpreter
        interpret=jax.default_backend() == "cpu",
    )(starts, inst_attrs_t, bg[None, :])
    return out

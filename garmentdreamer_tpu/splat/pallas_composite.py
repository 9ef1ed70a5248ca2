"""Pallas TPU kernel for the per-tile splat compositing pass.

This is the framework's hottest loop (SURVEY.md section 3.2: FORWARD::render,
reference forward.cu:261-381 -- one 16x16 CUDA block per tile, shared-memory
batches of 256 Gaussians looped until the tile's list is exhausted). Mapping:

* each grid program composites ``TPB`` tiles; every tile CHAINS windows of
  ``K`` instances -- DMA'd from the tile-sorted HBM attribute matrix with
  double buffering -- until its full list is consumed, carrying the
  transmittance/color accumulators across windows. No per-tile depth cap:
  like the CUDA kernel, arbitrarily deep lists are composited exactly, and
  per-pixel accumulation stops at the T < 1e-4 early-exit;
* window starts come from the scalar-prefetched ``starts`` array, aligned
  down to 128 lanes (Mosaic slice alignment) with [lo, hi) masking;
* the front-to-back transmittance recurrence is evaluated per window with a
  lower-triangular MXU matmul over log(1 - alpha) -- prefix sums on the MXU
  instead of a sequential scan -- stitched across windows by the log-T carry.

Early-exit semantics match forward.cu:300-320: a splat whose inclusion would
push T below 1e-4 is skipped and the pixel freezes; the weight prefix uses
the TRUE transmittance product while the output alpha uses the frozen one.

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


def _kernel(starts_ref, attrs_ref, bg_ref, out_ref, scratch, sem, *, W, K,
            tiles_x, max_off, tpb, relative_means, packed):
    blk = pl.program_id(0)
    t_base = blk * tpb

    row = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    tri_incl = (col <= row).astype(jnp.float32)  # inclusive lower-triangular
    lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    bg = bg_ref[0, :]  # (3,)

    def off_of(pos):
        return pl.multiple_of(
            jnp.minimum((pos // ALIGN) * ALIGN, max_off), ALIGN
        )

    def get_dma(slot, pos):
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(off_of(pos), W)], scratch.at[slot], sem.at[slot]
        )

    def tile_loop(i, _):
        t = t_base + i
        s = starts_ref[t]
        e = starts_ref[t + 1]
        n_win = (e - s + K - 1) // K  # 0 for empty tiles

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

        @pl.when(n_win > 0)
        def _():
            get_dma(0, s).start()

        def win_body(w, carry):
            tlog_true, tlog_frozen, rgb_acc, d_acc = carry
            slot = w % 2
            lo = s + w * K
            hi = jnp.minimum(e, lo + K)

            @pl.when(w + 1 < n_win)
            def _():
                get_dma((w + 1) % 2, lo + K).start()

            get_dma(slot, lo).wait()
            off = off_of(lo)

            idx = off + jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
            in_range = ((idx >= lo) & (idx < hi)).astype(jnp.float32)  # (W, 1)

            if packed:
                raw = scratch[slot]  # (8, W) u32; rows 5..7 pad
                hi2, lo2 = _unpack2(raw)  # (8, W) f32 each
                mx_v, my_v = hi2[0, :], lo2[0, :]
                ca_v, cb_v = hi2[1, :], lo2[1, :]
                cc_v, op_v = hi2[2, :], lo2[2, :]
                r_v, g_v = hi2[3, :], lo2[3, :]
                b_v, dp_v = hi2[4, :], lo2[4, :]
                rgb_rows = jnp.stack([r_v, g_v, b_v], axis=0)  # (3, W)
            else:
                rows = scratch[slot].astype(jnp.float32)  # (16, W)
                mx_v, my_v = rows[0, :], rows[1, :]
                ca_v, cb_v, cc_v = rows[2, :], rows[3, :], rows[4, :]
                op_v, dp_v = rows[8, :], rows[9, :]
                rgb_rows = rows[5:8, :]

            dx = px - mx_v[:, None]  # (W, PIX)
            dy = py - my_v[:, None]
            power = (
                -0.5 * (ca_v[:, None] * dx * dx + cc_v[:, None] * dy * dy)
                - cb_v[:, None] * dx * dy
            )
            op = op_v[:, None] * in_range
            alpha = op * jnp.exp(jnp.minimum(power, 0.0))
            alpha = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
            alpha = jnp.minimum(alpha, ALPHA_MAX)

            logs = jnp.log1p(-alpha)  # (W, PIX)
            if packed or relative_means:
                # bf16 MXU inputs for the O(W^2 PIX) prefix matmul: log-space
                # values are O(1) negatives, so bf16's ~0.4% relative error
                # stays within the bf16-payload error budget; f32 accumulate.
                # The f32 payload mode keeps the full-precision matmul (its
                # contract is 1e-5 parity with the XLA path).
                incl = jnp.dot(
                    tri_incl.astype(jnp.bfloat16), logs.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            else:
                incl = jnp.dot(tri_incl, logs, preferred_element_type=jnp.float32)
            # TRUE transmittance after/before each splat, incl. the carry
            t_after = jnp.exp(tlog_true + incl)
            t_prefix = jnp.exp(tlog_true + incl - logs)
            contrib = (t_after >= T_EPS).astype(jnp.float32)  # CUDA early-exit
            wgt = alpha * t_prefix * contrib  # (W, PIX)

            rgb_acc = rgb_acc + jnp.dot(
                rgb_rows, wgt, preferred_element_type=jnp.float32
            )
            d_acc = d_acc + jnp.sum(wgt * dp_v[:, None], axis=0, keepdims=True)
            tlog_true = tlog_true + jnp.sum(logs, axis=0, keepdims=True)
            tlog_frozen = tlog_frozen + jnp.sum(logs * contrib, axis=0, keepdims=True)
            return tlog_true, tlog_frozen, rgb_acc, d_acc

        zero1 = jnp.zeros((1, PIX), jnp.float32)
        zero3 = jnp.zeros((3, PIX), jnp.float32)
        _, tlog_frozen, rgb_acc, d_acc = jax.lax.fori_loop(
            0, n_win, win_body, (zero1, zero1, zero3, zero1)
        )

        t_final = jnp.exp(tlog_frozen)  # (1, PIX)
        out_ref[i, 0:3, :] = rgb_acc + bg[:, None] * t_final
        out_ref[i, 3:4, :] = 1.0 - t_final
        out_ref[i, 4:5, :] = d_acc
        return 0

    jax.lax.fori_loop(0, tpb, tile_loop, 0)


@functools.partial(jax.jit, static_argnames=("n_tiles", "tiles_x", "K"))
def composite_tiles_pallas(
    starts: jnp.ndarray,  # (T+1,) int32
    inst_attrs_t: jnp.ndarray,  # (10, L) f32 / bf16 or (5, L) u32 packed
    bg: jnp.ndarray,  # (3,)
    n_tiles: int,
    tiles_x: int,
    K: int = 256,
):
    """-> (T, 5, 256): per-tile [r, g, b, alpha, depth] x pixels (row-major
    16x16, x fastest). ``K`` is the WINDOW size (the CUDA shared-memory batch,
    forward.cu BLOCK-batch of 256), not a cap: tiles with deeper lists chain
    windows until exhausted, so output is exact for any list depth.

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
        _kernel, W=W, K=K, tiles_x=tiles_x, max_off=max_off, tpb=tpb,
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

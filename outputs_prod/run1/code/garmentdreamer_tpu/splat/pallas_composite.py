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

__all__ = ["composite_tiles_pallas", "composite_grad_tiles_pallas", "TPB"]


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


def _grad_kernel(starts_ref, win_base_ref, attrs_ref, ct_ref, bg_ref, out_ref,
                 scratch, out_scratch, sem, out_sem, *, K, tiles_x, tpb,
                 max_p0, n_tiles, n_win_max):
    """Backward of the packed compositor (the CUDA BACKWARD::render analog,
    reference backward.cu:416-598, re-designed for TPU).

    CUDA re-rasterizes BACK-to-front using saved per-pixel state and
    atomicAdds per-Gaussian gradients. Here each tile runs two FORWARD
    window scans instead (no atomics, no saved state):

    * pass 1 accumulates the total weighted-cotangent sum
      ``S_total = sum_i w_i u_i`` (with ``u_i = <dC, c_i> + dD * d_i``) and
      the final frozen transmittance;
    * pass 2 recomputes each window's alpha/weights, forms the inclusive
      prefix ``P_i`` with an MXU triangular matmul, and evaluates the
      closed-form
      ``dL/dalpha_i = contrib_i * (T_i u_i - (S_total - P_i + T_N b)/(1-alpha_i))``
      (the suffix sum a back-to-front scan would carry, expressed as
      total-minus-prefix so both passes stream front-to-back), then chains
      through the Gaussian kernel to per-instance gradients of
      [mean2d, conic, color, opacity, depth].

    Gradient rows are written per (tile, window) SLOT (slot index from the
    prefetched ``win_base`` cumsum); slot windows start at the 128-aligned
    ``align_down(tile_start)`` so every DMA is aligned and no two tiles ever
    write the same slot. Rows outside the tile's true [s, e) range emit
    zeros; the XLA wrapper routes rows back to sorted order with one
    position-keyed sort.
    """
    blk = pl.program_id(0)
    t_base = blk * tpb

    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tri_incl = (col <= row).astype(jnp.bfloat16)
    bg = bg_ref[0, :]  # (3,)

    def in_dma(slot, p0):
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(pl.multiple_of(jnp.minimum(p0, max_p0), ALIGN), K)],
            scratch.at[slot], sem.at[slot],
        )

    def tile_loop(i, _):
        t = t_base + i
        s = starts_ref[t]
        e = starts_ref[t + 1]
        off0 = (s // ALIGN) * ALIGN
        n_win = jnp.where(e > s, (e - off0 + K - 1) // K, 0)
        slot0 = win_base_ref[t]

        ct_r = ct_ref[i, 0:1, :]  # (1, PIX)
        ct_g = ct_ref[i, 1:2, :]
        ct_b = ct_ref[i, 2:3, :]
        ct_a = ct_ref[i, 3:4, :]
        ct_d = ct_ref[i, 4:5, :]
        b_px = bg[0] * ct_r + bg[1] * ct_g + bg[2] * ct_b - ct_a  # dL/dT_N

        lin = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
        # packed payloads store tile-relative means -> tile-local pixels
        px = (lin % TILE).astype(jnp.float32)
        py = (lin // TILE).astype(jnp.float32)

        def unpack_window(slot, p0):
            raw = scratch[slot]  # (8, K) u32
            hi2, lo2 = _unpack2(raw)
            pos = p0 + jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
            in_range = ((pos >= s) & (pos < e)).astype(jnp.float32)
            mx_v, my_v = hi2[0, :], lo2[0, :]
            ca_v, cb_v = hi2[1, :], lo2[1, :]
            cc_v, op_v = hi2[2, :], lo2[2, :]
            r_v, g_v = hi2[3, :], lo2[3, :]
            b_v, dp_v = hi2[4, :], lo2[4, :]
            dx = px - mx_v[:, None]  # (K, PIX)
            dy = py - my_v[:, None]
            power = (
                -0.5 * (ca_v[:, None] * dx * dx + cc_v[:, None] * dy * dy)
                - cb_v[:, None] * dx * dy
            )
            op = op_v[:, None] * in_range
            ge = jnp.exp(jnp.minimum(power, 0.0))
            a0 = op * ge
            valid = ((power <= 0.0) & (a0 >= ALPHA_MIN)).astype(jnp.float32)
            alpha = jnp.minimum(a0 * valid, ALPHA_MAX)
            u = (
                r_v[:, None] * ct_r + g_v[:, None] * ct_g
                + b_v[:, None] * ct_b + dp_v[:, None] * ct_d
            )
            return (dx, dy, power, op, ge, a0, valid, alpha, u,
                    (ca_v, cb_v, cc_v, r_v, g_v, b_v, dp_v))

        # ---- pass 1: S_total, final transmittances --------------------
        @pl.when(n_win > 0)
        def _():
            in_dma(0, off0).start()

        def pass1(w, carry):
            tlog_true, tlog_frozen, s_tot = carry
            slot = w % 2
            p0 = off0 + w * K

            @pl.when(w + 1 < n_win)
            def _():
                in_dma((w + 1) % 2, p0 + K).start()

            in_dma(slot, p0).wait()
            (dx, dy, power, op, ge, a0, valid, alpha, u, _av) = unpack_window(slot, p0)
            logs = jnp.log1p(-alpha)
            incl = jnp.dot(tri_incl, logs.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            t_after = jnp.exp(tlog_true + incl)
            t_prefix = jnp.exp(tlog_true + incl - logs)
            contrib = (t_after >= T_EPS).astype(jnp.float32)
            wgt = alpha * t_prefix * contrib
            s_tot = s_tot + jnp.sum(wgt * u, axis=0, keepdims=True)
            tlog_true = tlog_true + jnp.sum(logs, axis=0, keepdims=True)
            tlog_frozen = tlog_frozen + jnp.sum(logs * contrib, axis=0, keepdims=True)
            return tlog_true, tlog_frozen, s_tot

        zero1 = jnp.zeros((1, PIX), jnp.float32)
        _, tlog_frozen, s_tot = jax.lax.fori_loop(
            0, n_win, pass1, (zero1, zero1, zero1)
        )
        t_fro = jnp.exp(tlog_frozen)  # (1, PIX) final frozen transmittance

        # ---- pass 2: gradients ----------------------------------------
        @pl.when(n_win > 0)
        def _():
            in_dma(0, off0).start()

        def pass2(w, carry):
            tlog_true, p_carry = carry
            slot = w % 2
            p0 = off0 + w * K

            @pl.when(w + 1 < n_win)
            def _():
                in_dma((w + 1) % 2, p0 + K).start()

            in_dma(slot, p0).wait()
            (dx, dy, power, op, ge, a0, valid, alpha, u,
             (ca_v, cb_v, cc_v, r_v, g_v, b_v, dp_v)) = unpack_window(slot, p0)
            logs = jnp.log1p(-alpha)
            incl = jnp.dot(tri_incl, logs.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            t_after = jnp.exp(tlog_true + incl)
            t_prefix = jnp.exp(tlog_true + incl - logs)
            contrib = (t_after >= T_EPS).astype(jnp.float32)
            wgt = alpha * t_prefix * contrib

            wu = wgt * u
            p_inc = (
                jnp.dot(tri_incl, wu.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                + p_carry
            )
            s_after = s_tot - p_inc
            dalpha = contrib * (
                t_prefix * u - (s_after + t_fro * b_px) / (1.0 - alpha)
            )
            # gates: ceiling clamp (min with 0.99) and the validity mask
            gate = valid * (a0 * valid <= ALPHA_MAX).astype(jnp.float32)
            d_a0 = dalpha * gate
            dpow = d_a0 * op * ge  # d/dpower through exp(min(power, 0))

            def rsum(x):  # (K, PIX) -> (K,)
                return jnp.sum(x, axis=1)

            g_mx = rsum(dpow * (ca_v[:, None] * dx + cb_v[:, None] * dy))
            g_my = rsum(dpow * (cc_v[:, None] * dy + cb_v[:, None] * dx))
            g_ca = rsum(dpow * (-0.5 * dx * dx))
            g_cb = rsum(dpow * (-dx * dy))
            g_cc = rsum(dpow * (-0.5 * dy * dy))
            g_r = rsum(wgt * ct_r)
            g_g = rsum(wgt * ct_g)
            g_b = rsum(wgt * ct_b)
            g_op = rsum(d_a0 * ge)
            g_dp = rsum(wgt * ct_d)

            oslot = w % 2

            @pl.when(w >= 2)
            def _():
                out_dma(oslot, slot0 + w - 2).wait()

            out_scratch[oslot, 0, :] = g_mx
            out_scratch[oslot, 1, :] = g_my
            out_scratch[oslot, 2, :] = g_ca
            out_scratch[oslot, 3, :] = g_cb
            out_scratch[oslot, 4, :] = g_cc
            out_scratch[oslot, 5, :] = g_r
            out_scratch[oslot, 6, :] = g_g
            out_scratch[oslot, 7, :] = g_b
            out_scratch[oslot, 8, :] = g_op
            out_scratch[oslot, 9, :] = g_dp
            out_dma(oslot, slot0 + w).start()

            tlog_true = tlog_true + jnp.sum(logs, axis=0, keepdims=True)
            p_carry = p_carry + jnp.sum(wu, axis=0, keepdims=True)
            return tlog_true, p_carry

        def out_dma(oslot, slot_idx):
            return pltpu.make_async_copy(
                out_scratch.at[oslot], out_ref.at[slot_idx], out_sem.at[oslot]
            )

        jax.lax.fori_loop(0, n_win, pass2, (zero1, zero1))
        # drain the last (up to) two in-flight output copies
        @pl.when(n_win >= 2)
        def _():
            out_dma((n_win - 2) % 2, slot0 + n_win - 2).wait()

        @pl.when(n_win >= 1)
        def _():
            out_dma((n_win - 1) % 2, slot0 + n_win - 1).wait()

        return 0

    jax.lax.fori_loop(0, tpb, tile_loop, 0)

    # ---- zero-fill the unused slot tail ------------------------------
    # Slots in [win_base[n_tiles], n_win_max) belong to no tile; the XLA
    # routing sort relies on them carrying zeros (their sentinel position
    # keys land them in the uncovered-position region). Strided partition
    # over grid programs; ~10 KB copies, serialized waits are negligible.
    n_used = win_base_ref[n_tiles]
    n_progs = pl.num_programs(0)
    out_scratch[0, :, :] = jnp.zeros((16, K), jnp.float32)

    def zfill(j, _):
        slot_idx = n_used + blk + j * n_progs
        cp = pltpu.make_async_copy(
            out_scratch.at[0], out_ref.at[slot_idx], out_sem.at[0]
        )
        cp.start()
        cp.wait()
        return 0

    n_z = (n_win_max - n_used - blk + n_progs - 1) // n_progs
    jax.lax.fori_loop(0, jnp.maximum(n_z, 0), zfill, 0)


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "tiles_x", "K", "n_win_max")
)
def composite_grad_tiles_pallas(
    starts: jnp.ndarray,  # (T+1,) int32
    win_base: jnp.ndarray,  # (T+1,) int32 cumulative window-slot offsets
    inst_attrs_t: jnp.ndarray,  # (5+, L) u32 packed (extra rows ignored)
    ct_tiles: jnp.ndarray,  # (T, 5, PIX) f32 cotangents of [r,g,b,a,d]
    bg: jnp.ndarray,  # (3,)
    n_tiles: int,
    tiles_x: int,
    K: int = 256,
    n_win_max: int = 0,
) -> jnp.ndarray:
    """-> (n_win_max, 16, K) f32 per-slot gradient rows; rows 0..9 are
    [dmx, dmy, dca, dcb, dcc, dr, dg, db, dop, ddp], rows 10..15 pad
    (Mosaic sublane tiling).

    Slot ``win_base[t] + w`` holds window ``w`` of tile ``t``, whose rows map
    to sorted positions ``align_down(starts[t]) + w*K + [0, K)``; rows outside
    the tile's [starts[t], starts[t+1]) range are zero. Slots beyond
    ``win_base[n_tiles]`` stay at their zero initialization (the output is
    zero-aliased), so the caller's position-keyed routing sort sees zeros for
    every uncovered position.
    """
    assert K % ALIGN == 0, "K must be a multiple of 128"
    assert n_win_max > 0
    tpb = next(d for d in (TPB, 4, 2, 1) if n_tiles % d == 0)
    n_rows = 8
    L = inst_attrs_t.shape[1]
    pad_l = K + ((-L) % ALIGN)
    inst_attrs_t = jnp.pad(
        inst_attrs_t, ((0, n_rows - inst_attrs_t.shape[0]), (0, pad_l))
    )
    L_pad = L + pad_l
    max_p0 = ((L_pad - K) // ALIGN) * ALIGN

    kernel = functools.partial(
        _grad_kernel, K=K, tiles_x=tiles_x, tpb=tpb, max_p0=max_p0,
        n_tiles=n_tiles, n_win_max=n_win_max,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # starts, win_base
        grid=(n_tiles // tpb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # inst_attrs stays in HBM
            pl.BlockSpec((tpb, 5, PIX), lambda b, *_: (b, 0, 0)),  # ct tiles
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bg
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, n_rows, K), jnp.uint32),  # double-buffered windows
            # 16 rows (10 used): Mosaic DMA slices need sublane dims aligned
            # to the (8, 128) f32 tiling
            pltpu.VMEM((2, 16, K), jnp.float32),  # double-buffered grad out
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_win_max, 16, K), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(starts, win_base, inst_attrs_t, ct_tiles, bg[None, :])
    return out


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

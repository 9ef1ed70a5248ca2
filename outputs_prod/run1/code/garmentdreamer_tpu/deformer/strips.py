"""Intra-step strip sharding for the stage-3 deformer: split each 1024^2
G-buffer render + per-pixel losses into horizontal row strips, one per chip.

The reference's deformation loop is strictly sequential SGD -- one view per
iteration, each step depending on the previous (deformation.py:169-357) --
so view-level data parallelism cannot shorten it. But ~all of a step's cost
is per-PIXEL work (rasterize + barycentrics + antialias + losses over ~1M
pixels); the per-VERTEX work (normals, laplacian, optimizer) is thousands of
times smaller. This module shards the pixel work spatially:

* each device renders an EXTENDED strip of ``hs = H/S`` rows plus a 16-row
  halo on each side (antialiasing looks exactly one pixel across, so inner
  rows of the extended strip reproduce the full-image render bit-for-math);
* per-pixel losses are computed per strip as (numerator, denominator)
  partials whose global denominators are ``psum``'d over the strip axis --
  summing the per-device partial losses reproduces the full-image loss to
  float tolerance;
* the coverage-independent regularizers (laplacian / normal consistency) are
  computed replicated and divided by the strip count so the gradient psum
  counts them once;
* vertex gradients are ``psum``'d; parameters and optimizer state stay
  replicated, so every device applies the identical update.

The same per-strip functions run under ``shard_map`` over a real device mesh
(production) and under ``jax.vmap(..., axis_name=AXIS)`` on one device (the
math oracle used by tests / the real-chip single-strip rate bench): the
collectives see the same axis name either way.

The strip camera trick mirrors ``parallel/dp.py strip_cameras`` (stage-1
splats): rendering rows [off, off+He) of the full image is an affine remap of
the projection's NDC y row, ``row1' = a*row1 + b*row3`` -- exact, because NDC
y is affine in clip y/w.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from garmentdreamer_tpu.meshops.losses import (
    camera_view_cosines,
    to_camera_normal,
)
from garmentdreamer_tpu.rast.gbuffer import render_gbuffer

__all__ = [
    "AXIS",
    "OVERLAP",
    "strip_extent",
    "strip_mvp",
    "render_gbuffer_strip",
    "strip_mask_loss",
    "strip_hole_mask_loss",
    "strip_normal_map_loss",
    "strip_normal_map_loss_enhanced",
    "strip_shading_inputs",
]

AXIS = "strips"
# halo rows rendered above/below each strip: antialiasing pairs pixels one
# row/column apart, so 1 row would suffice; a full 16-px tile keeps the
# extended height tile-aligned cheaply
OVERLAP = 16


def strip_extent(height: int, n_strips: int) -> tuple:
    """(hs, He): inner rows per strip and the tile-aligned extended render
    height. ``height`` must divide evenly into ``n_strips``."""
    assert height % n_strips == 0, (height, n_strips)
    hs = height // n_strips
    He = -(-(hs + 2 * OVERLAP) // 16) * 16
    return hs, He


def strip_mvp(mvp: jnp.ndarray, k, height: int, n_strips: int) -> jnp.ndarray:
    """MVP whose viewport is full-image pixel rows [k*hs - OVERLAP, ... + He).

    Derivation: y_strip_px = y_full_px - off with off = k*hs - OVERLAP;
    screen y = (ndc_y*0.5+0.5)*H, so ndc'_y = ndc_y*(H/He) + (H-2*off)/He - 1,
    i.e. clip'_y = a*clip_y + b*clip_w (``k`` may be a traced scalar)."""
    hs, He = strip_extent(height, n_strips)
    off = k * hs - OVERLAP
    a = height / He
    b = (height - 2.0 * off) / He - 1.0
    row1 = a * mvp[1, :] + b * mvp[3, :]
    return mvp.at[1, :].set(row1)


def render_gbuffer_strip(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    vert_normals: jnp.ndarray,
    mvp: jnp.ndarray,
    k,
    height: int,
    width: int,
    n_strips: int,
    max_tiles_per_tri: int = 32,
    max_per_tile: int = 512,
) -> Dict[str, jnp.ndarray]:
    """Strip k's inner rows of the full-image G-buffer: {mask (hs,W,1),
    position, normal, face_id (hs,W), n_dropped}. Inner rows match the
    full-image ``render_gbuffer`` output to float tolerance (the halo rows
    supply the cross-strip antialiasing neighbors)."""
    hs, He = strip_extent(height, n_strips)
    mvp_s = strip_mvp(mvp, k, height, n_strips)
    g = render_gbuffer(
        verts, faces, vert_normals, mvp_s, He, width,
        max_tiles_per_tri, max_per_tile,
    )
    out = {}
    for key, v in g.items():
        out[key] = v[OVERLAP:OVERLAP + hs] if v.ndim >= 2 else v
    return out


# ---------------------------------------------------------------------------
# per-strip loss partials: each returns a scalar whose psum over AXIS equals
# the full-image loss (meshops/losses.py forms). Global denominators are
# non-differentiable (masks / stop-gradient weights), so psum'ing them inside
# the loss is VJP-safe.
# ---------------------------------------------------------------------------


def _axis_sum(x):
    return jax.lax.psum(x, AXIS)


def strip_mask_loss(view_mask_s, rendered_mask_s, height: int, width: int):
    """Partial of mask MSE (losses.mask_loss): strip SSE / (H*W)."""
    return jnp.sum((view_mask_s - rendered_mask_s) ** 2) / (height * width)


def strip_hole_mask_loss(g_s, g_rf_s, cam_R, cam_center):
    """Partial of hole_mask_loss: strip mismatch sum / psum(valid count)."""
    n = to_camera_normal(g_s["normal"], cam_R)
    n_rf = to_camera_normal(g_rf_s["normal"], cam_R)
    c = camera_view_cosines(g_s["position"], n, cam_R, cam_center)
    c_rf = camera_view_cosines(g_rf_s["position"], n_rf, cam_R, cam_center)
    sign = jax.lax.stop_gradient(jnp.where(c < 0, -1.0, 1.0))
    sign_rf = jax.lax.stop_gradient(jnp.where(c_rf < 0, -1.0, 1.0))
    m = (g_s["mask"][..., 0] > 0) & (g_rf_s["mask"][..., 0] > 0)
    denom = jnp.maximum(_axis_sum(jnp.sum(m)), 1)
    return jnp.sum(jnp.where(m, (sign - sign_rf) ** 2, 0.0)) / denom


def strip_normal_map_loss(view_normal01_s, view_mask_s, g_s, cam_R):
    """Partial of normal_map_loss: strip L1 sum / (psum(valid)*3)."""
    n = 0.5 * (to_camera_normal(g_s["normal"], cam_R) + 1.0)
    m = (view_mask_s[..., 0] > 0) & (g_s["mask"][..., 0] > 0)
    denom = jnp.maximum(_axis_sum(jnp.sum(m)), 1) * 3
    diff = jnp.abs(n - view_normal01_s)
    return jnp.sum(jnp.where(m[..., None], diff, 0.0)) / denom


def strip_normal_map_loss_enhanced(
    view_normal01_s, view_mask_s, g_s, cam_R, cam_center, epsilon: float = -0.1
):
    """Partial of normal_map_loss_enhanced: the exp-cos weights are
    normalized by their FULL-image sum (psum'd; the reference divides by the
    whole-image sum, normal.py:36)."""
    n = to_camera_normal(g_s["normal"], cam_R)
    target = view_normal01_s * 2.0 - 1.0
    nn = jnp.maximum(jnp.linalg.norm(n, axis=-1), 1e-8)
    tn = jnp.maximum(jnp.linalg.norm(target, axis=-1), 1e-8)
    errors = 1.0 - jnp.sum(n * target, axis=-1) / (nn * tn)

    cos_t = jax.lax.stop_gradient(
        camera_view_cosines(g_s["position"], target, cam_R, cam_center)
    )
    cos_t = jnp.where(cos_t > epsilon, 0.0, cos_t)
    cos_v = jax.lax.stop_gradient(
        camera_view_cosines(g_s["position"], n, cam_R, cam_center)
    )
    w = jnp.exp(jnp.abs(cos_t))
    w_tot = _axis_sum(jnp.sum(w))
    m = (
        (view_mask_s[..., 0] > 0)
        & (g_s["mask"][..., 0] > 0)
        & (cos_v <= 0)
        & (cos_t <= epsilon)
    )
    return jnp.sum(jnp.where(m, errors * w, 0.0)) / w_tot


class StripShading(NamedTuple):
    position: jnp.ndarray
    normal: jnp.ndarray
    view_dir: jnp.ndarray
    target_rgb: jnp.ndarray
    weight: jnp.ndarray
    denom: jnp.ndarray  # GLOBAL psum'd valid-sample weight


def strip_shading_inputs(
    view_rgb_s, view_mask_s, g_s, cam_R, cam_center, rng, k,
    num_samples_strip: int, shading_percentage: float = 0.75,
) -> StripShading:
    """Per-strip shading samples (losses.shading_loss_inputs, stratified by
    strip): each strip draws its own ``num_samples_strip`` pixels with an
    axis-decorrelated key; the L1 normalizer is the psum'd total weight, so
    sum-over-strips of sum(|pred-tgt|*w)/(denom*3) matches the full-image
    form in expectation (the sampled SETS differ from whole-image sampling,
    which is statistically equivalent stratification, not a numerics change).
    """
    n = to_camera_normal(g_s["normal"], cam_R)
    cos_v = camera_view_cosines(g_s["position"], n, cam_R, cam_center)
    valid = (
        (view_mask_s[..., 0] > 0) & (g_s["mask"][..., 0] > 0) & (cos_v <= 0)
    )
    hs, W = valid.shape
    ns = min(num_samples_strip, hs * W)
    flat_valid = valid.reshape(-1)
    u = jax.random.uniform(jax.random.fold_in(rng, k), (hs * W,))
    score = jnp.where(flat_valid & (u < shading_percentage), u, -1.0)
    top, idx = jax.lax.top_k(score, ns)
    weight = (top > 0).astype(jnp.float32)
    denom = jnp.maximum(_axis_sum(jnp.sum(weight)), 1.0)

    pos = g_s["position"].reshape(-1, 3)[idx]
    nrm = g_s["normal"].reshape(-1, 3)[idx]
    rgb = view_rgb_s.reshape(-1, 3)[idx]
    vd = cam_center - pos
    vd = vd / jnp.maximum(jnp.linalg.norm(vd, axis=-1, keepdims=True), 1e-8)
    return StripShading(pos, nrm, vd, rgb, weight, denom)

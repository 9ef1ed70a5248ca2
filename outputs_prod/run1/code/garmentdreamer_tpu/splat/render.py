"""High-level splat render: GaussianState + camera -> image dict.

TPU equivalent of the reference wrapper
(reference: gaussiansplatting/gaussian_renderer/__init__.py:18-103): assembles
rasterizer inputs from the state's activated parameters, supports the
"screenspace points" trick for densification gradient stats, and returns the
same logical outputs (render / alpha / depth / radii / viewspace grads).

Batched over views with ``jax.vmap`` -- the reference loops over the 4 SDS
cameras in Python (GaussianDreamer.py:189-207); here one jitted call renders
the whole batch, and the view axis is the natural ``shard_map`` axis for
multi-chip data parallelism.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from garmentdreamer_tpu.splat.project import Projected, project_gaussians
from garmentdreamer_tpu.splat.rasterize import (
    _expand_classes,
    image_to_tiles,
    packed_backward_cols,
    packed_forward_parts,
    rasterize_hybrid,
    rasterize_tiled,
    tiles_to_image,
)
from garmentdreamer_tpu.splat.state import GaussianState

__all__ = [
    "render_view",
    "render_batch",
    "render_batch_packed_fwd",
    "render_batch_packed_bwd",
    "CameraArrays",
]


def _camera_tuple(cam_arrays: Dict[str, jnp.ndarray]):
    return (
        cam_arrays["world_view"],
        cam_arrays["full_proj"],
        cam_arrays["camera_center"],
        cam_arrays["tanfov"],
    )


def render_view(
    state: GaussianState,
    cam: Dict[str, jnp.ndarray],
    bg: jnp.ndarray,
    height: int,
    width: int,
    screen_offset: Optional[jnp.ndarray] = None,
    scaling_modifier: float = 1.0,
    max_tiles_per_gaussian: int = 32,
    max_per_tile: int = 512,
    fast: bool = False,
    big_budget: int = 0,
    big_tiles: int = 64,
    payload_dtype: str = "f32",
    classes: Optional[Tuple[Tuple[int, Optional[int]], ...]] = None,
    backward: str = "xla",
) -> Dict[str, jnp.ndarray]:
    """Render one view.

    ``screen_offset`` (C,2), if given, is added to the projected pixel means --
    pass zeros and take ``jax.grad`` w.r.t. it to recover dL/d(mean2D) for
    densification stats (the reference's retain_grad screenspace_points,
    gaussian_renderer/__init__.py:25-33).

    ``fast=True`` routes through :func:`rasterize_hybrid`: the Pallas tile
    compositor on the forward pass (the hot CUDA kernel's analog), the XLA
    tile path for gradients. Requires ``max_per_tile`` to be a multiple of
    128. Use for render_ring/bench/eval and any loop that tolerates depth-tie
    reordering (see rasterize_tiled_fast docstring).
    """
    world_view, full_proj, camera_center, tanfov = _camera_tuple(cam)
    proj = project_gaussians(
        xyz=state.params.xyz,
        scaling=state.get_scaling(),
        rotation_q=state.params.rotation,
        opacity=state.get_opacity(),
        shs=state.get_features(),
        sh_degree=state.active_sh_degree,
        world_view=world_view,
        full_proj=full_proj,
        camera_center=camera_center,
        tanfovx=tanfov[0],
        tanfovy=tanfov[1],
        height=height,
        width=width,
        scaling_modifier=scaling_modifier,
        lim_xy=cam.get("lim_xy"),
    )
    if screen_offset is not None:
        proj = proj._replace(means2d=proj.means2d + screen_offset)

    if fast and backward == "pallas":
        # fully-Pallas differentiable pair (packed payloads required)
        from garmentdreamer_tpu.splat.rasterize import rasterize_packed_diff

        color, alpha, depth, n_dropped = rasterize_packed_diff(
            proj, height, width, bg,
            classes=classes or ((4, None), (16, 16384), (64, 1024)),
            max_per_tile=max_per_tile,
        )
        n_harmful = jnp.zeros((), jnp.int32)
    elif fast:
        color, alpha, depth, n_dropped = rasterize_hybrid(
            proj, height, width, bg, max_tiles_per_gaussian, max_per_tile,
            big_budget, big_tiles, payload_dtype, classes,
        )
        # the Pallas forward chains windows: no depth cap, no harmful pixels
        n_harmful = jnp.zeros((), jnp.int32)
    else:
        color, alpha, depth, n_dropped, n_harmful = rasterize_tiled(
            proj,
            height,
            width,
            bg,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            max_per_tile=max_per_tile,
            big_budget=big_budget,
            big_tiles=big_tiles,
        )
    return {
        "render": color,  # (H, W, 3)
        "alpha": alpha,  # (H, W)
        "depth": depth,  # (H, W)
        "radii": proj.radii,  # (C,)
        "means2d": proj.means2d,
        "n_dropped": n_dropped,  # instances lost to expansion caps
        "n_harmful_px": n_harmful,  # pixels visibly truncated by the depth cap
    }


def render_batch(
    state: GaussianState,
    cams: Dict[str, jnp.ndarray],  # each leaf has a leading view axis (B, ...)
    bg: jnp.ndarray,
    height: int,
    width: int,
    screen_offsets: Optional[jnp.ndarray] = None,  # (B, C, 2)
    **kw,
) -> Dict[str, jnp.ndarray]:
    """vmap of :func:`render_view` over the view batch."""
    if screen_offsets is None:
        fn = lambda c: render_view(state, c, bg, height, width, **kw)
        return jax.vmap(fn)(cams)
    fn = lambda c, so: render_view(state, c, bg, height, width, screen_offset=so, **kw)
    return jax.vmap(fn)(cams, screen_offsets)


def _project_cols(state, cam, height, width, classes, screen_offset=None):
    """Projection + multi-class expansion -> (cols tuple, tile_flat, aux).
    Deterministic in (params, cam): the split training step recomputes it in
    the backward program instead of shipping it across the boundary."""
    world_view, full_proj, camera_center, tanfov = _camera_tuple(cam)
    proj = project_gaussians(
        xyz=state.params.xyz,
        scaling=state.get_scaling(),
        rotation_q=state.params.rotation,
        opacity=state.get_opacity(),
        shs=state.get_features(),
        sh_degree=state.active_sh_degree,
        world_view=world_view,
        full_proj=full_proj,
        camera_center=camera_center,
        tanfovx=tanfov[0],
        tanfovy=tanfov[1],
        height=height,
        width=width,
        lim_xy=cam.get("lim_xy"),
    )
    if screen_offset is not None:
        proj = proj._replace(means2d=proj.means2d + screen_offset)
    tile_flat, cols, n_dropped = _expand_classes(proj, height, width, classes)
    return cols, tile_flat, (proj.radii, n_dropped)


def render_batch_packed_fwd(
    state: GaussianState,
    cams: Dict[str, jnp.ndarray],
    bg: jnp.ndarray,
    height: int,
    width: int,
    classes: Tuple[Tuple[int, Optional[int]], ...],
    max_per_tile: int = 512,
) -> Dict[str, jnp.ndarray]:
    """Packed Pallas forward over the view batch, returning images PLUS the
    Pallas-backward residuals (sorted instance rows / carried index / tile
    starts). The stage-1 step runs this as its render program and feeds the
    residuals into :func:`render_batch_packed_bwd` -- no re-render in the
    VJP (the round-2 XLA backward re-rendered at 2x forward cost + a depth
    cap; the CUDA pair forward.cu/backward.cu shares state the same way)."""

    def one(cam):
        cols, tile_flat, (radii, n_dropped) = _project_cols(
            state, cam, height, width, classes
        )
        out, rows5, idx_sorted, starts = packed_forward_parts(
            tile_flat, cols, bg, height, width, max_per_tile
        )
        rgb, alpha, depth = tiles_to_image(out, height, width)
        return {
            "render": rgb,
            "alpha": alpha,
            "depth": depth,
            "radii": radii,
            "n_dropped": n_dropped,
            "residuals": {
                "rows5": rows5,
                "idx_sorted": idx_sorted,
                "starts": starts,
            },
        }

    return jax.vmap(one)(cams)


def render_batch_packed_bwd(
    state: GaussianState,
    cams: Dict[str, jnp.ndarray],
    bg: jnp.ndarray,
    height: int,
    width: int,
    classes: Tuple[Tuple[int, Optional[int]], ...],
    residuals: Dict[str, jnp.ndarray],  # leaves with leading (B,) axis
    ct_rgb: jnp.ndarray,  # (B, H, W, 3)
    ct_depth: jnp.ndarray,  # (B, H, W)
    screen_offsets: Optional[jnp.ndarray] = None,  # (B, C, 2)
    ct_alpha: Optional[jnp.ndarray] = None,  # (B, H, W)
):
    """Backward of :func:`render_batch_packed_fwd` under the given image
    cotangents -> (param grads summed over views, screen-offset grads
    (B, C, 2), radii (B, C), n_dropped scalar).

    The Pallas gradient kernel consumes the forward's residuals; the cheap
    projection + expansion recompute (per-gaussian math) provides the VJP
    back to parameters via jax.vjp."""
    B = ct_rgb.shape[0]
    if screen_offsets is None:
        screen_offsets = jnp.zeros((B, state.capacity, 2), jnp.float32)
    if ct_alpha is None:
        ct_alpha = jnp.zeros_like(ct_depth)

    def one(cam, res, ctr, cta, ctd, so):
        def fwd_cols(params, so_):
            cols, _tf, aux = _project_cols(
                state.replace(params=params), cam, height, width, classes,
                screen_offset=so_,
            )
            return cols, aux

        cols, vjp, (radii, n_dropped) = jax.vjp(
            fwd_cols, state.params, so, has_aux=True
        )
        ct_tiles = image_to_tiles(ctr, cta, ctd, height, width)
        ct_cols = packed_backward_cols(
            res["rows5"], res["idx_sorted"], res["starts"], ct_tiles, bg,
            height, width,
        )
        d_params, d_so = vjp(ct_cols)
        return d_params, d_so, radii, n_dropped

    d_params, d_so, radii, nd = jax.vmap(one)(
        cams, residuals, ct_rgb, ct_alpha, ct_depth, screen_offsets
    )
    d_params_sum = jax.tree.map(lambda x: jnp.sum(x, axis=0), d_params)
    return d_params_sum, d_so, radii, jnp.sum(nd)

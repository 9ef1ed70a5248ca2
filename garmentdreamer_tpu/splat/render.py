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
from garmentdreamer_tpu.splat.rasterize import rasterize_hybrid, rasterize_tiled
from garmentdreamer_tpu.splat.state import GaussianState

__all__ = ["render_view", "render_batch", "CameraArrays"]


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
    )
    if screen_offset is not None:
        proj = proj._replace(means2d=proj.means2d + screen_offset)

    if fast:
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

"""G-buffer mesh rendering: mask / position / normal channels with analytic
antialiasing, plus vertex visibility -- the stage-3 renderer.

Mirrors the reference ``deformer/core/renderer.py``:

* ``render_gbuffer`` == Renderer.render (:128-164): rasterize once, then
  antialiased mask (clamped coverage), interpolated world positions and
  vertex normals;
* ``vertex_visibility`` == Renderer.get_vert_visibility (:104-126): faces
  hit by any view's rasterization mark their vertices visible. The reference
  rasterizes at 8x resolution (8192^2!) to catch sub-pixel faces; on TPU we
  default to ``upsample=2`` which catches all faces down to 1/4 pixel area --
  the effect of a missed tiny face is one vertex skipping one optimization
  step, so the cheaper setting is a sound trade (knob kept for parity);
* ``set_near_far`` == Renderer.set_near_far (:21-34) over the scene AABB.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .project import gl_mvp, transform_clip
from .rasterize import Rasterized, antialias, barycentrics, interpolate, rasterize

__all__ = [
    "render_gbuffer", "vertex_visibility", "visibility_from_face_ids",
    "near_far_from_aabb",
]


def near_far_from_aabb(
    cam_R: np.ndarray, cam_t: np.ndarray, K: np.ndarray, corners: np.ndarray,
    epsilon: float = 0.1,
) -> Tuple[float, float]:
    """Near/far from the distance range of AABB corners to the camera
    (renderer.py:21-34 with depth_as_distance=True)."""
    pc = corners @ np.asarray(cam_R).T + np.asarray(cam_t)
    d = np.linalg.norm(pc, axis=-1)
    near, far = float(d.min()), float(d.max())
    return near - near * epsilon, far + far * epsilon


@partial(jax.jit, static_argnames=("height", "width", "max_tiles_per_tri", "max_per_tile", "with_antialiasing"))
def render_gbuffer(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    vert_normals: jnp.ndarray,
    mvp: jnp.ndarray,
    height: int,
    width: int,
    max_tiles_per_tri: int = 32,
    max_per_tile: int = 512,
    with_antialiasing: bool = True,
) -> Dict[str, jnp.ndarray]:
    """One view -> {mask (H,W,1), position (H,W,3), normal (H,W,3)}.
    Differentiable w.r.t. ``verts`` / ``vert_normals``."""
    clip = transform_clip(verts, mvp)
    rast = rasterize(clip, faces, height, width, max_tiles_per_tri, max_per_tile)
    fid = rast.face_id
    bary = barycentrics(clip, faces, fid, height, width)

    mask = (fid >= 0).astype(verts.dtype)[..., None]
    position = interpolate(verts, faces, fid, bary)
    normal = interpolate(vert_normals, faces, fid, bary)
    if with_antialiasing:
        mask = antialias(mask, clip, faces, fid, height, width)
        position = antialias(position, clip, faces, fid, height, width)
        normal = antialias(normal, clip, faces, fid, height, width)
    return {
        "mask": jnp.clip(mask, 0.0, 1.0),
        "position": position,
        "normal": normal,
        "face_id": fid,
        "n_dropped": rast.n_dropped,
    }


@partial(jax.jit, static_argnames=("height", "width", "num_vertices", "upsample", "max_tiles_per_tri", "max_per_tile"))
def vertex_visibility(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    mvps: jnp.ndarray,  # (B, 4, 4) stacked view MVPs
    height: int,
    width: int,
    num_vertices: int,
    upsample: int = 2,
    max_tiles_per_tri: int = 32,
    max_per_tile: int = 512,
) -> jnp.ndarray:
    """(V,) bool -- vertices of any face hit in any view (renderer.py:104-126)."""
    H, W = height * upsample, width * upsample

    F = faces.shape[0]

    def one_view(mvp):
        clip = transform_clip(verts, mvp)
        rast = rasterize(clip, faces, H, W, max_tiles_per_tri, max_per_tile)
        return _face_hit_from_ids(rast.face_id, F)

    face_hit = jnp.any(jax.vmap(one_view)(mvps), axis=0)
    return _vertex_vis_from_face_hit(face_hit, faces, num_vertices)


def _face_hit_from_ids(face_id: jnp.ndarray, F: int) -> jnp.ndarray:
    """(..., ) pixel face ids (−1 = miss) -> (F,) bool faces owning a pixel.

    "Which faces own a pixel" via sort instead of a megapixel scatter: a
    HxW .at[fid].set lowers to a per-row scalar scatter (~50 ms/M rows on
    v5e) while two u32 sorts cost ~5 ms/M. Sort the ids, keep
    first-occurrence boundaries, push non-boundaries to the dump id F by a
    second sort, then scatter only the first F+1 rows (every distinct id is
    a boundary, so they all land there)."""
    fid = jnp.where(face_id >= 0, face_id, F).reshape(-1)
    ids_sorted = jnp.sort(fid)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), ids_sorted[1:] != ids_sorted[:-1]]
    )
    distinct = jnp.sort(jnp.where(boundary, ids_sorted, F))[: F + 1]
    face_hit = jnp.zeros((F + 1,), jnp.bool_).at[distinct].set(True)
    return face_hit[:-1]


def _vertex_vis_from_face_hit(
    face_hit: jnp.ndarray, faces: jnp.ndarray, num_vertices: int
) -> jnp.ndarray:
    vis = jnp.zeros((num_vertices,), jnp.bool_)
    for k in range(3):
        vis = vis.at[faces[:, k]].max(face_hit)
    return vis


def visibility_from_face_ids(
    face_id: jnp.ndarray, faces: jnp.ndarray, num_vertices: int
) -> jnp.ndarray:
    """(V,) bool from an ALREADY-RENDERED face-id buffer (one or more views).

    A G-buffer pass over the same vertices at the same view already names
    every visible face, so callers that just rasterized (the stage-2
    deformer step renders a 1024^2 G-buffer for its losses every iteration)
    get visibility for two sorts + one small scatter instead of a second,
    supersampled rasterization (reference recomputes visibility with a
    full 8x-resolution re-render per iteration, renderer.py:104-126 /
    deformation.py:277-283). Resolution is the G-buffer's own: faces whose
    coverage rounds to zero pixels there are treated as hidden — their
    loss gradient through that same buffer is zero anyway, so masking
    their vertices' update matches what the supersampled pass would have
    optimized."""
    return _vertex_vis_from_face_hit(
        _face_hit_from_ids(face_id, int(faces.shape[0])), faces, num_vertices
    )

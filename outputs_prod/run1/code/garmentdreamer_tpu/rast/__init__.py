"""Differentiable triangle rasterization (nvdiffrast replacement, component
N6 of SURVEY.md section 2.1): tile-binned z-buffer kernel, perspective-correct
interpolation, analytic silhouette antialiasing, G-buffer rendering, vertex
visibility."""

from .gbuffer import (
    near_far_from_aabb, render_gbuffer, vertex_visibility,
    visibility_from_face_ids,
)
from .project import gl_mvp, gl_projection, opencv_camera_center, transform_clip
from .rasterize import (
    TILE,
    Rasterized,
    antialias,
    barycentrics,
    interpolate,
    rasterize,
    screen_xy,
)
from .rasterize_ref import rasterize_brute

__all__ = [
    "TILE",
    "Rasterized",
    "antialias",
    "barycentrics",
    "interpolate",
    "rasterize",
    "rasterize_brute",
    "screen_xy",
    "gl_mvp",
    "gl_projection",
    "transform_clip",
    "opencv_camera_center",
    "render_gbuffer",
    "vertex_visibility",
    "visibility_from_face_ids",
    "near_far_from_aabb",
]

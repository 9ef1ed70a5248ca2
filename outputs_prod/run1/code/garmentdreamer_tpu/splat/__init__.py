"""Gaussian splatting subsystem: state, projection, tile rasterizer, densification."""

from garmentdreamer_tpu.splat.state import (
    GaussianParams,
    GaussianState,
    GaussianStats,
    create_from_pcd,
)
from garmentdreamer_tpu.splat.project import Projected, project_gaussians
from garmentdreamer_tpu.splat.rasterize import rasterize_tiled
from garmentdreamer_tpu.splat.rasterize_ref import rasterize_brute
from garmentdreamer_tpu.splat.render import render_batch, render_view

__all__ = [
    "GaussianParams",
    "GaussianState",
    "GaussianStats",
    "create_from_pcd",
    "Projected",
    "project_gaussians",
    "rasterize_tiled",
    "rasterize_brute",
    "render_batch",
    "render_view",
]

"""Template mesh -> initial Gaussian point cloud (surface samples + volume stuffing).

Reproduces the reference's initialization pipeline (reference:
threestudio/systems/GaussianDreamer.py:115-177):

* sample 50k points uniformly (area-weighted) on the template surface, then
  permute axes (x,y,z) -> (z,x,y) (``template()``, GaussianDreamer.py:149-163);
* random near-black colors ``SH2RGB(rand/255)`` (GaussianDreamer.py:156-157);
* "volume stuffing": N uniform candidates in the AABB kept when within
  ``deviation`` (0.01) of a template point, colored like their nearest surface
  point + 0.2*rand (``add_points``, GaussianDreamer.py:115-144);
* scale everything by ``bound = radius * scale`` (``pcb()``, :165-177).

All host-side numpy/scipy (one-time setup, SURVEY.md section 7 keeps this off-device).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from garmentdreamer_tpu.core.io import ObjMesh, load_obj
from garmentdreamer_tpu.splat.sh import C0

__all__ = ["sample_mesh_surface", "stuff_volume", "template_point_cloud"]


def sample_mesh_surface(
    vertices: np.ndarray, faces: np.ndarray, n: int, seed: int = 0
) -> np.ndarray:
    """Area-weighted uniform surface sampling (the open3d
    sample_points_uniformly equivalent)."""
    rng = np.random.default_rng(seed)
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    total = areas.sum()
    if total <= 0:
        raise ValueError("degenerate mesh: zero surface area")
    probs = areas / total
    tri = rng.choice(len(f), size=n, p=probs)
    # uniform barycentric via sqrt trick
    r1 = np.sqrt(rng.uniform(size=(n, 1)))
    r2 = rng.uniform(size=(n, 1))
    pts = (1 - r1) * a[tri] + r1 * (1 - r2) * b[tri] + r1 * r2 * c[tri]
    return pts.astype(np.float32)


def stuff_volume(
    coords: np.ndarray,
    rgb: np.ndarray,
    num_candidates: int,
    deviation: float = 0.01,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform AABB candidates kept when within ``deviation`` of the surface
    cloud; inherited color + 0.2*U(0,1) jitter. Returns (all_coords, all_rgb)
    with the surface points appended last (reference order,
    GaussianDreamer.py:140-144)."""
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(seed)
    lo, hi = coords.min(axis=0), coords.max(axis=0)
    cand = rng.uniform(lo, hi, size=(num_candidates, 3)).astype(np.float32)
    tree = cKDTree(coords)
    dist, idx = tree.query(cand, k=1, workers=-1)
    keep = dist < deviation
    inside = cand[keep]
    inside_rgb = rgb[idx[keep]] + 0.2 * rng.random((keep.sum(), 3))
    all_coords = np.concatenate([inside, coords], axis=0)
    all_rgb = np.concatenate([inside_rgb, rgb], axis=0).astype(np.float32)
    return all_coords.astype(np.float32), all_rgb


def template_point_cloud(
    template_path: str,
    bound: float,
    num_surface: int = 50_000,
    num_pts_space: int = 1_000_000,
    deviation: float = 0.01,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full init cloud: (points*bound, colors)."""
    mesh = load_obj(template_path)
    pts = sample_mesh_surface(mesh.vertices, mesh.faces, num_surface, seed=seed)
    # axis permute: new (x,y,z) = (z, x, y) (GaussianDreamer.py:157-160)
    pts = np.stack([pts[:, 2], pts[:, 0], pts[:, 1]], axis=1)
    rng = np.random.default_rng(seed)
    shs = rng.random((num_surface, 3)) / 255.0
    rgb = (shs * C0 + 0.5).astype(np.float32)  # SH2RGB of tiny noise ~= 0.5 grey
    coords, colors = stuff_volume(pts, rgb, num_pts_space, deviation, seed=seed)
    return coords * bound, colors

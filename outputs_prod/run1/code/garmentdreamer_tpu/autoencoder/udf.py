"""UDF dataset utilities + UDF -> mesh extraction.

Reference: AutoEncoder_dgcnn/encdec/preprocess_udf.py (sample 100k surface
points per mesh; query points = surface + gaussian noise and uniform cube
samples; gt udf clamped to ``max_dist``=0.1 in the unit cube; gt gradient =
normalized direction to the closest surface point) and
meshudf/meshudf.py:23-307 (grid evaluation + gradient-pseudo-sign marching
cubes + large-udf face filtering).

Closest-point queries run through the native geometry library
(gd_closest_points); extraction through gd_marching_cubes_udf.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

__all__ = ["sample_surface_points", "make_udf_training_sample", "get_mesh_from_udf"]


def sample_surface_points(
    verts: np.ndarray, faces: np.ndarray, n: int, rs: np.random.RandomState
) -> np.ndarray:
    """Area-weighted surface sampling (open3d sample_points_uniformly role)."""
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    p = areas / max(areas.sum(), 1e-20)
    fi = rs.choice(len(faces), n, p=p)
    u = rs.rand(n, 1)
    v = rs.rand(n, 1)
    su = np.sqrt(u)
    w0, w1, w2 = 1 - su, su * (1 - v), su * v
    return (w0 * v0[fi] + w1 * v1[fi] + w2 * v2[fi]).astype(np.float32)


def make_udf_training_sample(
    verts: np.ndarray,
    faces: np.ndarray,
    num_points_pcd: int = 10000,
    num_queries: int = 20000,
    max_dist: float = 0.1,
    noise_sigma: float = 0.05,
    uniform_frac: float = 0.25,
    seed: int = 0,
):
    """One training example: (pcd (P,3), coords (Q,3), gt_udf (Q,) in [0,1],
    gt_grad (Q,3)). gt_udf is normalized to [0,1] as 1 - udf/max_dist
    (the BCE target convention: trainers/encdec.py:151-156 with
    udf = (1 - sigmoid(pred)) * max_dist)."""
    from garmentdreamer_tpu.native import geometry as ng

    rs = np.random.RandomState(seed)
    pcd = sample_surface_points(verts, faces, num_points_pcd, rs)

    n_near = int(num_queries * (1 - uniform_frac))
    near = sample_surface_points(verts, faces, n_near, rs)
    near = near + rs.randn(n_near, 3).astype(np.float32) * noise_sigma
    uni = rs.uniform(-1, 1, (num_queries - n_near, 3)).astype(np.float32)
    coords = np.concatenate([near, uni], axis=0)

    dist, cp = ng.closest_points(
        verts.astype(np.float64), faces, coords.astype(np.float64)
    )
    udf = np.minimum(dist, max_dist).astype(np.float32)
    # gradient of udf wrt coords: unit vector away from the surface; zero at
    # clamp and on the surface
    delta = coords - cp.astype(np.float32)
    norm = np.linalg.norm(delta, axis=1, keepdims=True)
    grad = np.where(norm > 1e-9, delta / np.maximum(norm, 1e-9), 0.0)
    grad = np.where((dist >= max_dist)[:, None], 0.0, grad).astype(np.float32)

    gt_udf01 = 1.0 - udf / max_dist  # in [0,1], 1 on the surface
    return pcd, coords, gt_udf01, grad


def get_mesh_from_udf(
    udf_func: Callable[[np.ndarray], np.ndarray],
    coords_range: Tuple[float, float] = (-1.0, 1.0),
    max_dist: float = 0.1,
    N: int = 128,
    max_batch: int = 1 << 16,
) -> Tuple[np.ndarray, np.ndarray]:
    """UDF network -> triangle mesh (meshudf get_mesh_from_udf :307-420).

    ``udf_func`` maps (M,3) float32 coords to (M,) udf values. Gradients are
    taken by central differences on the grid (the reference uses autograd;
    grid differences are equivalent at grid resolution and keep the extractor
    model-agnostic).
    """
    from garmentdreamer_tpu.native import geometry as ng

    lo, hi = coords_range
    xs = np.linspace(lo, hi, N, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    coords = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    udf = np.empty(coords.shape[0], np.float32)
    for s in range(0, coords.shape[0], max_batch):
        udf[s : s + max_batch] = np.asarray(udf_func(coords[s : s + max_batch]))
    grid = udf.reshape(N, N, N)

    # central-difference negative gradient, normalized (sample_grads :52-72)
    g = np.zeros((N, N, N, 3), np.float32)
    g[1:-1, :, :, 0] = grid[2:] - grid[:-2]
    g[:, 1:-1, :, 1] = grid[:, 2:] - grid[:, :-2]
    g[:, :, 1:-1, 2] = grid[:, :, 2:] - grid[:, :, :-2]
    norm = np.linalg.norm(g, axis=-1, keepdims=True)
    g = -g / np.maximum(norm, 1e-9)

    v, f = ng.marching_cubes_udf(grid, g)
    if len(f) == 0:
        return v.astype(np.float32), f
    # index coords -> world
    v = v / (N - 1) * (hi - lo) + lo

    # drop faces whose edge midpoints have large udf (meshudf :357-379)
    mids = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3.0
    mud = np.empty(len(mids), np.float32)
    for s in range(0, len(mids), max_batch):
        mud[s : s + max_batch] = np.asarray(udf_func(mids[s : s + max_batch].astype(np.float32)))
    keep = mud <= (hi - lo) / N
    f = f[keep]
    used = np.unique(f)
    remap = np.full(len(v), -1, np.int64)
    remap[used] = np.arange(len(used))
    return v[used].astype(np.float32), remap[f].astype(np.int32)

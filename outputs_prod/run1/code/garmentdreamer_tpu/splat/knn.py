"""Mean squared distance to the 3 nearest neighbors, for Gaussian scale init.

Replacement for the ``simple-knn`` CUDA extension (reference:
submodules/simple-knn/simple_knn.cu:45-221, bound as ``simple_knn._C.distCUDA2``
and consumed at gaussian_model.py:134-135).

Scale init runs ONCE per pipeline launch (not in the training hot loop), so the
large-N path is an exact host-side cKDTree -- same architectural choice the
SURVEY.md section 7 plan makes for the reference's o3d KDTree stuffing. The exact
chunked brute-force path below is jit-compatible for on-device use and for
testing (dense (Q,N) distance blocks, MXU-friendly, full f32).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mean_dist2_knn3", "mean_dist2_knn3_brute", "mean_dist2_knn3_host"]


@partial(jax.jit, static_argnames=("chunk",))
def mean_dist2_knn3_brute(points: jnp.ndarray, chunk: int = 2048) -> jnp.ndarray:
    """Exact on-device KNN: (N,3) -> (N,) mean squared distance to the 3 NN."""
    points = points.astype(jnp.float32)
    n = points.shape[0]
    pad = (-n) % chunk
    padded = jnp.pad(points, ((0, pad), (0, 0)))
    sq = jnp.sum(points * points, axis=-1)  # (N,)

    def body(q):  # q: (chunk, 3)
        qsq = jnp.sum(q * q, axis=-1, keepdims=True)
        # full f32 matmul: TPU bf16 default loses ~3 decimal digits on |x|^2-2xy
        d2 = qsq + sq[None, :] - 2.0 * jnp.matmul(
            q, points.T, precision=jax.lax.Precision.HIGHEST
        )
        d2 = jnp.maximum(d2, 0.0)
        # mask the self match (row minimum; exact duplicates mask together)
        self_min = jnp.min(d2, axis=-1, keepdims=True)
        d2 = jnp.where(d2 <= self_min, jnp.inf, d2)
        neg_top3, _ = jax.lax.top_k(-d2, 3)
        return jnp.mean(-neg_top3, axis=-1)

    out = jax.lax.map(body, padded.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]


def mean_dist2_knn3_host(points: np.ndarray) -> np.ndarray:
    """Exact host-side KNN via scipy cKDTree (handles millions of points)."""
    from scipy.spatial import cKDTree

    pts = np.asarray(points, np.float64)
    tree = cKDTree(pts)
    # k=4: the first neighbor is the point itself at distance 0
    d, _ = tree.query(pts, k=4, workers=-1)
    return np.mean(d[:, 1:] ** 2, axis=1).astype(np.float32)


def mean_dist2_knn3(points) -> jnp.ndarray:
    """Dispatch: on-device exact brute force below 20k points, host KDTree above."""
    n = points.shape[0]
    if n <= 20_000:
        return mean_dist2_knn3_brute(jnp.asarray(points))
    return jnp.asarray(mean_dist2_knn3_host(np.asarray(points)))

"""Camera / clip-space transforms for the triangle rasterizer (stage 3/4).

Mirrors the reference's nvdiffrast camera setup exactly
(reference: deformer/core/renderer.py:36-78):

* GL projection from an OpenCV K with the principal point inverted
  (``1 - 2*cx/W``; the comment at renderer.py:48-50 notes nvdiffrast's
  bottom-up memory order -- the cy flip makes row 0 the image top, matching
  the PNG-loaded target masks);
* world->eye is [R|t] premultiplied by diag(1,1,-1,1) (renderer.py:72-77);
* vertices are transformed as row vectors times M^T (renderer.py:36-42).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["gl_projection", "gl_mvp", "transform_clip", "opencv_camera_center"]


def gl_projection(
    fx: float, fy: float, cx: float, cy: float,
    n: float, f: float, width: int, height: int,
) -> np.ndarray:
    """GL projection matrix from OpenCV intrinsics (renderer.py:44-54)."""
    return np.array(
        [
            [2.0 * fx / width, 0, 1.0 - 2.0 * cx / width, 0],
            [0, 2.0 * fy / height, 1.0 - 2.0 * cy / height, 0],
            [0, 0, -(f + n) / (f - n), -(2 * f * n) / (f - n)],
            [0, 0, -1.0, 0.0],
        ],
        dtype=np.float32,
    )


def gl_mvp(K: np.ndarray, R: np.ndarray, t: np.ndarray,
           height: int, width: int, n: float, f: float) -> np.ndarray:
    """Full model-view-projection for an OpenCV camera (renderer.py:56-78)."""
    Rt = np.eye(4, dtype=np.float32)
    Rt[:3, :3] = R
    Rt[:3, 3] = t
    gl = np.diag([1.0, 1.0, -1.0, 1.0]).astype(np.float32)
    P = gl_projection(K[0, 0], K[1, 1], K[0, 2], K[1, 2], n, f, width, height)
    return (P @ gl @ Rt).astype(np.float32)


def transform_clip(verts: jnp.ndarray, mvp: jnp.ndarray) -> jnp.ndarray:
    """(V,3) world-space vertices -> (V,4) clip space (renderer.py:36-42)."""
    vw = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], axis=1)
    return vw @ mvp.T


def opencv_camera_center(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Camera center -R^T t (deformer/core/camera.py:26-28)."""
    return -(np.asarray(R).T @ np.asarray(t))

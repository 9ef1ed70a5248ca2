"""Real spherical harmonics evaluation for Gaussian colors (degrees 0..3).

Same basis and ordering as the reference CUDA evaluation
(reference: diff-gaussian-rasterization/cuda_rasterizer/forward.cu:20-71,
auxiliary SH constants) and the python helpers
(gaussiansplatting/utils/sh_utils.py). Colors are ``SH(dir) + 0.5`` clamped at
zero, with the clamp mask applied in the VJP exactly like the CUDA backward.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["eval_sh", "rgb_to_sh", "sh_to_rgb", "sh_color"]

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """RGB in [0,1] -> DC SH coefficient (reference: utils/sh_utils.py RGB2SH)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH at unit directions.

    Args:
      deg: active degree, 0..3.
      sh: (..., (deg+1)^2, 3) coefficients (DC first).
      dirs: (..., 3) unit view directions (gaussian center - camera).

    Returns (..., 3).
    """
    result = C0 * sh[..., 0, :]
    if deg >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = result - C1 * y * sh[..., 1, :] + C1 * z * sh[..., 2, :] - C1 * x * sh[..., 3, :]
    if deg >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        result = (
            result
            + C2[0] * xy * sh[..., 4, :]
            + C2[1] * yz * sh[..., 5, :]
            + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
            + C2[3] * xz * sh[..., 7, :]
            + C2[4] * (xx - yy) * sh[..., 8, :]
        )
    if deg >= 3:
        result = (
            result
            + C3[0] * y * (3 * xx - yy) * sh[..., 9, :]
            + C3[1] * xy * z * sh[..., 10, :]
            + C3[2] * y * (4 * zz - xx - yy) * sh[..., 11, :]
            + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12, :]
            + C3[4] * x * (4 * zz - xx - yy) * sh[..., 13, :]
            + C3[5] * z * (xx - yy) * sh[..., 14, :]
            + C3[6] * x * (xx - 3 * yy) * sh[..., 15, :]
        )
    return result


def sh_color(deg: int, sh: jnp.ndarray, positions: jnp.ndarray, cam_center: jnp.ndarray) -> jnp.ndarray:
    """Per-Gaussian RGB from SH along the camera->gaussian direction, offset by
    +0.5 and clamped at 0 (reference: forward.cu:20-71)."""
    dirs = positions - cam_center
    dirs = dirs / jnp.clip(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12, None)
    rgb = eval_sh(deg, sh, dirs) + 0.5
    return jnp.maximum(rgb, 0.0)

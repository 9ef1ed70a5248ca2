"""Per-Gaussian projection preprocess: 3D covariance, EWA 2D splatting, SH color.

TPU-native equivalent of ``FORWARD::preprocess``
(reference: diff-gaussian-rasterization/cuda_rasterizer/forward.cu:74-256).
Everything is batched dense math over the fixed-capacity cloud -- no per-thread
culling; culled/inactive Gaussians simply get radius 0 and opacity 0, which the
binning stage treats as "touches no tiles". Fully differentiable by JAX AD (the
reference needed 700 lines of handwritten CUDA backward; see backward.cu).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from garmentdreamer_tpu.splat.sh import sh_color

__all__ = ["Projected", "build_rotation", "build_cov3d", "project_gaussians"]


class Projected(NamedTuple):
    """Screen-space Gaussian attributes, all (C, ...) over the fixed capacity."""

    means2d: jnp.ndarray  # (C, 2) pixel coordinates
    depths: jnp.ndarray  # (C,) view-space z
    radii: jnp.ndarray  # (C,) int32 pixel radius (0 = culled)
    conics: jnp.ndarray  # (C, 3) inverse 2D covariance (a, b, c)
    colors: jnp.ndarray  # (C, 3) RGB from SH
    opacities: jnp.ndarray  # (C,) activated opacity (0 for culled/inactive)


def build_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized quaternion (w,x,y,z) -> rotation matrix (...,3,3)
    (reference: utils/general_utils.py build_rotation)."""
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def build_cov3d(scaling: jnp.ndarray, rotation_q: jnp.ndarray, modifier: float = 1.0) -> jnp.ndarray:
    """Sigma = R S S^T R^T from activated scales + quaternions -> (...,3,3)
    (reference: forward.cu:118-152 computeCov3D)."""
    R = build_rotation(rotation_q)
    S = modifier * scaling  # (...,3) already activated (exp)
    M = R * S[..., None, :]  # R @ diag(S)
    return M @ jnp.swapaxes(M, -1, -2)


def project_gaussians(
    xyz: jnp.ndarray,
    scaling: jnp.ndarray,
    rotation_q: jnp.ndarray,
    opacity: jnp.ndarray,
    shs: jnp.ndarray,
    sh_degree: int,
    world_view: jnp.ndarray,
    full_proj: jnp.ndarray,
    camera_center: jnp.ndarray,
    tanfovx: float,
    tanfovy: float,
    height: int,
    width: int,
    scaling_modifier: float = 1.0,
) -> Projected:
    """EWA projection of the full cloud for one camera.

    Matches forward.cu:74-256: perspective Jacobian with the 1.3*tanfov frustum
    clamp, +0.3 low-pass on the 2D covariance diagonal, 3-sigma pixel radius from
    the larger eigenvalue, near-plane cull at view z <= 0.2.
    """
    C = xyz.shape[0]
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)

    # view/clip transforms (column-vector convention); full f32 matmuls --
    # the TPU bf16 default would cost ~2px of projection accuracy at 1024^2
    hi = jax.lax.Precision.HIGHEST
    ones = jnp.ones((C, 1), xyz.dtype)
    xyz_h = jnp.concatenate([xyz, ones], axis=1)
    p_view = jnp.matmul(xyz_h, world_view.T, precision=hi)  # (C,4)
    p_hom = jnp.matmul(xyz_h, full_proj.T, precision=hi)  # (C,4)
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    tz = p_view[:, 2]
    in_front = tz > 0.2  # near-plane cull (reference: auxiliary.h in_frustum)
    tz_safe = jnp.where(in_front, tz, 1.0)

    # EWA: cov2D = J W Sigma W^T J^T (reference: forward.cu:74-113)
    cov3d = build_cov3d(scaling, rotation_q, scaling_modifier)  # (C,3,3)
    W = world_view[:3, :3]  # world->view rotation

    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    txtz = jnp.clip(p_view[:, 0] / tz_safe, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    zero = jnp.zeros_like(tz_safe)
    J = jnp.stack(
        [
            jnp.stack([focal_x / tz_safe, zero, -(focal_x * tx) / (tz_safe * tz_safe)], -1),
            jnp.stack([zero, focal_y / tz_safe, -(focal_y * ty) / (tz_safe * tz_safe)], -1),
        ],
        axis=-2,
    )  # (C,2,3)
    T = jnp.matmul(J, W[None], precision=hi)  # (C,2,3)
    cov2d = jnp.matmul(
        jnp.matmul(T, cov3d, precision=hi), jnp.swapaxes(T, -1, -2), precision=hi
    )  # (C,2,2)
    cov_a = cov2d[:, 0, 0] + 0.3
    cov_b = cov2d[:, 0, 1]
    cov_c = cov2d[:, 1, 1] + 0.3

    det = cov_a * cov_c - cov_b * cov_b
    det_valid = det > 0.0
    det_safe = jnp.where(det_valid, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([cov_c * inv_det, -cov_b * inv_det, cov_a * inv_det], axis=-1)

    # 3-sigma extent from the larger eigenvalue (forward.cu:203-208)
    mid = 0.5 * (cov_a + cov_c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # NDC -> pixel: ((v+1)*S-1)/2 (reference: auxiliary.h ndc2Pix)
    mean_x = ((p_proj[:, 0] + 1.0) * width - 1.0) * 0.5
    mean_y = ((p_proj[:, 1] + 1.0) * height - 1.0) * 0.5
    means2d = jnp.stack([mean_x, mean_y], axis=-1)

    visible = in_front & det_valid & (opacity > 0.0)
    radii = jnp.where(visible, radius, 0.0).astype(jnp.int32)
    opac = jnp.where(visible, opacity, 0.0)

    colors = sh_color(sh_degree, shs, xyz, camera_center)

    return Projected(
        means2d=means2d,
        depths=tz,
        radii=radii,
        conics=conic,
        colors=colors,
        opacities=opac,
    )

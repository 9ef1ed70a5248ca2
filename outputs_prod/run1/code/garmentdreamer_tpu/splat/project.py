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
    lim_xy=None,
) -> Projected:
    """EWA projection of the full cloud for one camera.

    Matches forward.cu:74-256: perspective Jacobian with the 1.3*tanfov frustum
    clamp, +0.3 low-pass on the 2D covariance diagonal, 3-sigma pixel radius from
    the larger eigenvalue, near-plane cull at view z <= 0.2.

    ``lim_xy`` overrides the (1.3*tanfovx, 1.3*tanfovy) frustum clamp --
    horizontal-strip cameras (multi-chip pixel sharding) pass the FULL
    image's limits so per-strip covariances match the unsharded render
    bit-for-bit (parallel/dp.strip_cameras).
    """
    C = xyz.shape[0]
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)

    # All the small matrix algebra below is written ELEMENTWISE over (C,)
    # columns: batched (C,3,3) matmuls with contraction dim 3 pad to 128 MXU
    # lanes on TPU and measured ~50x slower than the equivalent VPU formulas.
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]

    def xform_row(M, r):
        return M[r, 0] * x + M[r, 1] * y + M[r, 2] * z + M[r, 3]

    p_view_x = xform_row(world_view, 0)
    p_view_y = xform_row(world_view, 1)
    tz = xform_row(world_view, 2)
    p_hom_x = xform_row(full_proj, 0)
    p_hom_y = xform_row(full_proj, 1)
    p_hom_w = xform_row(full_proj, 3)
    p_w = 1.0 / (p_hom_w + 1e-7)
    p_proj = jnp.stack([p_hom_x * p_w, p_hom_y * p_w], axis=-1)

    in_front = tz > 0.2  # near-plane cull (reference: auxiliary.h in_frustum)
    tz_safe = jnp.where(in_front, tz, 1.0)

    # cov3D = (R diag(S))(R diag(S))^T, six unique entries (forward.cu:118-152)
    q = rotation_q / jnp.clip(
        jnp.linalg.norm(rotation_q, axis=-1, keepdims=True), 1e-12, None
    )
    qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    s0 = scaling_modifier * scaling[:, 0]
    s1 = scaling_modifier * scaling[:, 1]
    s2 = scaling_modifier * scaling[:, 2]
    m00 = (1 - 2 * (qy * qy + qz * qz)) * s0
    m01 = (2 * (qx * qy - qw * qz)) * s1
    m02 = (2 * (qx * qz + qw * qy)) * s2
    m10 = (2 * (qx * qy + qw * qz)) * s0
    m11 = (1 - 2 * (qx * qx + qz * qz)) * s1
    m12 = (2 * (qy * qz - qw * qx)) * s2
    m20 = (2 * (qx * qz - qw * qy)) * s0
    m21 = (2 * (qy * qz + qw * qx)) * s1
    m22 = (1 - 2 * (qx * qx + qy * qy)) * s2
    c00 = m00 * m00 + m01 * m01 + m02 * m02
    c01 = m00 * m10 + m01 * m11 + m02 * m12
    c02 = m00 * m20 + m01 * m21 + m02 * m22
    c11 = m10 * m10 + m11 * m11 + m12 * m12
    c12 = m10 * m20 + m11 * m21 + m12 * m22
    c22 = m20 * m20 + m21 * m21 + m22 * m22

    # EWA: cov2D = J W Sigma W^T J^T (forward.cu:74-113)
    W = world_view[:3, :3]  # world->view rotation (static 3x3)
    if lim_xy is None:
        limx = 1.3 * tanfovx
        limy = 1.3 * tanfovy
    else:
        limx, limy = lim_xy[0], lim_xy[1]
    txtz = jnp.clip(p_view_x / tz_safe, -limx, limx)
    tytz = jnp.clip(p_view_y / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    inv_z = 1.0 / tz_safe
    j00 = focal_x * inv_z
    j02 = -(focal_x * tx) * inv_z * inv_z
    j11 = focal_y * inv_z
    j12 = -(focal_y * ty) * inv_z * inv_z
    # T = J @ W: row 0 = j00*W[0,:] + j02*W[2,:]; row 1 = j11*W[1,:] + j12*W[2,:]
    t00 = j00 * W[0, 0] + j02 * W[2, 0]
    t01 = j00 * W[0, 1] + j02 * W[2, 1]
    t02 = j00 * W[0, 2] + j02 * W[2, 2]
    t10 = j11 * W[1, 0] + j12 * W[2, 0]
    t11 = j11 * W[1, 1] + j12 * W[2, 1]
    t12 = j11 * W[1, 2] + j12 * W[2, 2]

    # cov2d = T Sigma T^T with symmetric Sigma
    cov_a = (
        t00 * t00 * c00 + t01 * t01 * c11 + t02 * t02 * c22
        + 2.0 * (t00 * t01 * c01 + t00 * t02 * c02 + t01 * t02 * c12)
    ) + 0.3
    cov_b = (
        t00 * t10 * c00 + t01 * t11 * c11 + t02 * t12 * c22
        + (t00 * t11 + t01 * t10) * c01
        + (t00 * t12 + t02 * t10) * c02
        + (t01 * t12 + t02 * t11) * c12
    )
    cov_c = (
        t10 * t10 * c00 + t11 * t11 * c11 + t12 * t12 * c22
        + 2.0 * (t10 * t11 * c01 + t10 * t12 * c02 + t11 * t12 * c12)
    ) + 0.3

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

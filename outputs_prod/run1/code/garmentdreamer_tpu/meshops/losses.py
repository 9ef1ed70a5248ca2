"""The six deformer losses (reference: deformer/losses/*, SURVEY.md section 2.4),
as pure jnp functions over one view's G-buffer -- vmapped/batched by the
driver instead of the reference's python loop over views.

Camera-space normal convention used throughout (mask.py:20-23,
normal.py:20-22, shading.py:37-44): ``n_cam = n_world @ R.T @ diag(1,-1,-1)``
and the view direction is ``-(normalize(center - position) @ R.T @ diag(1,-1,-1))``.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "to_camera_normal",
    "camera_view_cosines",
    "mask_loss",
    "hole_mask_loss",
    "normal_map_loss",
    "normal_map_loss_enhanced",
    "shading_loss_inputs",
]

_FLIP = jnp.asarray([1.0, -1.0, -1.0])


def to_camera_normal(n_world: jnp.ndarray, cam_R: jnp.ndarray) -> jnp.ndarray:
    """world normal -> camera-view normal: n @ R.T @ diag(1,-1,-1)
    (normal.py:20-22)."""
    return (n_world @ cam_R.T) * _FLIP


def camera_view_cosines(
    position: jnp.ndarray, normal_cam: jnp.ndarray,
    cam_R: jnp.ndarray, cam_center: jnp.ndarray, eps: float = 1e-6,
) -> jnp.ndarray:
    """cos(view_dir, normal) in camera space with the reference's sign
    convention (normal.py:24-33: view_direction flipped)."""
    vd = cam_center - position
    vd = vd / jnp.maximum(jnp.linalg.norm(vd, axis=-1, keepdims=True), eps)
    vd = -((vd @ cam_R.T) * _FLIP)
    num = jnp.sum(vd * normal_cam, axis=-1)
    den = jnp.maximum(
        jnp.linalg.norm(vd, axis=-1) * jnp.linalg.norm(normal_cam, axis=-1), eps
    )
    return num / den


def mask_loss(view_mask: jnp.ndarray, rendered_mask: jnp.ndarray) -> jnp.ndarray:
    """MSE between target and rendered mask (mask.py:60-74)."""
    return jnp.mean((view_mask - rendered_mask) ** 2)


def hole_mask_loss(
    gbuffer: Dict[str, jnp.ndarray],
    gbuffer_rf: Dict[str, jnp.ndarray],
    cam_R: jnp.ndarray,
    cam_center: jnp.ndarray,
) -> jnp.ndarray:
    """Sign-of-cosine consistency vs the frozen stage-1 reference mesh
    (mask.py:9-57): sign(cos(view, normal)) must match the reference render's
    on pixels covered by both. The signs are hard (+-1, via masked_fill in the
    reference) so gradients flow only through... nothing -- the reference's
    ``.data.masked_fill_`` makes both operands piecewise constant; the loss
    value is 4 * (fraction of sign mismatches). We reproduce that exactly with
    stop_gradient signs."""
    n = to_camera_normal(gbuffer["normal"], cam_R)
    n_rf = to_camera_normal(gbuffer_rf["normal"], cam_R)
    c = camera_view_cosines(gbuffer["position"], n, cam_R, cam_center)
    c_rf = camera_view_cosines(gbuffer_rf["position"], n_rf, cam_R, cam_center)
    sign = jax.lax.stop_gradient(jnp.where(c < 0, -1.0, 1.0))
    sign_rf = jax.lax.stop_gradient(jnp.where(c_rf < 0, -1.0, 1.0))
    m = (gbuffer["mask"][..., 0] > 0) & (gbuffer_rf["mask"][..., 0] > 0)
    diff = (sign - sign_rf) ** 2
    denom = jnp.maximum(jnp.sum(m), 1)
    return jnp.sum(jnp.where(m, diff, 0.0)) / denom


def normal_map_loss(
    view_normal01: jnp.ndarray,  # target normal map in [0,1] (view.normal)
    view_mask: jnp.ndarray,
    gbuffer: Dict[str, jnp.ndarray],
    cam_R: jnp.ndarray,
) -> jnp.ndarray:
    """L1 between target normals (kept in [0,1]) and rendered camera-space
    normals mapped to [0,1] on the valid area (normal.py:78-97)."""
    n = 0.5 * (to_camera_normal(gbuffer["normal"], cam_R) + 1.0)
    m = (view_mask[..., 0] > 0) & (gbuffer["mask"][..., 0] > 0)
    diff = jnp.abs(n - view_normal01)
    denom = jnp.maximum(jnp.sum(m), 1) * 3
    return jnp.sum(jnp.where(m[..., None], diff, 0.0)) / denom


def normal_map_loss_enhanced(
    view_normal01: jnp.ndarray,
    view_mask: jnp.ndarray,
    gbuffer: Dict[str, jnp.ndarray],
    cam_R: jnp.ndarray,
    cam_center: jnp.ndarray,
    epsilon: float = -0.1,
) -> jnp.ndarray:
    """Front-facing-weighted (1 - cos) normal loss (normal.py:8-76):

    * errors weighted by exp(|cos(view, target_normal)|), normalized over the
      WHOLE image (reference divides by the full-sum, :36);
    * valid area: both masks AND rendered normal back-facing the view
      (cos <= 0) AND target normal confidently front-facing (cos <= epsilon);
    * cosine weights are stop-gradient (computed under no_grad, :26-34);
    * sum (not mean) over valid pixels, matching :68.
    """
    n = to_camera_normal(gbuffer["normal"], cam_R)
    target = view_normal01 * 2.0 - 1.0
    nn = jnp.maximum(jnp.linalg.norm(n, axis=-1), 1e-8)
    tn = jnp.maximum(jnp.linalg.norm(target, axis=-1), 1e-8)
    errors = 1.0 - jnp.sum(n * target, axis=-1) / (nn * tn)

    cos_t = jax.lax.stop_gradient(
        camera_view_cosines(gbuffer["position"], target, cam_R, cam_center)
    )
    cos_t = jnp.where(cos_t > epsilon, 0.0, cos_t)
    cos_v = jax.lax.stop_gradient(
        camera_view_cosines(gbuffer["position"], n, cam_R, cam_center)
    )

    w = jnp.exp(jnp.abs(cos_t))
    errors = errors * w / jnp.sum(w)

    m = (
        (view_mask[..., 0] > 0)
        & (gbuffer["mask"][..., 0] > 0)
        & (cos_v <= 0)
        & (cos_t <= epsilon)
    )
    return jnp.sum(jnp.where(m, errors, 0.0))


class ShadingInputs(NamedTuple):
    position: jnp.ndarray  # (N, 3)
    normal: jnp.ndarray  # (N, 3) world
    view_dir: jnp.ndarray  # (N, 3) world, normalized center - pos
    target_rgb: jnp.ndarray  # (N, 3)
    weight: jnp.ndarray  # (N,) 0/1 validity


def shading_loss_inputs(
    view_rgb: jnp.ndarray,
    view_mask: jnp.ndarray,
    gbuffer: Dict[str, jnp.ndarray],
    cam_R: jnp.ndarray,
    cam_center: jnp.ndarray,
    rng: jax.Array,
    num_samples: int,
    shading_percentage: float = 0.75,
) -> ShadingInputs:
    """Static-shape sampling of valid pixels for the shading loss
    (shading.py:20-63): valid = both masks & rendered normal back-facing;
    of those, a random ``shading_percentage`` subset feeds the shader.

    The reference gathers a dynamic number of pixels; we draw ``num_samples``
    pixel indices from the valid set (with replacement via top-k of perturbed
    validity) and carry a weight so the L1 matches in expectation.
    """
    n = to_camera_normal(gbuffer["normal"], cam_R)
    cos_v = camera_view_cosines(gbuffer["position"], n, cam_R, cam_center)
    valid = (
        (view_mask[..., 0] > 0) & (gbuffer["mask"][..., 0] > 0) & (cos_v <= 0)
    )
    H, W = valid.shape
    num_samples = min(num_samples, H * W)
    flat_valid = valid.reshape(-1)
    u = jax.random.uniform(rng, (H * W,))
    # keep each valid pixel with prob = shading_percentage, then take the
    # num_samples highest scores -> a uniform random subset of the kept set
    score = jnp.where(flat_valid & (u < shading_percentage), u, -1.0)
    top, idx = jax.lax.top_k(score, num_samples)
    weight = (top > 0).astype(jnp.float32)

    pos = gbuffer["position"].reshape(-1, 3)[idx]
    nrm = gbuffer["normal"].reshape(-1, 3)[idx]
    rgb = view_rgb.reshape(-1, 3)[idx]
    vd = cam_center - pos
    vd = vd / jnp.maximum(jnp.linalg.norm(vd, axis=-1, keepdims=True), 1e-8)
    return ShadingInputs(pos, nrm, vd, rgb, weight)

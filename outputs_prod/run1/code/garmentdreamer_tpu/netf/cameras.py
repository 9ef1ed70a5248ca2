"""NeTF cameras: orbit poses, GL perspective, and the reconstruction-view
camera derivation.

Mirrors the reference netf conventions:

* ``orbit_pose`` == kiui.cam.orbit_camera (y-up OpenGL c2w; elevation in
  degrees, positive = camera below the equator per kiui's y = -r*sin(e));
  used for the VSD novel views (netf/trainer.py:178-181);
* ``perspective`` == netf/view_core/camera.py:4-26 -- NOTE the reference
  passes fovy in DEGREES straight into tan() (a missing deg2rad); the effect
  is an accidental ~67deg fov with a 180deg image rotation, compensated by
  the final export x-flip. We apply deg2rad (sane behavior) and keep the
  negative-y row of the kiui/GL convention;
* ``reconstruction_pose`` == the axis-permute + double-flip dance of
  netf/render/mesh_renderer.py:176-213 that converts a stage-1 cameras.json
  C2W into the renderer's OpenGL pose. The reference composes look_at with
  two rounds of sign surgery; algebraically it reduces to: permuted position
  p' = (y, z, x), then pose = look_at(p' * (1,1,1) with x,z sign flips
  cancelling, ...). We reproduce the exact sequence numerically rather than
  the reduced form -- it is load-bearing.
"""

from __future__ import annotations

import numpy as np

__all__ = ["orbit_pose", "perspective", "look_at", "reconstruction_pose"]


def _norm(v):
    return v / max(np.linalg.norm(v), 1e-20)


def look_at(campos: np.ndarray, target: np.ndarray) -> np.ndarray:
    """kiui.op.look_at (opengl=True): columns [right, up, forward],
    forward = campos - target."""
    forward = _norm(campos - target)
    right = _norm(np.cross(np.array([0.0, 1.0, 0.0]), forward))
    up = _norm(np.cross(forward, right))
    return np.stack([right, up, forward], axis=1).astype(np.float32)


def orbit_pose(elevation_deg: float, azimuth_deg: float, radius: float) -> np.ndarray:
    """kiui.cam.orbit_camera: y-up OpenGL camera-to-world."""
    e = np.deg2rad(elevation_deg)
    a = np.deg2rad(azimuth_deg)
    campos = np.array(
        [
            radius * np.cos(e) * np.sin(a),
            -radius * np.sin(e),
            radius * np.cos(e) * np.cos(a),
        ],
        np.float32,
    )
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = look_at(campos, np.zeros(3, np.float32))
    pose[:3, 3] = campos
    return pose


def perspective(fovy_deg: float, near: float = 0.01, far: float = 100.0) -> np.ndarray:
    """GL projection with the kiui negative-y row (view_core/camera.py:4-26,
    with the missing deg2rad fixed -- see module docstring)."""
    y = np.tan(np.deg2rad(fovy_deg) / 2.0)
    return np.array(
        [
            [1.0 / y, 0, 0, 0],
            [0, -1.0 / y, 0, 0],
            [0, 0, -(far + near) / (far - near), -(2 * far * near) / (far - near)],
            [0, 0, -1.0, 0],
        ],
        np.float32,
    )


def projection_from_K(K: np.ndarray, width: int, height: int,
                      n: float = 0.01, f: float = 1000.0) -> np.ndarray:
    """OpenCV K -> GL projection (mesh_renderer.py:242-246)."""
    return np.array(
        [
            [2.0 * K[0, 0] / width, 0, 1.0 - 2.0 * K[0, 2] / width, 0],
            [0, 2.0 * K[1, 1] / height, 1.0 - 2.0 * K[1, 2] / height, 0],
            [0, 0, -(f + n) / (f - n), -(2 * f * n) / (f - n)],
            [0, 0, -1.0, 0.0],
        ],
        np.float32,
    )


def reconstruction_pose(c2w_position: np.ndarray) -> np.ndarray:
    """cameras.json C2W position -> fit-texture render pose, reproducing the
    reference's exact flip sequence (mesh_renderer.py:176-213)."""
    p_ = np.asarray(c2w_position, np.float64)
    position = np.zeros(3)
    position[0] = p_[1]
    position[1] = p_[2]
    position[2] = p_[0]

    rotation = look_at(position.astype(np.float32), np.zeros(3, np.float32)).astype(np.float64)

    def fix_col0(rot):
        rot[:, 0] = np.cross(rot[:, 2], rot[:, 1])
        rot[:, 0] = rot[:, 0] / np.linalg.norm(rot[:, 0])

    position[0] = -position[0]
    rotation[0, 1] = -rotation[0, 1]
    rotation[0, 2] = -rotation[0, 2]
    fix_col0(rotation)

    position[2] = -position[2]
    rotation[2, 1] = -rotation[2, 1]
    rotation[2, 2] = -rotation[2, 2]
    fix_col0(rotation)

    position[0] = -position[0]
    rotation[0, 1] = -rotation[0, 1]
    rotation[0, 2] = -rotation[0, 2]
    fix_col0(rotation)

    position[2] = -position[2]
    rotation[2, 1] = -rotation[2, 1]
    rotation[2, 2] = -rotation[2, 2]
    fix_col0(rotation)

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = rotation
    pose[:3, 3] = position
    return pose

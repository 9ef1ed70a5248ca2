"""Camera conventions and converters.

The reference pipeline threads cameras through three mutually-incompatible
conventions; all three are load-bearing because stage boundaries exchange
``cameras.json`` and image files whose axes/signs must cancel exactly:

1. **threestudio lookat c2w** -- right-handed world, x back / y right / z up,
   camera looks down -z; built from (elevation, azimuth, distance)
   (reference: threestudio/data/uncond.py:247-260, 344-354).
2. **3DGS convention** -- ``c2w_3dgs`` built from the NeRF-style
   ``pose_spherical`` chain followed by sign flips; its rotation block is the
   camera-to-world rotation but its translation column is the *world-to-view*
   translation (reference: uncond.py:49-54, 370-389; gaussiansplatting Camera
   scene/cameras.py:17-54, utils/graphics_utils.py getWorld2View2).
3. **OpenGL clip space for mesh rasterization** -- y-flipped projection used with
   nvdiffrast-style renderers (reference: threestudio/utils/ops.py:266-294).

Everything here is tiny host-side numpy; the arrays are shipped to device in
batches by the data samplers.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

__all__ = [
    "fov2focal",
    "focal2fov",
    "spherical_positions",
    "lookat_c2w",
    "c2w_3dgs_from_spherical",
    "gs_world_view",
    "gs_projection",
    "GSCamera",
    "gs_camera_from_spherical",
    "gl_projection",
    "mvp_from_c2w",
    "turntable_angles",
    "camera_json_entry",
    "save_cameras_json",
    "load_cameras_json",
]


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


# ---------------------------------------------------------------------------
# Convention 1: threestudio lookat c2w
# ---------------------------------------------------------------------------


def spherical_positions(
    elevation_deg: np.ndarray, azimuth_deg: np.ndarray, distance: np.ndarray
) -> np.ndarray:
    """Camera positions in the x-back / y-right / z-up world frame."""
    elev = np.deg2rad(np.asarray(elevation_deg, np.float64))
    azim = np.deg2rad(np.asarray(azimuth_deg, np.float64))
    dist = np.asarray(distance, np.float64)
    return np.stack(
        [
            dist * np.cos(elev) * np.cos(azim),
            dist * np.cos(elev) * np.sin(azim),
            dist * np.sin(elev),
        ],
        axis=-1,
    ).astype(np.float32)


def lookat_c2w(
    positions: np.ndarray,
    center: Optional[np.ndarray] = None,
    up: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Batched lookat camera-to-world (B,4,4); columns are [right, up, -lookat, pos]."""
    positions = np.asarray(positions, np.float32)
    if center is None:
        center = np.zeros_like(positions)
    if up is None:
        up = np.broadcast_to(np.array([0, 0, 1], np.float32), positions.shape).copy()

    def _norm(v):
        return v / np.clip(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20, None)

    lookat = _norm(center - positions)
    right = _norm(np.cross(lookat, up))
    up2 = _norm(np.cross(right, lookat))
    c2w = np.zeros(positions.shape[:-1] + (4, 4), np.float32)
    c2w[..., :3, 0] = right
    c2w[..., :3, 1] = up2
    c2w[..., :3, 2] = -lookat
    c2w[..., :3, 3] = positions
    c2w[..., 3, 3] = 1.0
    return c2w


# ---------------------------------------------------------------------------
# Convention 2: 3DGS camera chain
# ---------------------------------------------------------------------------


def _pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """NeRF-style spherical pose chain (reference: uncond.py:29-54)."""
    th = math.radians(theta_deg)
    ph = math.radians(phi_deg)
    trans = np.eye(4, dtype=np.float64)
    trans[2, 3] = radius
    rot_phi = np.array(
        [
            [1, 0, 0, 0],
            [0, math.cos(ph), -math.sin(ph), 0],
            [0, math.sin(ph), math.cos(ph), 0],
            [0, 0, 0, 1],
        ],
        np.float64,
    )
    rot_theta = np.array(
        [
            [math.cos(th), 0, -math.sin(th), 0],
            [0, 1, 0, 0],
            [math.sin(th), 0, math.cos(th), 0],
            [0, 0, 0, 1],
        ],
        np.float64,
    )
    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], np.float64
    )
    return flip @ rot_theta @ rot_phi @ trans


def c2w_3dgs_from_spherical(
    elevation_deg: np.ndarray, azimuth_deg: np.ndarray, distance: np.ndarray
) -> np.ndarray:
    """The hybrid "c2w_3dgs" matrix the splat renderer consumes.

    Rotation block = camera-to-world rotation; translation column = world-to-view
    translation (this is the 3DGS R/T packing). Reproduces the reference chain
    ``pose_spherical(azim + 90, -elev, d)`` -> invert -> sign flips exactly
    (reference: uncond.py:370-389, 493-510).
    """
    elevation_deg = np.atleast_1d(np.asarray(elevation_deg, np.float64))
    azimuth_deg = np.atleast_1d(np.asarray(azimuth_deg, np.float64))
    distance = np.atleast_1d(np.asarray(distance, np.float64))
    out = np.zeros((elevation_deg.shape[0], 4, 4), np.float64)
    for i in range(elevation_deg.shape[0]):
        render_pose = _pose_spherical(
            azimuth_deg[i] + 180.0 - 90.0, -elevation_deg[i], distance[i]
        )
        m = np.linalg.inv(render_pose)
        R = -m[:3, :3].T
        R[:, 0] = -R[:, 0]
        T = -m[:3, 3]
        out[i, :3, :3] = R
        out[i, :3, 3] = T
        out[i, 3, 3] = 1.0
    return out.astype(np.float32)


def gs_world_view(c2w_3dgs: np.ndarray) -> np.ndarray:
    """World-to-view 4x4 (column-vector convention): [[R^T, T], [0, 1]].

    Equivalent to the reference ``getWorld2View2(R, T)`` with default
    translate/scale (graphics_utils.py:46-57). Note the reference then stores the
    transpose for its row-vector convention; we keep column-vector throughout.
    """
    c2w_3dgs = np.asarray(c2w_3dgs, np.float32)
    R = c2w_3dgs[..., :3, :3]
    T = c2w_3dgs[..., :3, 3]
    w2v = np.zeros_like(c2w_3dgs)
    w2v[..., :3, :3] = np.swapaxes(R, -1, -2)
    w2v[..., :3, 3] = T
    w2v[..., 3, 3] = 1.0
    return w2v


def gs_projection(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """3DGS projection matrix, z in [0, zfar/(zfar-znear)] with +z forward
    (reference: graphics_utils.py:74-96)."""
    tan_half_fovy = math.tan(fovy / 2.0)
    tan_half_fovx = math.tan(fovx / 2.0)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1.0 / tan_half_fovx
    P[1, 1] = 1.0 / tan_half_fovy
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


@dataclass
class GSCamera:
    """Everything the splat rasterizer needs for one view (column-vector 4x4s)."""

    world_view: np.ndarray  # (4,4) world -> view
    full_proj: np.ndarray  # (4,4) world -> clip (= proj @ world_view)
    camera_center: np.ndarray  # (3,)
    tanfovx: float
    tanfovy: float
    height: int
    width: int
    znear: float = 0.01
    zfar: float = 100.0

    def as_arrays(self) -> Dict[str, np.ndarray]:
        return {
            "world_view": self.world_view.astype(np.float32),
            "full_proj": self.full_proj.astype(np.float32),
            "camera_center": self.camera_center.astype(np.float32),
            "tanfov": np.array([self.tanfovx, self.tanfovy], np.float32),
        }


def gs_camera_from_spherical(
    elevation_deg: float,
    azimuth_deg: float,
    distance: float,
    fovy: float,
    height: int,
    width: int,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> GSCamera:
    """Build a splat camera exactly as the reference Camera(c2w_3dgs, fovy, H, W).

    FoVx derivation mirrors scene/cameras.py:23: focal from fovy over *height*,
    fovx from that focal over *width*.
    """
    c2w = c2w_3dgs_from_spherical(elevation_deg, azimuth_deg, distance)[0]
    return gs_camera_from_c2w3dgs(c2w, fovy, height, width, znear, zfar)


def gs_camera_from_c2w3dgs(
    c2w_3dgs: np.ndarray,
    fovy: float,
    height: int,
    width: int,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> GSCamera:
    fovx = focal2fov(fov2focal(fovy, height), width)
    w2v = gs_world_view(c2w_3dgs)
    proj = gs_projection(znear, zfar, fovx, fovy)
    full = (proj @ w2v).astype(np.float32)
    cam_center = np.linalg.inv(w2v)[:3, 3].astype(np.float32)
    return GSCamera(
        world_view=w2v.astype(np.float32),
        full_proj=full,
        camera_center=cam_center,
        tanfovx=math.tan(fovx * 0.5),
        tanfovy=math.tan(fovy * 0.5),
        height=int(height),
        width=int(width),
        znear=znear,
        zfar=zfar,
    )


# ---------------------------------------------------------------------------
# Convention 3: GL clip space for mesh rasterization
# ---------------------------------------------------------------------------


def gl_projection(fovy: np.ndarray, aspect_wh: float, near: float, far: float) -> np.ndarray:
    """y-flipped GL projection used with image-space row-0-at-top rasterizers
    (reference: threestudio/utils/ops.py:266-284)."""
    fovy = np.atleast_1d(np.asarray(fovy, np.float64))
    B = fovy.shape[0]
    P = np.zeros((B, 4, 4), np.float32)
    P[:, 0, 0] = 1.0 / (np.tan(fovy / 2.0) * aspect_wh)
    P[:, 1, 1] = -1.0 / np.tan(fovy / 2.0)
    P[:, 2, 2] = -(far + near) / (far - near)
    P[:, 2, 3] = -2.0 * far * near / (far - near)
    P[:, 3, 2] = -1.0
    return P


def mvp_from_c2w(c2w: np.ndarray, proj: np.ndarray) -> np.ndarray:
    """proj @ inv(c2w), with the inverse done in R^T / -R^T t closed form
    (reference: ops.py:281-293)."""
    c2w = np.asarray(c2w, np.float32)
    R = c2w[..., :3, :3]
    t = c2w[..., :3, 3:]
    w2c = np.zeros_like(c2w)
    w2c[..., :3, :3] = np.swapaxes(R, -1, -2)
    w2c[..., :3, 3:] = -np.swapaxes(R, -1, -2) @ t
    w2c[..., 3, 3] = 1.0
    return (proj @ w2c).astype(np.float32)


# ---------------------------------------------------------------------------
# Test turntable + cameras.json
# ---------------------------------------------------------------------------


def turntable_angles(
    n_horizontal: int = 37,
    n_vertical: int = 11,
    elevation_range: Sequence[float] = (-90.0, 90.0),
):
    """The 407-view evaluation ring: azimuth linspace(0,360,37) tiled per
    elevation row linspace(-90,90,11) (reference: uncond.py:418-429)."""
    azim = np.tile(np.linspace(0.0, 360.0, n_horizontal, dtype=np.float64), n_vertical)
    elev_rows = np.linspace(
        elevation_range[0], elevation_range[1], n_vertical, dtype=np.float64
    )
    elev = np.repeat(elev_rows, n_horizontal)
    return elev.astype(np.float32), azim.astype(np.float32)


def camera_json_entry(
    index: int,
    c2w: np.ndarray,
    fovy: float,
    height: int,
    width: int,
) -> Dict:
    """One cameras.json record, byte-compatible field-for-field with the
    reference export (GaussianDreamer.py:352-364): ``rotation`` is the *negated*
    threestudio c2w rotation, ``position`` its translation."""
    c2w = np.asarray(c2w, np.float32)
    pos = c2w[:3, 3]
    rot = -c2w[:3, :3]
    fy = fov2focal(fovy, height)
    fx = fov2focal(focal2fov(fov2focal(fovy, height), width), width)
    return {
        "id": int(index),
        "img_name": str(int(index)),
        "width": int(width),
        "height": int(height),
        "position": [float(x) for x in pos],
        "rotation": [[float(x) for x in row] for row in rot],
        "fy": float(fy),
        "fx": float(fx),
    }


def save_cameras_json(path: str, entries: List[Dict]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(entries, f)


def load_cameras_json(path: str) -> List[Dict]:
    with open(path) as f:
        return json.load(f)

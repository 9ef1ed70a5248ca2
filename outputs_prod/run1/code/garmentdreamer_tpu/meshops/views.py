"""Stage-3/4 view loading: cameras.json + renders + estimated normals ->
OpenCV cameras and target images.

Mirrors the reference exactly (deformer/core/view.py:30-120,
deformer/utils/io.py:39-53):

* cameras.json entries hold the 3DGS-convention position/rotation
  (``rotation`` = -c2w_rot as exported by GaussianDreamer.py:361-364); the
  conversion to an OpenCV W2C applies the load-bearing axis-flip dance of
  view.py:66-76 (negate col 0, negate y of position, selective sign flips,
  rebuild col 1 by cross product, negate col 2);
* the normal map PNG is mapped [0,1] -> [-1,1], its y component flipped, and
  mapped back to [0,1] (view.py:102-105) -- targets stay in [0,1];
* the affine space-normalization transform of views (view.py:170-214) reduces,
  for the similarity A = s(x - c), to: K' = K, R' = R, t' = s*(R@c + t).
  (The reference composes and cv2-decomposes the projection matrix; for a
  uniform scale + translation the decomposition returns exactly this.)
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["LoadedView", "load_views", "camera_from_json_entry", "transform_view"]


@dataclasses.dataclass
class LoadedView:
    K: np.ndarray  # (3,3)
    R: np.ndarray  # (3,3)
    t: np.ndarray  # (3,)
    normal: np.ndarray  # (H,W,3) in [0,1], y-flipped camera-space target
    mask: np.ndarray  # (H,W,1) in [0,1]
    rgb: np.ndarray  # (H,W,3) in [0,1]

    @property
    def center(self) -> np.ndarray:
        return -(self.R.T @ self.t)

    @property
    def resolution(self) -> Tuple[int, int]:
        return self.normal.shape[0], self.normal.shape[1]


def camera_from_json_entry(info: dict) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cameras.json entry -> OpenCV (K, R, t) (view.py:60-90)."""
    position = np.array(info["position"], np.float64)
    rotation = np.array(info["rotation"], np.float64)
    rotation[:, 0] *= -1

    position[1] = -position[1]
    rotation[1, 0] = -rotation[1, 0]
    rotation[1, 2] = -rotation[1, 2]
    rotation[:, 1] = np.cross(rotation[:, 2], rotation[:, 0])
    rotation[:, 1] = rotation[:, 1] / np.linalg.norm(rotation[:, 1])
    rotation[:, 2] *= -1

    C2W = np.eye(4)
    C2W[:3, :3] = rotation
    C2W[:3, 3] = position
    W2C = np.linalg.inv(C2W)
    R = W2C[:3, :3].astype(np.float32)
    t = W2C[:3, 3].astype(np.float32)
    K = np.array(
        [
            [info["fx"], 0, info["width"] / 2],
            [0, info["fy"], info["height"] / 2],
            [0, 0, 1],
        ],
        np.float32,
    )
    return K, R, t


def load_views(
    sample_dir: str,
    limit: Optional[int] = None,
    stride: int = 1,
) -> List[LoadedView]:
    """Read gs_rendered_rgba/ + estimated_normals/ + cameras.json
    (io.py:39-53, view.py:30-120)."""
    from PIL import Image

    with open(os.path.join(sample_dir, "cameras.json")) as f:
        cams = sorted(json.load(f), key=lambda x: x["id"])

    rgb_dir = os.path.join(sample_dir, "gs_rendered_rgba")
    nrm_dir = os.path.join(sample_dir, "estimated_normals")
    names = sorted(
        (n for n in os.listdir(nrm_dir) if n.endswith(".png")),
        key=lambda n: int(n.split(".")[0]),
    )
    views: List[LoadedView] = []
    for name in names[::stride]:
        i = int(name.split(".")[0])
        info = cams[i]
        assert str(info["img_name"]) == name.split(".")[0]
        K, R, t = camera_from_json_entry(info)

        img = np.asarray(Image.open(os.path.join(nrm_dir, name)), np.float32) / 255.0
        mask = img[..., 3:4]
        normal = img[..., :3] * 2.0 - 1.0
        normal[..., 1] *= -1.0
        normal = (normal + 1.0) / 2.0

        rgba = np.asarray(Image.open(os.path.join(rgb_dir, name)), np.float32) / 255.0
        views.append(
            LoadedView(K=K, R=R, t=t, normal=normal, mask=mask, rgb=rgba[..., :3])
        )
        if limit is not None and len(views) >= limit:
            break
    return views


def transform_view(view: LoadedView, A_inv: np.ndarray, scale: float) -> LoadedView:
    """Apply the space normalization x' = s(x - c) to the camera
    (view.py:170-214 reduced analytically; A_inv[:3,3] = c, scale = s)."""
    c = A_inv[:3, 3]
    t_new = scale * (view.R @ c + view.t)
    return dataclasses.replace(view, t=t_new.astype(np.float32))

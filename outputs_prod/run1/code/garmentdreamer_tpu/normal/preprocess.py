"""Canonical-space preprocessing + output conventions for the Metric3D normal
estimator (stage 2). Host-side numpy/cv2 -- these run once per view and feed
static-shape device batches.

Mirrors the reference exactly (load-bearing conventions, SURVEY.md section 2.3):

* default intrinsic f = 731.2116911560281 == fov2focal(70deg, 1024), principal
  point at the image center (mono/utils/do_test.py:254-256);
* resize to fit the 616x1064 canonical crop preserving aspect (scale =
  min(616/H, 1064/W)), pad with the ImageNet mean pixel [123.675,116.28,103.53]
  split half/half (do_test.py:87-139, resize_for_input);
* normalize with mean/std = [123.675,116.28,103.53]/[58.395,57.12,57.375]
  (do_test.py:185-215);
* the 4-channel camera model ((x-u0)/W, (y-v0)/H, atan fovs) padded with -1
  (build_camera_model, do_test.py:65-85) -- computed for parity although the
  ViT+RAFT path never consumes it (DensePredModel.forward only passes `input`,
  mono/model/model_pipelines/dense_pipeline.py:13-16);
* output: crop the prediction by the pad, flip ALL THREE normal components,
  map [-1,1]->[0,255], resize to the source resolution, alpha = source mask
  (do_test.py:271-285, mono/utils/visualization.py:49-79,113-123).
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

__all__ = [
    "DEFAULT_FOCAL",
    "CANONICAL_CROP",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "PreprocessedView",
    "preprocess_rgb",
    "build_camera_model",
    "postprocess_normal",
]

DEFAULT_FOCAL = 731.2116911560281  # fov2focal(70deg, 1024) -- do_test.py:256
CANONICAL_CROP = (616, 1064)  # vit.raft5.large.py:27
IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)


@dataclasses.dataclass
class PreprocessedView:
    rgb: np.ndarray  # (616, 1064, 3) float32, normalized
    cam_model: np.ndarray  # (616, 1064, 4) float32
    pad: Tuple[int, int, int, int]  # top, bottom, left, right
    label_scale: float  # 1 / to_scale_ratio
    ori_shape: Tuple[int, int]


def build_camera_model(H: int, W: int, intrinsics: List[float]) -> np.ndarray:
    """4-channel intrinsics encoding (do_test.py:65-85)."""
    fx, fy, u0, v0 = intrinsics
    f = (fx + fy) / 2.0
    x_center = np.tile((np.arange(W, dtype=np.float32) - u0) / W, (H, 1))
    y_center = np.tile((np.arange(H, dtype=np.float32) - v0) / H, (W, 1)).T
    fov_x = np.arctan(x_center / (f / W))
    fov_y = np.arctan(y_center / (f / H))
    return np.stack([x_center, y_center, fov_x, fov_y], axis=2)


def preprocess_rgb(
    rgb: np.ndarray,
    intrinsic: List[float] | None = None,
    crop: Tuple[int, int] = CANONICAL_CROP,
) -> PreprocessedView:
    """RGB (H, W, 3) uint8/float [0,255] -> canonical normalized crop.

    Reference: transform_test_data_scalecano + resize_for_input
    (do_test.py:87-139,176-221) with to_canonical_ratio = 1.
    """
    import cv2

    rgb = np.asarray(rgb, np.float32)
    h, w = rgb.shape[:2]
    if intrinsic is None:
        intrinsic = [DEFAULT_FOCAL, DEFAULT_FOCAL, w / 2.0, h / 2.0]
    intrinsic = list(intrinsic)

    ratio = min(crop[0] / h, crop[1] / w)
    rh, rw = int(ratio * h), int(ratio * w)
    pad_h, pad_w = max(crop[0] - rh, 0), max(crop[1] - rw, 0)
    pad = (pad_h // 2, pad_h - pad_h // 2, pad_w // 2, pad_w - pad_w // 2)

    img = cv2.resize(rgb, (rw, rh), interpolation=cv2.INTER_LINEAR)
    img = cv2.copyMakeBorder(
        img, pad[0], pad[1], pad[2], pad[3], cv2.BORDER_CONSTANT,
        value=IMAGENET_MEAN.tolist(),
    )
    intrinsic[2] *= ratio
    intrinsic[3] *= ratio
    cam = build_camera_model(rh, rw, intrinsic)
    cam = cv2.copyMakeBorder(
        cam, pad[0], pad[1], pad[2], pad[3], cv2.BORDER_CONSTANT, value=-1.0
    )
    img = (img - IMAGENET_MEAN) / IMAGENET_STD
    return PreprocessedView(
        rgb=img.astype(np.float32),
        cam_model=cam.astype(np.float32),
        pad=pad,
        label_scale=1.0 / ratio,
        ori_shape=(h, w),
    )


def postprocess_normal(
    normal: np.ndarray,
    pad: Tuple[int, int, int, int],
    mask: np.ndarray,
) -> np.ndarray:
    """Model normal output (Hc, Wc, >=3) -> RGBA uint8-range float image at the
    mask's resolution, with the reference's sign flips and [0,255] mapping
    (do_test.py:271-285; visualization.py:49-79 flips x, y AND z;
    vis_surface_normal :113-123 maps (n+1)/2*255).

    ``mask`` is (H, W) or (H, W, 1) in [0, 255].
    """
    import cv2

    H, W = normal.shape[:2]
    n = normal[pad[0] : H - pad[1], pad[2] : W - pad[3], :3].astype(np.float32)
    n = -n  # all three components flipped (visualization.py:68-70)
    vis = (n + 1.0) / 2.0 * 255.0
    mask = np.asarray(mask, np.float32)
    if mask.ndim == 2:
        mask = mask[..., None]
    # reference resizes to (mask.shape[0], mask.shape[1]) as (w, h) -- square
    # images in this pipeline so the transpose is harmless; we do it correctly.
    vis = cv2.resize(vis, (mask.shape[1], mask.shape[0]), interpolation=cv2.INTER_LINEAR)
    return np.concatenate([vis, mask], axis=-1)

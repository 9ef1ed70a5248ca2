"""Image grids and image-sequence (mp4/gif) export.

Rebuild of the reference's SaverMixin media utilities (reference:
threestudio/utils/saving.py:255-450 -- ``get_image_grid_`` row/column
composition with rgb/grayscale cells, ``save_image_grid``,
``save_img_sequence`` via imageio mp4/gif) used for the validation grids and
turntable videos that are the reference's primary QA artifacts (SURVEY.md
section 4). W&B logging is intentionally dropped (logger disabled in the
reference driver, generate_3dgs.py:53).

Cell spec: ``{"type": "rgb"|"grayscale", "img": array, ...kwargs}``.
rgb: (H, W, 3) float in data_range (default (0, 1)).
grayscale: (H, W) float; ``cmap`` None | "jet" | "magma"; ``data_range``
None means min/max normalize (saving.py DEFAULT_GRAYSCALE_KWARGS).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = [
    "get_image_grid",
    "save_image_grid",
    "save_img_sequence",
    "save_turntable_video",
]


def _to_numpy(x) -> np.ndarray:
    return np.asarray(x)


def _rgb_cell(img, data_range: Tuple[float, float] = (0.0, 1.0)) -> np.ndarray:
    img = _to_numpy(img).astype(np.float32)
    lo, hi = data_range
    img = (img - lo) / max(hi - lo, 1e-12)
    return (np.clip(img, 0, 1) * 255.0).astype(np.uint8)


def _grayscale_cell(
    img,
    data_range: Optional[Tuple[float, float]] = None,
    cmap: Optional[str] = "jet",
) -> np.ndarray:
    import cv2

    img = _to_numpy(img).astype(np.float32)
    if data_range is None:
        lo, hi = float(img.min()), float(img.max())
    else:
        lo, hi = data_range
    img = np.clip((img - lo) / max(hi - lo, 1e-12), 0, 1)
    u8 = (img * 255.0).astype(np.uint8)
    if cmap is None:
        return np.stack([u8] * 3, axis=-1)
    code = {"jet": cv2.COLORMAP_JET, "magma": cv2.COLORMAP_MAGMA}[cmap]
    bgr = cv2.applyColorMap(u8, code)
    return bgr[..., ::-1]  # RGB


def get_image_grid(
    cells: Union[Sequence[Dict[str, Any]], Sequence[Sequence[Dict[str, Any]]]],
    align: Union[str, int, Tuple[int, int]] = "max",
) -> np.ndarray:
    """Rows of cells -> one uint8 RGB image (saving.py:255-300 semantics:
    cells resized to the align target, concatenated along x, rows along y)."""
    import cv2

    if cells and isinstance(cells[0], (list, tuple)):
        return np.concatenate([get_image_grid(r, align) for r in cells], axis=0)

    cols: List[np.ndarray] = []
    for c in cells:
        kind = c.get("type", "rgb")
        kwargs = {k: v for k, v in c.items() if k not in ("type", "img")}
        if kind == "rgb":
            cols.append(_rgb_cell(c["img"], **kwargs))
        elif kind == "grayscale":
            cols.append(_grayscale_cell(c["img"], **kwargs))
        else:
            raise ValueError(f"unsupported cell type {kind!r}")

    if align == "max":
        h = max(c.shape[0] for c in cols)
        w = max(c.shape[1] for c in cols)
    elif align == "min":
        h = min(c.shape[0] for c in cols)
        w = min(c.shape[1] for c in cols)
    elif isinstance(align, int):
        h = w = align
    else:
        h, w = align
    cols = [
        c if c.shape[:2] == (h, w) else cv2.resize(c, (w, h), interpolation=cv2.INTER_LINEAR)
        for c in cols
    ]
    return np.concatenate(cols, axis=1)


def save_image_grid(path: str, cells, align="max") -> str:
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    grid = get_image_grid(cells, align)
    cv2.imwrite(path, grid[..., ::-1])  # RGB -> BGR
    return path


def save_img_sequence(
    path: str,
    img_dir: str,
    matcher: str = r"(\d+)\.png",
    save_format: str = "mp4",
    fps: int = 30,
) -> str:
    """Collect ``img_dir`` frames whose names match ``matcher`` (sorted by
    the first integer group), write mp4 or gif (saving.py:422-450)."""
    import imageio.v2 as imageio

    assert save_format in ("gif", "mp4")
    if not path.endswith(f".{save_format}"):
        path += f".{save_format}"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pat = re.compile(matcher)
    frames = []
    for f in os.listdir(img_dir):
        m = pat.search(f)
        if m:
            frames.append((int(m.group(1)), f))
    if not frames:
        raise FileNotFoundError(f"no frames matching {matcher!r} in {img_dir}")
    frames.sort()
    imgs = [imageio.imread(os.path.join(img_dir, f))[..., :3] for _, f in frames]
    if save_format == "gif":
        imageio.mimsave(path, imgs, fps=fps, palettesize=256)
    else:
        # this image ships no imageio ffmpeg backend; cv2's bundled mp4v
        # encoder covers the reference's mp4 output (saving.py:450)
        import cv2

        h, w = imgs[0].shape[:2]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not vw.isOpened():
            raise RuntimeError(f"cv2.VideoWriter failed to open {path}")
        for im in imgs:
            if im.shape[:2] != (h, w):
                im = cv2.resize(im, (w, h))
            vw.write(im[..., ::-1])
        vw.release()
    return path


def save_turntable_video(
    path: str, sample_dir: str, fps: int = 30, save_format: str = "mp4"
) -> str:
    """The stage-1 turntable: gs_rendered_rgba/{i}.png -> one video, the
    artifact a reference user inspects after generate_3dgs."""
    return save_img_sequence(
        path, os.path.join(sample_dir, "gs_rendered_rgba"),
        matcher=r"^(\d+)\.png$", save_format=save_format, fps=fps,
    )

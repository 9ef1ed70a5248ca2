"""Saver media utilities (reference: threestudio/utils/saving.py:255-450)."""

import os

import numpy as np
import pytest

from garmentdreamer_tpu.core.saving import (
    get_image_grid,
    save_image_grid,
    save_img_sequence,
    save_turntable_video,
)


def test_grid_rgb_and_grayscale_cells():
    rgb = np.random.rand(16, 16, 3).astype(np.float32)
    depth = np.random.rand(16, 16).astype(np.float32) * 5
    grid = get_image_grid(
        [
            {"type": "rgb", "img": rgb},
            {"type": "grayscale", "img": depth, "cmap": "jet"},
            {"type": "grayscale", "img": depth, "cmap": None,
             "data_range": (0.0, 5.0)},
        ]
    )
    assert grid.shape == (16, 48, 3) and grid.dtype == np.uint8
    np.testing.assert_array_equal(
        grid[:, :16], (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    )


def test_grid_rows_and_align_resize():
    a = {"type": "rgb", "img": np.zeros((8, 8, 3), np.float32)}
    b = {"type": "rgb", "img": np.ones((16, 16, 3), np.float32)}
    grid = get_image_grid([[a, b], [b, a]], align="max")
    assert grid.shape == (32, 32, 3)
    grid2 = get_image_grid([a, b], align=4)
    assert grid2.shape == (4, 8, 3)


def test_save_image_grid_writes_png(tmp_path):
    p = save_image_grid(
        str(tmp_path / "g.png"),
        [{"type": "rgb", "img": np.random.rand(8, 8, 3)}],
    )
    assert os.path.getsize(p) > 0


@pytest.mark.parametrize("fmt", ["gif", "mp4"])
def test_img_sequence_export(tmp_path, fmt):
    import cv2

    d = tmp_path / "frames"
    d.mkdir()
    for i in range(5):
        cv2.imwrite(str(d / f"{i}.png"),
                    np.full((16, 16, 3), i * 40, np.uint8))
    p = save_img_sequence(
        str(tmp_path / f"seq.{fmt}"), str(d), matcher=r"^(\d+)\.png$",
        save_format=fmt, fps=5,
    )
    assert os.path.getsize(p) > 0


def test_turntable_video_from_sample_dir(tmp_path):
    import cv2

    d = tmp_path / "gs_rendered_rgba"
    d.mkdir()
    for i in range(4):
        cv2.imwrite(str(d / f"{i}.png"),
                    np.full((16, 16, 4), 128, np.uint8))
    p = save_turntable_video(str(tmp_path / "turn.mp4"), str(tmp_path))
    assert p.endswith(".mp4") and os.path.getsize(p) > 0


def test_sequence_missing_frames_raises(tmp_path):
    d = tmp_path / "frames"
    d.mkdir()
    with pytest.raises(FileNotFoundError):
        save_img_sequence(str(tmp_path / "x.gif"), str(d), save_format="gif")

"""Code/config snapshot + progress callbacks
(reference: threestudio/utils/callbacks.py:60-158)."""

import dataclasses
import os

import pytest

from garmentdreamer_tpu.core.callbacks import (
    ProgressWriter,
    save_code_snapshot,
    save_config_snapshot,
)


@pytest.mark.slow
def test_code_snapshot_copies_tracked_files(tmp_path):
    out = save_code_snapshot(str(tmp_path / "code"), repo_root="/root/repo")
    assert out is not None
    assert os.path.exists(os.path.join(out, "bench.py"))
    assert os.path.exists(
        os.path.join(out, "garmentdreamer_tpu", "core", "callbacks.py")
    )


def test_code_snapshot_soft_fails_outside_git(tmp_path):
    d = tmp_path / "notrepo"
    d.mkdir()
    assert save_code_snapshot(str(tmp_path / "code"), repo_root=str(d)) is None


def test_config_snapshot_yaml(tmp_path):
    import yaml

    @dataclasses.dataclass
    class C:
        lr: float = 0.1
        steps: int = 5

    raw = tmp_path / "raw_src.yml"
    raw.write_text("lr: 0.1\n")
    d = save_config_snapshot(str(tmp_path / "configs"), C(), config_path=str(raw))
    with open(os.path.join(d, "parsed.yaml")) as f:
        parsed = yaml.safe_load(f)
    assert parsed == {"lr": 0.1, "steps": 5}
    assert os.path.exists(os.path.join(d, "raw.yaml"))


def test_progress_writer_overwrites(tmp_path):
    p = ProgressWriter(str(tmp_path / "progress.txt"))
    p.step(3, 10)
    assert (tmp_path / "progress.txt").read_text() == "Generation progress: 30.00%"
    p.step(10, 10)
    assert (tmp_path / "progress.txt").read_text() == "Generation progress: 100.00%"

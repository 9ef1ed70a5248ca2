"""Run-reproducibility callbacks: code snapshot, config snapshot, progress.

Rebuild of the reference's Lightning callbacks (reference:
threestudio/utils/callbacks.py:60-158) as plain functions -- this framework
has no Lightning; the pipeline driver calls them once at trial start and a
:class:`ProgressWriter` threads into fit() via its ``callback`` hook.

* :func:`save_code_snapshot` -- copy every git-tracked (+untracked,
  non-ignored) file into ``trial_dir/code`` (CodeSnapshotCallback:60-95);
* :func:`save_config_snapshot` -- raw yaml + parsed config dump into
  ``trial_dir/configs`` (ConfigSnapshotCallback:97-111);
* :class:`ProgressWriter` -- single-line overwrite-in-place progress file
  (ProgressCallback:121-158).
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import subprocess
from typing import Any, Optional

__all__ = ["save_code_snapshot", "save_config_snapshot", "ProgressWriter"]


def _git_file_list(repo_root: str):
    tracked = subprocess.check_output(
        ["git", "ls-files"], cwd=repo_root
    ).splitlines()
    untracked = subprocess.check_output(
        ["git", "ls-files", "--others", "--exclude-standard"], cwd=repo_root
    ).splitlines()
    return sorted({b.decode() for b in tracked} | {b.decode() for b in untracked})


def save_code_snapshot(save_dir: str, repo_root: Optional[str] = None) -> Optional[str]:
    """Copy the working tree's git-visible files into ``save_dir``; returns
    the dir, or None (with a warning) outside a git repository -- the same
    soft-fail as the reference (callbacks.py:88-94)."""
    repo_root = repo_root or os.getcwd()
    try:
        files = _git_file_list(repo_root)
    except (subprocess.CalledProcessError, FileNotFoundError):
        print("[callbacks] code snapshot skipped: not a git repository", flush=True)
        return None
    os.makedirs(save_dir, exist_ok=True)
    for f in files:
        src = os.path.join(repo_root, f)
        if not os.path.isfile(src):
            continue
        dst = os.path.join(save_dir, f)
        os.makedirs(os.path.dirname(dst) or save_dir, exist_ok=True)
        shutil.copyfile(src, dst)
    return save_dir


def save_config_snapshot(save_dir: str, config: Any,
                         config_path: Optional[str] = None) -> str:
    """Write parsed.yaml (the resolved config) and raw.yaml (the source
    file, when given)."""
    import yaml

    os.makedirs(save_dir, exist_ok=True)
    if dataclasses.is_dataclass(config) and not isinstance(config, type):
        parsed = dataclasses.asdict(config)
    elif isinstance(config, dict):
        parsed = config
    else:
        parsed = {k: v for k, v in vars(config).items() if not k.startswith("_")}
    with open(os.path.join(save_dir, "parsed.yaml"), "w") as f:
        yaml.safe_dump(parsed, f, default_flow_style=False, sort_keys=True)
    if config_path and os.path.exists(config_path):
        shutil.copyfile(config_path, os.path.join(save_dir, "raw.yaml"))
    return save_dir


class ProgressWriter:
    """Overwrite-in-place progress file; call :meth:`step` from a training
    callback (ProgressCallback's 'Generation progress: X%' contract)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def write(self, msg: str) -> None:
        with open(self.path, "w") as f:
            f.write(msg)

    def step(self, step: int, max_steps: int) -> None:
        self.write(f"Generation progress: {step / max(max_steps, 1) * 100:.2f}%")

"""Tile-coverage histogram of a stage-1 training checkpoint, for sizing the
rasterizer expansion-class budgets (splat/budgets.py classes_for).

The round-5 production run at 1024^2 training renders dropped 0.13-5.2M
tile instances per step at the round-4 budgets ((8,all),(32,cap/16),
(256,cap/256)) -- those were anchored at the 1024^2 RING over the final
densified cloud, but TRAINING renders mid-densification clouds whose big
splats cover far more tiles. This tool loads checkpoints, projects the
cloud at training cameras @1024^2, and prints the per-camera class-ladder
counts that budgets must cover (the CUDA reference sizes exactly via a
prefix sum, rasterizer_impl.cu:278-286; XLA needs static budgets).

Usage: python scripts/coverage_hist.py <save_dir> [steps...]
(save_dir = a stage-1 trial dir holding .ckpt_3dgs + the run's template)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

LADDER = (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def coverage_counts(st, cam, H=1024, W=1024):
    from garmentdreamer_tpu.splat.project import project_gaussians
    from garmentdreamer_tpu.splat.rasterize import TILE

    world_view, full_proj, camera_center, tanfov = (
        cam["world_view"], cam["full_proj"],
        cam["camera_center"], cam["tanfov"],
    )
    proj = project_gaussians(
        xyz=st.params.xyz, scaling=st.get_scaling(),
        rotation_q=st.params.rotation, opacity=st.get_opacity(),
        shs=st.get_features(), sh_degree=st.active_sh_degree,
        world_view=world_view, full_proj=full_proj,
        camera_center=camera_center, tanfovx=tanfov[0], tanfovy=tanfov[1],
        height=H, width=W,
    )
    tiles_x, tiles_y = W // TILE, H // TILE
    m2, rad = np.asarray(proj.means2d), np.asarray(proj.radii)
    r = rad.astype(np.float64)
    x0 = np.clip((m2[:, 0] - r) / TILE, 0, tiles_x).astype(np.int64)
    y0 = np.clip((m2[:, 1] - r) / TILE, 0, tiles_y).astype(np.int64)
    x1 = np.clip(np.ceil((m2[:, 0] + r + 1) / TILE), 0, tiles_x).astype(np.int64)
    y1 = np.clip(np.ceil((m2[:, 1] + r + 1) / TILE), 0, tiles_y).astype(np.int64)
    cov = np.where(rad > 0, (x1 - x0) * (y1 - y0), 0)
    return cov


def main():
    save_dir = sys.argv[1]
    steps = [int(s) for s in sys.argv[2:]] or None

    from garmentdreamer_tpu.core import checkpoint as ckpt
    from garmentdreamer_tpu.core.cameras import gs_camera_from_spherical
    from garmentdreamer_tpu.systems.gaussiandreamer import (
        GaussianDreamerConfig, GaussianDreamerSystem,
    )
    from garmentdreamer_tpu.data.cameras import RandomCameraConfig

    ckpt_dir = os.path.join(save_dir, ".ckpt_3dgs")
    tpl = None
    for cand in ("template.obj", "../template.obj"):
        p = os.path.join(save_dir, cand)
        if os.path.isfile(p):
            tpl = p
    tpl = tpl or os.environ.get("GD_TEMPLATE")
    assert tpl, "pass GD_TEMPLATE=<template.obj used by the run>"

    cfg = GaussianDreamerConfig()
    system = GaussianDreamerSystem(cfg, RandomCameraConfig())
    st = system.init_state(tpl)
    opt_state = system.init_optimizer(st)

    avail = sorted(
        int(d) for d in os.listdir(ckpt_dir)
        if d.isdigit()
    )
    steps = steps or avail
    for step in steps:
        tree = ckpt.restore_checkpoint(
            ckpt_dir,
            {"params": st.params, "stats": st.stats,
             "opt_state": opt_state, "step": 0},
            step=step,
        )
        st2 = st.replace(params=tree["params"], stats=tree["stats"])
        worst = np.zeros(len(LADDER) + 1, np.int64)
        worst_total = 0
        rs = np.random.RandomState(0)
        for i in range(8):
            cam = gs_camera_from_spherical(
                float(rs.uniform(-22, 70)), float(rs.uniform(0, 360)),
                float(rs.uniform(1.5, 4.0)), float(np.deg2rad(70.0)),
                1024, 1024,
            )
            cam_d = {k: jnp.asarray(v) for k, v in cam.as_arrays().items()}
            cov = coverage_counts(st2, cam_d)
            counts = []
            prev = 0
            for th in LADDER:
                counts.append(int(((cov > prev) & (cov <= th)).sum()))
                prev = th
            counts.append(int((cov > LADDER[-1]).sum()))
            worst = np.maximum(worst, counts)
            worst_total = max(worst_total, int(cov.sum()))
        print(json.dumps({
            "step": step,
            "ladder": list(LADDER),
            "worst_counts_per_bin": [int(c) for c in worst],
            "worst_total_instances": worst_total,
            "active": int(np.asarray(st2.stats.active).sum()),
        }), flush=True)


if __name__ == "__main__":
    main()

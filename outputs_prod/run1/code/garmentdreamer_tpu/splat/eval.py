"""Vanilla-3DGS render/eval harness: render held-out views, PSNR/SSIM/LPIPS.

Rebuild of the reference's standalone eval scripts (reference:
gaussiansplatting/render.py -- render train/test sets to renders/ + gt/;
gaussiansplatting/metrics.py:24-70 -- per-view SSIM/PSNR/LPIPS averaged into
results.json; full_eval.py -- train + render + metrics orchestration).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from garmentdreamer_tpu.splat import state as state_mod
from garmentdreamer_tpu.splat.metrics import psnr, ssim
from garmentdreamer_tpu.splat.render import render_view
from garmentdreamer_tpu.splat.scene import CameraInfo, SceneInfo, camera_stack

__all__ = ["render_set", "evaluate", "full_eval"]


def render_set(
    st: state_mod.GaussianState,
    cams: List[CameraInfo],
    out_dir: Optional[str] = None,
    bg: tuple = (0.0, 0.0, 0.0),
    max_per_tile: int = 256,
) -> np.ndarray:
    """Render every view -> (N, H, W, 3); optionally write renders/ + gt/
    pngs (render.py render_set layout)."""
    from garmentdreamer_tpu.core import io as gio
    from garmentdreamer_tpu.splat.budgets import classes_for, describe

    stack = camera_stack(cams)
    bg_arr = jnp.asarray(bg, jnp.float32)
    H, W = cams[0].height, cams[0].width
    classes = classes_for(H, W, st.capacity)

    @jax.jit
    def one(params, stats, cc):
        s = st.replace(params=params, stats=stats)
        out = render_view(
            s, cc, bg_arr, H, W, max_per_tile=max_per_tile,
            fast=True, payload_dtype="packed", classes=classes,
        )
        return out["render"], out["n_dropped"]

    outs = []
    total_dropped = 0
    for i in range(len(cams)):
        cc = {k: jnp.asarray(v[i]) for k, v in stack.items()}
        img, nd = one(st.params, st.stats, cc)
        outs.append(np.asarray(img))
        total_dropped += int(nd)
    if total_dropped:
        # metrics below would silently score truncated renders otherwise
        print(
            f"[render_set] WARNING: {total_dropped} instances dropped at "
            f"{describe(classes, st.capacity)}; metrics are computed on "
            "truncated renders -- raise the budgets",
            flush=True,
        )
    renders = np.stack(outs)
    if out_dir is not None:
        os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "gt"), exist_ok=True)
        for i, c in enumerate(cams):
            gio.save_rgb_png(
                os.path.join(out_dir, "renders", f"{i:05d}.png"), renders[i]
            )
            gio.save_rgb_png(os.path.join(out_dir, "gt", f"{i:05d}.png"), c.image)
    return renders


def evaluate(
    renders: np.ndarray,
    gts: np.ndarray,
    lpips_params=None,
    out_json: Optional[str] = None,
) -> Dict[str, float]:
    """Mean PSNR/SSIM (+ LPIPS when weights are supplied) over view pairs
    (metrics.py:24-70)."""
    ps, ss = [], []
    for r, g in zip(renders, gts):
        ps.append(float(psnr(jnp.asarray(r), jnp.asarray(g))))
        ss.append(float(ssim(jnp.asarray(r), jnp.asarray(g))))
    out = {"PSNR": float(np.mean(ps)), "SSIM": float(np.mean(ss))}
    if lpips_params is not None:
        from garmentdreamer_tpu.splat.lpips import lpips_distance

        ds = [
            float(lpips_distance(lpips_params, r[None], g[None])[0])
            for r, g in zip(renders, gts)
        ]
        out["LPIPS"] = float(np.mean(ds))
    if out_json is not None:
        os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
        with open(out_json, "w") as f:
            json.dump(out, f, indent=2)
    return out


def full_eval(
    scene: SceneInfo,
    out_dir: str,
    iterations: int = 7000,
    lpips_params=None,
    fit_cfg=None,
) -> Dict[str, float]:
    """Train on scene.train_cameras, render + score scene.test_cameras
    (full_eval.py orchestration on our photometric trainer)."""
    from garmentdreamer_tpu.splat.photometric import PhotometricConfig, fit_photometric

    pts = scene.points if scene.points is not None else np.random.RandomState(0).rand(10000, 3).astype(np.float32) * 2 - 1
    cols = scene.colors if scene.colors is not None else np.full_like(pts, 0.5)
    # the packed fast path's index packing supports < 2^20 gaussians
    # (rasterize.py _expand_classes); real COLMAP captures can exceed
    # 262k sparse points, so clamp the capacity and subsample the init cloud
    cap = 1 << int(np.ceil(np.log2(max(len(pts) * 4, 1024))))
    MAX_CAP = 1 << 19
    if cap > MAX_CAP:
        cap = MAX_CAP
        if len(pts) > MAX_CAP:
            print(
                f"[full_eval] init cloud has {len(pts)} points; subsampling "
                f"to {MAX_CAP} (packed-rasterizer capacity limit)",
                flush=True,
            )
            sel = np.random.RandomState(0).choice(len(pts), MAX_CAP, replace=False)
            pts, cols = pts[sel], cols[sel]
    st = state_mod.create_from_pcd(pts, cols, capacity=cap)

    cfg = fit_cfg or PhotometricConfig(iterations=iterations)
    cams = camera_stack(scene.train_cameras)
    targets = np.stack([c.image for c in scene.train_cameras])
    st, train_metrics = fit_photometric(st, cams, targets, cfg)

    eval_cams = scene.test_cameras or scene.train_cameras
    renders = render_set(st, eval_cams, out_dir=out_dir)
    gts = np.stack([c.image for c in eval_cams])
    metrics = evaluate(
        renders, gts, lpips_params, out_json=os.path.join(out_dir, "results.json")
    )
    metrics["train_PSNR"] = train_metrics.get("psnr", float("nan"))
    return metrics


def main(argv=None):
    """CLI: the reference's train.py + render.py + metrics.py in one pass
    (gaussiansplatting full_eval.py orchestration).

    Usage: python -m garmentdreamer_tpu.splat.eval <scene_dir> <out_dir>
           [--iterations N] [--eval] [--white-background] [--lpips-ckpt p.pth]
    """
    import argparse

    from garmentdreamer_tpu.splat.scene import load_scene

    ap = argparse.ArgumentParser(prog="garmentdreamer_tpu.splat.eval")
    ap.add_argument("scene_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--iterations", type=int, default=7000)
    ap.add_argument("--eval", action="store_true",
                    help="hold out every llffhold-th view (COLMAP) / the "
                    "test split (Blender)")
    ap.add_argument("--white-background", action="store_true")
    ap.add_argument("--lpips-ckpt", default=None,
                    help="lpips.LPIPS(net='vgg') torch state dict for LPIPS")
    a = ap.parse_args(argv)

    scene = load_scene(a.scene_dir, eval=a.eval,
                       white_background=a.white_background)
    lp = None
    if a.lpips_ckpt:
        import torch

        from garmentdreamer_tpu.splat.lpips import convert_lpips_torch

        lp = convert_lpips_torch(
            {k: v.numpy() for k, v in
             torch.load(a.lpips_ckpt, map_location="cpu").items()}
        )
    metrics = full_eval(scene, a.out_dir, iterations=a.iterations,
                        lpips_params=lp)
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()

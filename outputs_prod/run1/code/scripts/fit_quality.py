"""Quality-vs-cost profiles for stages 3/4 (VERDICT r3 next-3/next-9):

* texture fit: PSNR of the fitted texture vs a KNOWN ground-truth texture,
  across fit_pixel_budget x iteration-count -- justifies the production
  operating point instead of silently cutting the reference's 600 iters /
  full-image objective (reference fit: mesh_renderer.py:158-240);
* deformer: chamfer distance of the deformed template to a KNOWN target
  surface across iteration budgets (reference counts 3000+1000:
  deformation.py:143-357 / garment_deformer_configs.yml:7-9).

Targets are synthesized through OUR renderer from a ground-truth field/mesh,
so the metric measures exactly the optimization quality, not checkpoint
fidelity. One JSON line per cell.

Usage: python scripts/fit_quality.py [--skip fit,deformer]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garmentdreamer_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_stages import _sphere_obj  # noqa: E402  (same scripts/ dir)


def emit(rec):
    print(json.dumps(rec), flush=True)


class GTField:
    """Deterministic procedural albedo standing in for a trained texture."""

    def query(self, params, xyz):
        f = jnp.stack(
            [
                jnp.sin(6.0 * xyz[:, 0] + 2.0 * xyz[:, 2]),
                jnp.sin(5.0 * xyz[:, 1] - 3.0 * xyz[:, 0]),
                jnp.sin(4.0 * xyz[:, 2] + 4.0 * xyz[:, 1]),
            ],
            axis=-1,
        )
        return 0.5 + 0.45 * f


def fit_grid(H=1024, n_views=8, budgets=(16, 17), iter_counts=(300, 600),
             cells=None):
    """``cells`` (list of {lb, iters, cap}) overrides the budgets x iters
    product: lb = fit_pixel_budget log2 (0 = FULL image, the non-sampled
    oracle), cap = hashgrid_log2_size. Used by --oracle to locate the fit
    PSNR ceiling (VERDICT r4 next-8)."""
    from garmentdreamer_tpu.core import cameras as ccam, io as gio
    from garmentdreamer_tpu.data.cameras import RandomCameraConfig, test_ring_cameras
    from garmentdreamer_tpu.netf.renderer import render_textured
    from garmentdreamer_tpu.netf.trainer import NeTFConfig, NeTFTrainer

    tmp = tempfile.mkdtemp(prefix="fit_quality_")
    mesh_path = os.path.join(tmp, "final_mesh.obj")
    _sphere_obj(mesh_path, 160, 126)  # 40k faces: the decimation target

    dcfg = RandomCameraConfig(
        eval_height=H, eval_width=H,
        n_test_views_horizontal=n_views, n_test_views_vertical=1,
    )
    ring = test_ring_cameras(dcfg)
    os.makedirs(os.path.join(tmp, "gs_rendered_rgba"))
    entries = []
    for i in range(n_views):
        # placeholder content; overwritten with GT renders below
        gio.save_rgba_png(
            os.path.join(tmp, "gs_rendered_rgba", f"{i}.png"),
            np.zeros((H, H, 3), np.float32), np.ones((H, H), np.float32),
        )
        entries.append(ccam.camera_json_entry(
            i, ring["c2w"][i], float(ring["fovy"][i]), H, H))
    ccam.save_cameras_json(os.path.join(tmp, "cameras.json"), entries)

    cfg0 = NeTFConfig(fit_tex_iters=0, iters=0,
                      reconstruction_picked_views=tuple(range(n_views)))
    tr0 = NeTFTrainer(cfg0, mesh_path, tmp, os.path.join(tmp, "out"))
    views = tr0.load_views(tmp)
    gt = GTField()

    @jax.jit
    def render_gt(pose, proj):
        out = render_textured(
            None, tr0.verts, tr0.faces, pose, proj, H, H, gt,
            max_tiles_per_tri=cfg0.max_tiles_per_tri,
            max_per_tile=cfg0.max_per_tile,
        )
        return out["image"], out["alpha"][..., 0] > 0.5

    gt_imgs, gt_masks = [], []
    for i, v in enumerate(views):
        img, msk = render_gt(jnp.asarray(v["pose"]), jnp.asarray(v["proj"]))
        img, msk = np.asarray(img), np.asarray(msk)
        gt_imgs.append(img)
        gt_masks.append(msk)
        # stage-1 PNGs are y-down; the trainer flipuds them back
        gio.save_rgba_png(
            os.path.join(tmp, "gs_rendered_rgba", f"{i}.png"),
            np.flipud(img), np.flipud(msk.astype(np.float32)),
        )

    def psnr(field_obj, params):
        @jax.jit
        def render_fit(pose, proj, p):
            out = render_textured(
                p, tr0.verts, tr0.faces, pose, proj, H, H, field_obj,
                max_tiles_per_tri=cfg0.max_tiles_per_tri,
                max_per_tile=cfg0.max_per_tile,
            )
            return out["image"]

        errs, cnt = 0.0, 0
        for i, v in enumerate(views):
            img = np.asarray(render_fit(jnp.asarray(v["pose"]),
                                        jnp.asarray(v["proj"]), params))
            m = gt_masks[i]
            errs += float((((img - gt_imgs[i]) ** 2)[m]).sum())
            cnt += int(m.sum()) * 3
        mse = errs / max(cnt, 1)
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    if cells is None:
        cells = [{"lb": lb, "iters": it, "cap": 19}
                 for lb in budgets for it in iter_counts]
    for cell in cells:
        lb, iters, cap = cell["lb"], cell["iters"], cell.get("cap", 19)
        cfg = NeTFConfig(
            fit_tex_iters=iters, iters=0, fit_resolution=H,
            fit_pixel_budget=(1 << lb) if lb else 0,
            hashgrid_log2_size=cap,
            reconstruction_picked_views=tuple(range(n_views)),
        )
        tr = NeTFTrainer(cfg, mesh_path, tmp, os.path.join(tmp, "out"))
        t0 = time.perf_counter()
        tr.fit_texture(tmp, save=False)
        dt = time.perf_counter() - t0
        p = psnr(tr.field, tr.tex_params)
        emit({
            "name": "fit_quality", "H": H,
            "budget_log2": lb or f"full({H}^2)", "iters": iters,
            "cap_log2": cap, "psnr_db": round(p, 2), "fit_s": round(dt, 1),
            "ms_per_iter": round(dt / iters * 1e3, 1),
        })
    shutil.rmtree(tmp, ignore_errors=True)


def deformer_grid(
    H=1024,
    schedules=((750, 250), (1500, 500), (3000, 1000)),
    lrs=(1e-3,),
    n_train=8,
    n_holdout=4,
):
    """Chamfer + held-out mask-IoU vs iteration budget (VERDICT r4 next-4).

    The GT surface lives in the DRIVER's world frame (template verts through
    the same ``_adjust_and_scale`` permute+bound the driver applies,
    deformation.py:65-76 adjust_mesh), plus a smooth radial bump field --
    a garment-ish deformation the losses can represent. Targets are GT
    G-buffer renders at the train views; the final exported mesh (rotated
    -90deg about x, decimated, io.py:25-36) is un-rotated back into world
    frame before scoring. IoU is scored at ``n_holdout`` views the driver
    never saw."""
    from garmentdreamer_tpu.core import io as gio
    from garmentdreamer_tpu.deformer.driver import (
        DeformerConfig, _adjust_and_scale, deformation,
    )
    from bench_stages import _synth_views  # noqa: E402

    from garmentdreamer_tpu.meshops import LoadedView
    from garmentdreamer_tpu.meshops.mesh import vertex_normals as vn_fn
    from garmentdreamer_tpu.rast import gl_mvp, render_gbuffer

    tmp = tempfile.mkdtemp(prefix="deform_quality_")
    tpl = os.path.join(tmp, "tpl.obj")
    _sphere_obj(tpl, 120, 84)
    bound = 1.0

    obj = gio.load_obj(tpl)
    v_world = _adjust_and_scale(np.asarray(obj.vertices, np.float32), bound)
    faces = np.asarray(obj.faces, np.int32)
    # GT deformation in world frame: squash + low-frequency radial bulge
    v_gt = v_world.copy()
    v_gt[:, 1] *= 0.8
    v_gt[:, [0, 2]] *= 1.0 + 0.25 * np.sin(3.0 * v_gt[:, 1:2] * np.pi)

    n_views = n_train + n_holdout
    base_views = _synth_views(H, H, n_views)
    vn = vn_fn(jnp.asarray(v_gt), jnp.asarray(faces), v_gt.shape[0])

    @jax.jit
    def gbuf_gt(mvp):
        return render_gbuffer(
            jnp.asarray(v_gt), jnp.asarray(faces), vn, mvp, H, H, 32, 512
        )

    gt_views, gt_masks, mvps_all = [], [], []
    for v in base_views:
        mvp = jnp.asarray(gl_mvp(v.K, v.R, v.t, H, H, 0.1, 100.0))
        mvps_all.append(mvp)
        g = gbuf_gt(mvp)
        mask = np.asarray(g["mask"])
        nrm = np.asarray(g["normal"])
        gt_masks.append(mask[..., 0] > 0.5)
        gt_views.append(LoadedView(
            K=v.K, R=v.R, t=v.t,
            normal=(nrm + 1.0) / 2.0, mask=mask,
            rgb=np.broadcast_to(((nrm + 1.0) / 2.0), nrm.shape).copy(),
        ))
    train_views = gt_views[:n_train]

    def score(path):
        m = gio.load_obj(path)
        # final_mesh.obj is world-frame rotated -90deg about x: undo it
        ang = np.radians(90.0)
        rx = np.array([
            [1, 0, 0],
            [0, np.cos(ang), -np.sin(ang)],
            [0, np.sin(ang), np.cos(ang)],
        ], np.float32)
        a_v = np.asarray(m.vertices, np.float32) @ rx.T
        a_f = np.asarray(m.faces, np.int32)

        from scipy.spatial import cKDTree

        rs = np.random.RandomState(0)
        a = a_v[rs.choice(len(a_v), min(len(a_v), 20000), replace=False)]
        b2 = v_gt[rs.choice(len(v_gt), min(len(v_gt), 20000), replace=False)]
        cham = float(cKDTree(b2).query(a)[0].mean()
                     + cKDTree(a).query(b2)[0].mean())

        a_vn = vn_fn(jnp.asarray(a_v), jnp.asarray(a_f), a_v.shape[0])

        @jax.jit
        def gbuf_fit(mvp):
            return render_gbuffer(
                jnp.asarray(a_v), jnp.asarray(a_f), a_vn, mvp, H, H, 32, 512
            )

        ious = []
        for i in range(n_train, n_views):  # held-out views only
            mk = np.asarray(gbuf_fit(mvps_all[i])["mask"])[..., 0] > 0.5
            gt = gt_masks[i]
            ious.append((mk & gt).sum() / max((mk | gt).sum(), 1))
        return cham, float(np.mean(ious))

    for lr in lrs:
        for it1, it2 in schedules:
            cfg = DeformerConfig(
                iterations_first=it1, iterations_second=it2,
                upsample_iterations=(), save_frequency=0,
                lr_vertices=lr,
                picked_views_first=(0, n_train),
                picked_views_second=tuple(range(n_train)),
            )
            t0 = time.perf_counter()
            out = deformation(
                tmp, tpl, bound, cfg,
                output_dir=os.path.join(tmp, f"out_{it1}_{it2}_{lr}"),
                views=train_views,
            )
            dt = time.perf_counter() - t0
            cham, iou = score(out)
            emit({
                "name": "deformer_quality", "iters": [it1, it2],
                "lr_vertices": lr, "chamfer": round(cham, 5),
                "holdout_mask_iou": round(iou, 4), "wall_s": round(dt, 1),
            })
    shutil.rmtree(tmp, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma list: fit,deformer")
    # 2^18 @1024^2 exceeds the 16 GB chip's memory headroom and crashes the
    # TPU worker mid-grid -- keep it out of the default sweep
    ap.add_argument("--budgets", default="16,17",
                    help="fit pixel budgets (log2), comma list")
    ap.add_argument("--fit-iters", default="300,600",
                    help="fit iteration counts, comma list")
    ap.add_argument("--schedules", default="750:250,1500:500,3000:1000",
                    help="deformer it1:it2 schedules, comma list")
    ap.add_argument("--lrs", default="0.001",
                    help="deformer lr_vertices cells, comma list")
    ap.add_argument(
        "--oracle", action="store_true",
        help="fit-PSNR ceiling probes instead of the default grid "
        "(VERDICT r4 next-8): capacity x iteration probes at 1024^2, plus "
        "the FULL-pixel non-sampled oracle at 512^2 (full-pixel at 1024^2 "
        "is the budget that crashed the chip)",
    )
    a = ap.parse_args()
    skip = set(filter(None, a.skip.split(",")))
    if a.oracle:
        fit_grid(H=1024, cells=[
            {"lb": 17, "iters": 600, "cap": 19},   # production anchor
            {"lb": 17, "iters": 600, "cap": 20},   # capacity probe
            {"lb": 17, "iters": 1800, "cap": 19},  # iteration probe
        ])
        fit_grid(H=512, cells=[
            {"lb": 17, "iters": 600, "cap": 19},   # sampled ref @512
            {"lb": 0, "iters": 600, "cap": 19},    # full-pixel oracle
            {"lb": 0, "iters": 600, "cap": 20},    # full-pixel + 2x capacity
        ])
        return
    if "fit" not in skip:
        fit_grid(budgets=tuple(int(x) for x in a.budgets.split(",")),
                 iter_counts=tuple(int(x) for x in a.fit_iters.split(",")))
    if "deformer" not in skip:
        deformer_grid(
            schedules=tuple(
                tuple(int(x) for x in s.split(":"))
                for s in a.schedules.split(",")
            ),
            lrs=tuple(float(x) for x in a.lrs.split(",")),
        )


if __name__ == "__main__":
    main()

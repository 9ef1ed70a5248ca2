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


def fit_grid(H=1024, n_views=8, budgets=(16, 17), iter_counts=(300, 600)):
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

    for lb in budgets:
        for iters in iter_counts:
            cfg = NeTFConfig(
                fit_tex_iters=iters, iters=0, fit_pixel_budget=1 << lb,
                reconstruction_picked_views=tuple(range(n_views)),
            )
            tr = NeTFTrainer(cfg, mesh_path, tmp, os.path.join(tmp, "out"))
            t0 = time.perf_counter()
            tr.fit_texture(tmp, save=False)
            dt = time.perf_counter() - t0
            p = psnr(tr.field, tr.tex_params)
            emit({
                "name": "fit_quality", "budget_log2": lb, "iters": iters,
                "psnr_db": round(p, 2), "fit_s": round(dt, 1),
                "ms_per_iter": round(dt / iters * 1e3, 1),
            })
    shutil.rmtree(tmp, ignore_errors=True)


def deformer_grid(H=1024, schedules=((1500, 500), (3000, 1000))):
    from garmentdreamer_tpu.core import io as gio
    from garmentdreamer_tpu.deformer.driver import DeformerConfig, deformation
    from bench_stages import _synth_views  # noqa: E402

    from garmentdreamer_tpu.meshops import LoadedView
    from garmentdreamer_tpu.meshops.mesh import vertex_normals as vn_fn
    from garmentdreamer_tpu.rast import gl_mvp, render_gbuffer

    tmp = tempfile.mkdtemp(prefix="deform_quality_")
    tpl = os.path.join(tmp, "tpl.obj")
    _sphere_obj(tpl, 120, 84)

    # ground-truth surface: the template squashed + bulged (a garment-ish
    # deformation well inside what the losses can represent)
    obj = gio.load_obj(tpl)
    v_gt = np.asarray(obj.vertices, np.float32).copy()
    v_gt[:, 1] *= 0.8
    v_gt[:, [0, 2]] *= (1.0 + 0.25 * np.sin(3.0 * v_gt[:, 1:2] * np.pi)) \
        .repeat(2, axis=1)
    faces = np.asarray(obj.faces, np.int32)

    # render GT masks+normals as the deformation targets through OUR
    # G-buffer renderer at the views the driver will use
    base_views = _synth_views(H, H, 8)
    gt_views = []
    vn = vn_fn(jnp.asarray(v_gt), jnp.asarray(faces), v_gt.shape[0])

    @jax.jit
    def gbuf(mvp):
        return render_gbuffer(
            jnp.asarray(v_gt), jnp.asarray(faces), vn, mvp, H, H, 32, 512
        )

    for v in base_views:
        mvp = jnp.asarray(gl_mvp(v.K, v.R, v.t, H, H, 0.1, 100.0))
        g = gbuf(mvp)
        mask = np.asarray(g["mask"])
        nrm = np.asarray(g["normal"])
        gt_views.append(LoadedView(
            K=v.K, R=v.R, t=v.t,
            normal=(nrm + 1.0) / 2.0, mask=mask,
            rgb=np.broadcast_to(((nrm + 1.0) / 2.0), nrm.shape).copy(),
        ))

    def chamfer(path):
        m = gio.load_obj(path)
        a = np.asarray(m.vertices, np.float32)
        b = v_gt
        # subsample for the host kd-tree
        from scipy.spatial import cKDTree

        rs = np.random.RandomState(0)
        a = a[rs.choice(len(a), min(len(a), 20000), replace=False)]
        b2 = b[rs.choice(len(b), min(len(b), 20000), replace=False)]
        d1 = cKDTree(b2).query(a)[0].mean()
        d2 = cKDTree(a).query(b2)[0].mean()
        return float(d1 + d2)

    for it1, it2 in schedules:
        cfg = DeformerConfig(
            iterations_first=it1, iterations_second=it2,
            upsample_iterations=(), save_frequency=0,
            picked_views_first=(0, len(gt_views)),
            picked_views_second=tuple(range(len(gt_views))),
        )
        t0 = time.perf_counter()
        out = deformation(tmp, tpl, 1.0, cfg,
                          output_dir=os.path.join(tmp, f"out_{it1}_{it2}"),
                          views=gt_views)
        dt = time.perf_counter() - t0
        emit({
            "name": "deformer_quality", "iters": [it1, it2],
            "chamfer": round(chamfer(out), 5), "wall_s": round(dt, 1),
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
    ap.add_argument("--schedules", default="1500:500,3000:1000",
                    help="deformer it1:it2 schedules, comma list")
    a = ap.parse_args()
    skip = set(filter(None, a.skip.split(",")))
    if "fit" not in skip:
        fit_grid(budgets=tuple(int(x) for x in a.budgets.split(",")),
                 iter_counts=tuple(int(x) for x in a.fit_iters.split(",")))
    if "deformer" not in skip:
        deformer_grid(schedules=tuple(
            tuple(int(x) for x in s.split(":")) for s in a.schedules.split(",")
        ))


if __name__ == "__main__":
    main()

"""Strip-sharded deformer step (deformer/strips.py; VERDICT r4 next-1/next-9):
the per-strip render must tile the full-image G-buffer exactly, and the
shard_map'd two-stage driver must reproduce the single-device driver's
results to float tolerance on the 8-device CPU mesh."""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def bumpy_tube(n_t=14, n_z=9, seed=0):
    t = np.linspace(0, 2 * np.pi, n_t, endpoint=False)
    zz = np.linspace(-0.85, 0.85, n_z)
    rs = np.random.RandomState(seed)
    verts, faces = [], []
    for z in zz:
        for a in t:
            r = 0.75 + 0.1 * rs.uniform(-1, 1)
            verts.append((r * np.cos(a), r * np.sin(a), z))
    for i in range(n_z - 1):
        for j in range(n_t):
            a_, b_ = i * n_t + j, i * n_t + (j + 1) % n_t
            c_, d_ = (i + 1) * n_t + j, (i + 1) * n_t + (j + 1) % n_t
            faces.append((a_, b_, d_))
            faces.append((a_, d_, c_))
    return np.array(verts, np.float32), np.array(faces, np.int32)


class TestStripRender:
    @pytest.mark.parametrize("n_strips", [2, 8])
    def test_strips_tile_full_gbuffer(self, n_strips):
        """vmap over strip index with the strip axis named: assembled inner
        rows == the whole-image render (halo rows carry the cross-strip
        antialiasing neighbors, so this includes AA'd channels)."""
        from garmentdreamer_tpu.deformer.strips import (
            AXIS, render_gbuffer_strip,
        )
        from garmentdreamer_tpu.meshops import build_topology, vertex_normals
        from garmentdreamer_tpu.rast import gl_mvp, render_gbuffer

        H = W = 64
        verts, faces_np = bumpy_tube()
        V = verts.shape[0]
        K = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]], np.float32)
        R = np.eye(3, dtype=np.float32)
        t = np.array([0, 0, 3.0], np.float32)
        mvp = jnp.asarray(gl_mvp(K, R, t, H, W, 1.0, 6.0))

        vd = jnp.asarray(verts)
        fd = jnp.asarray(faces_np)
        vn = vertex_normals(vd, fd, V)

        full = render_gbuffer(vd, fd, vn, mvp, H, W, 16, 128)

        def one(k):
            return render_gbuffer_strip(vd, fd, vn, mvp, k, H, W, n_strips,
                                        16, 128)

        parts = jax.vmap(one, axis_name=AXIS)(jnp.arange(n_strips))
        for key in ("mask", "position", "normal"):
            tiled = jnp.concatenate(list(parts[key]), axis=0)
            np.testing.assert_allclose(
                np.asarray(tiled), np.asarray(full[key]), atol=1e-4,
                err_msg=f"{key} strips != full render",
            )
        # coverage (integer face choice) must agree on every pixel too
        fid = jnp.concatenate(list(parts["face_id"]), axis=0)
        assert (np.asarray(fid >= 0) == np.asarray(full.get("face_id") >= 0)).all()


def _write_artifacts(tmp_path, H=64, W=64, n_views=4):
    from PIL import Image

    from garmentdreamer_tpu.core import cameras as cc
    from garmentdreamer_tpu.core.cameras import camera_json_entry

    (tmp_path / "gs_rendered_rgba").mkdir()
    (tmp_path / "estimated_normals").mkdir()
    cams = []
    for i in range(n_views):
        pos = cc.spherical_positions(
            np.array([10.0]), np.array([i * 360.0 / n_views]), np.array([3.0])
        )
        c2w = cc.lookat_c2w(pos)[0]
        cams.append(camera_json_entry(i, c2w, 70.0, H, W))
        rgba = np.zeros((H, W, 4), np.uint8)
        rgba[10:54, 14:50] = [140, 110, 90, 255]
        Image.fromarray(rgba, "RGBA").save(
            tmp_path / "gs_rendered_rgba" / f"{i}.png"
        )
        nrm = np.full((H, W, 4), 128, np.uint8)
        nrm[..., 3] = rgba[..., 3]
        Image.fromarray(nrm, "RGBA").save(
            tmp_path / "estimated_normals" / f"{i}.png"
        )
    with open(tmp_path / "cameras.json", "w") as f:
        json.dump(cams, f)


@pytest.mark.slow
class TestStripDriverParity:
    def test_two_stage_parity_8_strips(self, tmp_path):
        """Full driver, 8-device CPU mesh vs single device. Shading weight 0
        isolates the only stochastic difference (per-strip sample sets), so
        everything else -- both stages, visibility, hole mask, enhanced
        normal loss, regularizer exemption -- must agree to float tolerance.
        """
        from garmentdreamer_tpu.core import io as gio
        from garmentdreamer_tpu.deformer import DeformerConfig, deformation

        verts, faces_np = bumpy_tube()
        tpl = tmp_path / "template.obj"
        gio.save_obj(str(tpl), gio.ObjMesh(vertices=verts, faces=faces_np))
        _write_artifacts(tmp_path)

        kw = dict(
            iterations_first=2, iterations_second=2,
            upsample_iterations=(), picked_views_first=(0, 4),
            picked_views_second=(0, 1, 2, 3), shading_samples=512,
            weight_shading=0.0, save_frequency=0,
            max_per_tile=128, max_tiles_per_tri=16, scan_chunk=2,
        )
        out1 = deformation(
            str(tmp_path), str(tpl), bound=1.75, cfg=DeformerConfig(**kw),
            output_dir=str(tmp_path / "d1"),
        )
        v1 = gio.load_obj(out1).vertices
        out8 = deformation(
            str(tmp_path), str(tpl), bound=1.75, cfg=DeformerConfig(**kw),
            output_dir=str(tmp_path / "d8"), mesh_devices=8,
        )
        v8 = gio.load_obj(out8).vertices
        assert v1.shape == v8.shape
        np.testing.assert_allclose(v8, v1, atol=5e-5)

    def test_with_shading_runs_and_is_finite(self, tmp_path):
        """Shading on: per-strip stratified sampling differs from the
        single-device sample set by design; the sharded run must still be
        finite and produce a valid mesh."""
        from garmentdreamer_tpu.core import io as gio
        from garmentdreamer_tpu.deformer import DeformerConfig, deformation

        verts, faces_np = bumpy_tube()
        tpl = tmp_path / "template.obj"
        gio.save_obj(str(tpl), gio.ObjMesh(vertices=verts, faces=faces_np))
        _write_artifacts(tmp_path)

        cfg = DeformerConfig(
            iterations_first=1, iterations_second=2,
            upsample_iterations=(), picked_views_first=(0, 4),
            picked_views_second=(0, 1, 2, 3), shading_samples=512,
            save_frequency=0, max_per_tile=128, max_tiles_per_tri=16,
            scan_chunk=2,
        )
        out = deformation(
            str(tmp_path), str(tpl), bound=1.75, cfg=cfg,
            output_dir=str(tmp_path / "d8s"), mesh_devices=8,
        )
        v = gio.load_obj(out).vertices
        assert np.isfinite(v).all() and v.shape[0] > 0

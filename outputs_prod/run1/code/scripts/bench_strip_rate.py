"""Real-chip per-strip step rates for the intra-step-sharded stages
(VERDICT r4 next-1 'done' criterion): the deformer stage-1/stage-2 step and
the texture-fit step, each timed at FULL single-device geometry and at
ONE-STRIP-OF-8 geometry on the same chip.

Only one real chip is attached, so the 8-chip step latency is projected as
  t_8chip ~= t_strip + t_psum
where t_strip is measured here (the per-device slice of the pixel work plus
the replicated per-vertex work, run through the same vmap(axis_name) code
path the shard_map body uses -- psum over the size-1 axis is an identity)
and t_psum is the ICI all-reduce of the vertex-offset/shader grads
(~120 KB + ~30 KB at the 10k-vert template: sub-ms on v5e ICI, well under
measurement noise). Numerical parity of the 8-way split is pinned
separately by tests/test_deformer_strips.py and dryrun_multichip on the
virtual 8-CPU mesh.

One JSON line per cell. Reference loops being sharded:
deformation.py:169-357 (stage 3), netf/trainer.py:158-262 fit (stage 4).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garmentdreamer_tpu.core.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from bench_stages import _sphere_obj, _synth_views  # noqa: E402

H = W = int(os.environ.get("GD_BENCH_H", "1024"))  # small H = CPU smoke test
S = 8
CH = int(os.environ.get("GD_BENCH_CH", "25"))  # scan length per timed program


def emit(name, ms, **extra):
    print(json.dumps({"metric": name, "ms_per_iter": round(ms, 1), **extra}),
          flush=True)


def _time_scan(run, carry, xs):
    out = run(carry, xs)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
    t0 = time.perf_counter()
    out = run(carry, xs)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).sum()
    return (time.perf_counter() - t0) / CH * 1e3


def main():
    import tempfile

    from garmentdreamer_tpu.core import io as gio
    from garmentdreamer_tpu.deformer.strips import (
        AXIS, render_gbuffer_strip, strip_hole_mask_loss, strip_mask_loss,
        strip_normal_map_loss_enhanced, strip_shading_inputs,
    )
    from garmentdreamer_tpu.deformer.driver import DeformerConfig, _adjust_and_scale
    from garmentdreamer_tpu.meshops import (
        NeuralShader, build_topology, laplacian_loss, normal_consistency_loss,
        vertex_normals,
    )
    from garmentdreamer_tpu.rast import gl_mvp, render_gbuffer

    cfg = DeformerConfig()
    tmp = tempfile.mkdtemp(prefix="strip_rate_")
    tpl = os.path.join(tmp, "tpl.obj")
    _sphere_obj(tpl, 120, 84)
    obj = gio.load_obj(tpl)
    v0 = jnp.asarray(_adjust_and_scale(np.asarray(obj.vertices, np.float32), 1.0))
    faces_np = np.asarray(obj.faces, np.int32)
    faces = jnp.asarray(faces_np)
    V = int(v0.shape[0])
    topo = build_topology(faces_np, V)
    edges = jnp.asarray(topo.edges)
    degree = jnp.asarray(topo.degree)
    connected = jnp.asarray(topo.connected_faces)

    views = _synth_views(H, W, 4)
    mvps = jnp.asarray(np.stack([
        gl_mvp(v.K, v.R, v.t, H, W, 0.5, 10.0) for v in views
    ]))
    Rs = jnp.asarray(np.stack([v.R for v in views]).astype(np.float32))
    centers = jnp.asarray(np.stack([v.center for v in views]).astype(np.float32))
    masks = jnp.asarray(np.stack([v.mask for v in views]))
    normals = jnp.asarray(np.stack([v.normal for v in views]))
    rgbs = jnp.asarray(np.stack([v.rgb for v in views]))
    hs = H // S

    w_mask1, w_nc1, w_lap1 = cfg.first_stage_weights
    vertex_opt = optax.adam(cfg.lr_vertices)
    vis_seq = jnp.zeros((CH,), jnp.int32)  # view 0 every step (steady-state)

    # ---------------- stage-1-like step: full vs strip ----------------
    def make_stage1(strip: bool):
        def body(carry, vi):
            off, ostate = carry
            mvp = mvps[vi]

            def loss_fn(off_):
                verts = v0 + off_
                vn = vertex_normals(verts, faces, V)
                if strip:
                    k = jax.lax.axis_index(AXIS)
                    g = render_gbuffer_strip(
                        verts, faces, vn, mvp, k + 3, H, W, S,
                        cfg.max_tiles_per_tri, cfg.max_per_tile,
                    )
                    tgt = jax.lax.dynamic_slice_in_dim(
                        masks[vi], (k + 3) * hs, hs
                    )
                    l_mask = strip_mask_loss(tgt, g["mask"], H, W)
                    scale = 1.0 / S
                else:
                    g = render_gbuffer(
                        verts, faces, vn, mvp, H, W,
                        cfg.max_tiles_per_tri, cfg.max_per_tile,
                    )
                    l_mask = jnp.mean((masks[vi] - g["mask"]) ** 2)
                    scale = 1.0
                l_reg = (
                    w_nc1 * normal_consistency_loss(verts, faces, connected)
                    + w_lap1 * laplacian_loss(verts, edges, degree)
                ) * scale
                return w_mask1 * l_mask + l_reg

            loss, grad = jax.value_and_grad(loss_fn)(off)
            grad = jax.lax.psum(grad, AXIS) if strip else grad
            updates, ostate = vertex_opt.update(grad, ostate)
            return (optax.apply_updates(off, updates), ostate), loss

        def core(off, ostate, vis):
            return jax.lax.scan(body, (off, ostate), vis)

        if strip:
            def run(carry, xs):
                off, ostate = carry
                out = jax.vmap(
                    lambda _: core(off, ostate, xs), axis_name=AXIS
                )(jnp.arange(1))
                return out

            return jax.jit(run)
        return jax.jit(lambda carry, xs: core(carry[0], carry[1], xs))

    off0 = jnp.zeros((V, 3), jnp.float32)
    ostate0 = vertex_opt.init(off0)
    ms_full = _time_scan(make_stage1(False), (off0, ostate0), vis_seq)
    emit("stage3_stage1_ms_full_1024", ms_full)
    ms_strip = _time_scan(make_stage1(True), (off0, ostate0), vis_seq)
    emit("stage3_stage1_ms_strip8_1024", ms_strip,
         speedup=round(ms_full / ms_strip, 2))

    # ---------------- stage-2-like step: full vs strip ----------------
    shader = NeuralShader()
    sh_params = shader.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 3)),
        jnp.zeros((1, 3)),
    )
    shader_opt = optax.adam(cfg.lr_shader)
    sh_state0 = shader_opt.init(sh_params)
    w2 = {
        "hole_mask": cfg.weight_hole_mask, "mask": cfg.weight_mask,
        "normal_consistency": cfg.weight_normal_consistency,
        "laplacian": cfg.weight_laplacian, "normal": cfg.weight_normal,
        "shading": cfg.weight_shading,
    }
    rf_vn = vertex_normals(v0, faces, V)
    keys = jax.random.split(jax.random.PRNGKey(1), CH)

    def make_stage2(strip: bool):
        ns = max(1, cfg.shading_samples // (S if strip else 1))

        def rf_gbuf(mvp, k=None):
            if strip:
                g = render_gbuffer_strip(
                    v0, faces, rf_vn, mvp, k + 3, H, W, S,
                    cfg.max_tiles_per_tri, cfg.max_per_tile,
                )
            else:
                g = render_gbuffer(
                    v0, faces, rf_vn, mvp, H, W,
                    cfg.max_tiles_per_tri, cfg.max_per_tile,
                )
            return {kk: jax.lax.stop_gradient(g[kk])
                    for kk in ("mask", "position", "normal")}

        def body(carry, xs):
            off, sp, so = carry
            vi, key = xs
            mvp, cam_R, cam_c = mvps[vi], Rs[vi], centers[vi]

            if strip:
                k = jax.lax.axis_index(AXIS)
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, (k + 3) * hs, hs)
                t_mask, t_nrm, t_rgb = sl(masks[vi]), sl(normals[vi]), sl(rgbs[vi])
                g_rf = rf_gbuf(mvp, k)
            else:
                t_mask, t_nrm, t_rgb = masks[vi], normals[vi], rgbs[vi]
                g_rf = rf_gbuf(mvp)

            def loss_fn(off_, sp_):
                verts = v0 + off_
                vn = vertex_normals(verts, faces, V)
                if strip:
                    k2 = jax.lax.axis_index(AXIS)
                    g = render_gbuffer_strip(
                        verts, faces, vn, mvp, k2 + 3, H, W, S,
                        cfg.max_tiles_per_tri, cfg.max_per_tile,
                    )
                    l = {
                        "hole_mask": strip_hole_mask_loss(g, g_rf, cam_R, cam_c),
                        "mask": strip_mask_loss(t_mask, g["mask"], H, W),
                        "normal": strip_normal_map_loss_enhanced(
                            t_nrm, t_mask, g, cam_R, cam_c),
                    }
                    si = strip_shading_inputs(
                        t_rgb, t_mask, g, cam_R, cam_c, key, k2, ns,
                        cfg.shading_percentage,
                    )
                    pred = shader.apply(sp_, si.position, si.normal, si.view_dir)
                    l["shading"] = jnp.sum(
                        jnp.abs(pred - si.target_rgb) * si.weight[:, None]
                    ) / (si.denom * 3)
                    scale = 1.0 / S
                else:
                    # single-device equivalents via the strip functions with
                    # a size-1 axis would be identical; use the same forms
                    # at full height through a 1-strip call
                    g = render_gbuffer(
                        verts, faces, vn, mvp, H, W,
                        cfg.max_tiles_per_tri, cfg.max_per_tile,
                    )
                    l = {
                        "hole_mask": strip_hole_mask_loss(g, g_rf, cam_R, cam_c),
                        "mask": strip_mask_loss(t_mask, g["mask"], H, W),
                        "normal": strip_normal_map_loss_enhanced(
                            t_nrm, t_mask, g, cam_R, cam_c),
                    }
                    si = strip_shading_inputs(
                        t_rgb, t_mask, g, cam_R, cam_c, key, 0, ns,
                        cfg.shading_percentage,
                    )
                    pred = shader.apply(sp_, si.position, si.normal, si.view_dir)
                    l["shading"] = jnp.sum(
                        jnp.abs(pred - si.target_rgb) * si.weight[:, None]
                    ) / (si.denom * 3)
                    scale = 1.0
                l["normal_consistency"] = normal_consistency_loss(
                    verts, faces, connected) * scale
                l["laplacian"] = laplacian_loss(verts, edges, degree) * scale
                return sum(w2[kk] * vv for kk, vv in l.items())

            loss, grads = jax.value_and_grad(loss_fn, (0, 1))(off, sp)
            g_off, g_sh = grads
            if strip:
                g_off = jax.lax.psum(g_off, AXIS)
                g_sh = jax.lax.psum(g_sh, AXIS)
            upd = -cfg.lr_vertices * g_off / (jnp.abs(g_off) + 1e-8)
            off = off + upd
            sh_up, so = shader_opt.update(g_sh, so)
            return (off, optax.apply_updates(sp, sh_up), so), loss

        def core(off, sp, so, xs):
            return jax.lax.scan(body, (off, sp, so), xs)

        # both variants run under a size-1 named axis: the strip losses
        # psum their global denominators over AXIS (identity at size 1)
        def run(carry, xs):
            off, sp, so = carry
            return jax.vmap(
                lambda _: core(off, sp, so, xs), axis_name=AXIS
            )(jnp.arange(1))

        return jax.jit(run)

    xs2 = (vis_seq, keys)
    ms_full2 = _time_scan(make_stage2(False), (off0, sh_params, sh_state0), xs2)
    emit("stage3_stage2_ms_full_1024", ms_full2)
    ms_strip2 = _time_scan(make_stage2(True), (off0, sh_params, sh_state0), xs2)
    emit("stage3_stage2_ms_strip8_1024", ms_strip2,
         speedup=round(ms_full2 / ms_strip2, 2))

    it1, it2 = 3000, 1000
    print(json.dumps({
        "metric": "stage3_4000_iters_s",
        "single_chip_s": round((ms_full * it1 + ms_full2 * it2) / 1e3, 1),
        "projected_8strip_s": round((ms_strip * it1 + ms_strip2 * it2) / 1e3, 1),
    }), flush=True)

    # ---------------- stage-4 fit step: full budget vs 1/8 slice ----------
    from garmentdreamer_tpu.netf.renderer import TextureField, clean_mesh

    mesh_path = os.path.join(tmp, "final.obj")
    _sphere_obj(mesh_path, 160, 126)  # 40k faces
    obj4 = gio.load_obj(mesh_path)
    v4, f4 = clean_mesh(np.asarray(obj4.vertices, np.float32),
                        np.asarray(obj4.faces, np.int32))
    field = TextureField(jax.random.PRNGKey(0))
    tex_params = field.params
    opt4 = optax.adam(1e-2)
    n_pix = H * W
    views4 = _synth_views(H, W, 2)
    mvp4 = jnp.asarray(gl_mvp(views4[0].K, views4[0].R, views4[0].t,
                              H, W, 0.5, 10.0))
    vn4 = vertex_normals(jnp.asarray(v4), jnp.asarray(f4), v4.shape[0])
    g4 = render_gbuffer(jnp.asarray(v4), jnp.asarray(f4), vn4, mvp4, H, W,
                        32, 512)
    xyz = g4["position"].reshape(1, n_pix, 3)
    ok = (g4["mask"][..., 0] > 0).reshape(1, n_pix)
    tgt = jnp.clip(g4["normal"] * 0.5 + 0.5, 0, 1).reshape(1, n_pix, 3)
    fkeys = jax.random.split(jax.random.PRNGKey(5), CH)

    def make_fit(Qs: int, sharded: bool):
        def body(carry, xs):
            p, o = carry
            vi, key = xs
            pix = jax.random.randint(key, (1 << 17,), 0, n_pix)
            if sharded:
                k = jax.lax.axis_index("pix")
                pix = jax.lax.dynamic_slice_in_dim(pix, k * Qs, Qs)
            else:
                pix = pix[:Qs]
            xyz_s = xyz[vi, pix]
            m = ok[vi, pix]
            t_s = tgt[vi, pix]

            def loss_fn(tp):
                albedo = field.query(tp, xyz_s)
                cnt = jnp.sum(m)
                if sharded:
                    cnt = jax.lax.psum(cnt, "pix")
                denom = jnp.maximum(cnt, 1) * 3
                return jnp.sum(
                    jnp.where(m[:, None], (albedo - t_s) ** 2, 0.0)) / denom

            loss, grads = jax.value_and_grad(loss_fn)(p)
            if sharded:
                grads = jax.lax.psum(grads, "pix")
            updates, o = opt4.update(grads, o)
            return (optax.apply_updates(p, updates), o), loss

        def core(p, o, xs):
            return jax.lax.scan(body, (p, o), xs)

        if sharded:
            def run(carry, xs):
                p, o = carry
                return jax.vmap(
                    lambda _: core(p, o, xs), axis_name="pix"
                )(jnp.arange(1))

            return jax.jit(run)
        return jax.jit(lambda c, xs: core(c[0], c[1], xs))

    xs4 = (jnp.zeros((CH,), jnp.int32), fkeys)
    o40 = opt4.init(tex_params)
    ms_fit_full = _time_scan(make_fit(1 << 17, False), (tex_params, o40), xs4)
    emit("stage4_fit_ms_full_2e17", ms_fit_full)
    ms_fit_strip = _time_scan(make_fit(1 << 14, True), (tex_params, o40), xs4)
    emit("stage4_fit_ms_strip8_2e14", ms_fit_strip,
         speedup=round(ms_fit_full / ms_fit_strip, 2))
    print(json.dumps({
        "metric": "stage4_fit_600_iters_s",
        "single_chip_s": round(ms_fit_full * 600 / 1e3, 1),
        "projected_8shard_s": round(ms_fit_strip * 600 / 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()

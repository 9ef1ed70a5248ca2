"""Stage-3 deformation driver: optimize per-vertex offsets of the garment
template so its rendered masks/normals match the stage-1 splat renders and
stage-2 estimated normals.

TPU-native rebuild of the reference two-stage loop
(reference: Garment_Deformer_NeTF/deformation.py:41-419; config defaults
configs/garment_deformer_configs.yml). Structure preserved:

* template axis permute (z,x,y) and x ``bound`` scale
  (deformer/tools/adjust_mesh.py:4-23);
* AABB -> 2-cube space normalization of mesh AND views (deformation.py:103-111,
  SpaceNormalization);
* near/far from normalized AABB corner distances, epsilon 0.5
  (deformation.py:115, renderer.py:21-34);
* stage 1 (3000 it): one random view from [74, 333); losses mask 2 /
  normal_consistency 0.1 / laplacian 800; persistent Adam lr 1e-3 on offsets
  (deformation.py:143-216);
* stage 2 (1000 it): one of 32 picked views; losses hole_mask 2 / mask 2 /
  nc 0.1 / laplacian 40 / enhanced normal 0.8 / shading 1.0; only VISIBLE
  vertices step, and the reference creates a FRESH Adam for them each
  iteration (deformation.py:304-313) -- a single Adam step from zero state is
  exactly ``lr * g / (|g| + eps)``, so we apply that closed form as a masked
  update instead of rebuilding optimizer state (same numerics, no host sync);
  the shader's Adam is persistent (deformation.py:140);
* remesh at 3500 with half average edge length, x4 laplacian/nc weights,
  x0.25 lr (deformation.py:273-295) -- via the native geometry library,
  compiled on demand (g++); a failed build is a hard error, never a silent
  skip (the reference remeshes unconditionally via gpytoolbox);
* export: denormalize, write mesh_{N}.obj, then final_mesh.obj post-processed
  (rotate -90deg about x, decimate to 40k faces) (deformation.py:410-414,
  deformer/utils/io.py:18-37).

TPU design notes: each iteration is ONE jitted step (render + all losses +
grads + optimizer update) with static shapes; the view target stacks are
uploaded to HBM once and indexed by view id inside the step (passed as jit
ARGUMENTS -- closure constants of that size are rejected by the remote
compile service); the frozen reference-mesh G-buffers used by hole_mask are
rendered once per topology epoch (compute_rf_stack), not per iteration;
visibility uses a 2x-supersampled face-id pass (see rast/gbuffer.py docstring
for the 8x->2x rationale).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from garmentdreamer_tpu.core import io as gio
from garmentdreamer_tpu.meshops import (
    LoadedView,
    NeuralShader,
    NeuralShaderConfig,
    aabb_normalization,
    build_topology,
    hole_mask_loss,
    laplacian_loss,
    load_views,
    mask_loss,
    normal_consistency_loss,
    normal_map_loss,
    normal_map_loss_enhanced,
    shading_loss_inputs,
    transform_view,
    vertex_normals,
)
from garmentdreamer_tpu.rast import (
    gl_mvp, near_far_from_aabb, render_gbuffer, vertex_visibility,
    visibility_from_face_ids,
)

__all__ = ["DeformerConfig", "deformation"]


@dataclasses.dataclass
class DeformerConfig:
    """Defaults = configs/garment_deformer_configs.yml."""

    iterations_first: int = 3000
    iterations_second: int = 1000
    upsample_iterations: Tuple[int, ...] = (3500,)
    lr_vertices: float = 1e-3
    lr_shader: float = 1e-3
    enhanced_normal_map_loss: bool = True
    optim_only_visible: bool = True
    weight_hole_mask: float = 2.0
    weight_mask: float = 2.0
    weight_normal_consistency: float = 0.1
    weight_laplacian: float = 40.0
    weight_normal: float = 0.8
    weight_shading: float = 1.0
    shading_percentage: float = 0.75
    shading_samples: int = 65536
    picked_views_first: Tuple[int, int] = (74, 333)
    picked_views_second: Tuple[int, ...] = (
        111, 115, 120, 125, 129, 133, 138, 143,
        221, 189, 194, 199, 203, 207, 212, 217,
        259, 263, 268, 273, 277, 281, 286, 291,
    )
    # loss weights for the FIRST stage are fixed in code (deformation.py:143-147)
    first_stage_weights: Tuple[float, float, float] = (2.0, 0.1, 800.0)
    visibility_upsample: int = 2
    # True: stage-2 visibility comes from the loss render's face-id buffer
    # (no extra rasterization); False: dedicated supersampled pass at
    # visibility_upsample x the render resolution (closer to the
    # reference's 8x re-render, renderer.py:104-126)
    visibility_from_gbuffer: bool = True
    max_tiles_per_tri: int = 32
    max_per_tile: int = 512
    save_frequency: int = 500
    seed: int = 12
    decimate_target: int = 40000
    # iterations fused into ONE on-device lax.scan dispatch: the view pick
    # and rng are pure functions of the step index, so the host only slices
    # precomputed sequences between checkpoint/remesh boundaries instead of
    # paying per-iteration dispatch through the axon tunnel
    scan_chunk: int = 250


def _adjust_and_scale(verts: np.ndarray, bound: float) -> np.ndarray:
    """Axis permute (x,y,z) <- (z,x,y) then scale by bound
    (adjust_mesh.py:10-20)."""
    out = np.empty_like(verts)
    out[:, 0] = verts[:, 2]
    out[:, 1] = verts[:, 0]
    out[:, 2] = verts[:, 1]
    return out * bound


def _stack_view_arrays(views: List[LoadedView]):
    return {
        "normal": np.stack([v.normal for v in views]),
        "mask": np.stack([v.mask for v in views]),
        "rgb": np.stack([v.rgb for v in views]),
    }


def deformation(
    sample_dir: str,
    template_path: str,
    bound: float,
    cfg: Optional[DeformerConfig] = None,
    output_dir: Optional[str] = None,
    views: Optional[List[LoadedView]] = None,
    mesh_devices: int = 0,
) -> str:
    """``mesh_devices`` > 0 strip-shards each step's G-buffer render +
    per-pixel losses over that many chips (deformer/strips.py): the loop
    stays sequential, but ~all of a step's cost is per-pixel, so the step
    latency drops ~linearly with the strip count."""
    cfg = cfg or DeformerConfig()
    rng = np.random.RandomState(cfg.seed)
    output_dir = output_dir or os.path.join(sample_dir, "deformation_check")
    meshes_dir = os.path.join(output_dir, "meshes")
    os.makedirs(meshes_dir, exist_ok=True)

    # ---- load ----
    if views is None:
        views = load_views(sample_dir)
    H, W = views[0].resolution

    obj = gio.load_obj(template_path)
    verts0 = _adjust_and_scale(np.asarray(obj.vertices, np.float32), bound)
    faces_np = np.asarray(obj.faces, np.int32)
    topo = build_topology(faces_np, verts0.shape[0])

    # ---- space normalization (deformation.py:103-111) ----
    A, A_inv = aabb_normalization(verts0, side_length=2.0)
    scale = float(A[0, 0])
    verts0 = verts0 @ A[:3, :3].T + A[:3, 3]
    views = [transform_view(v, A_inv, scale) for v in views]

    aabb_n = np.stack([verts0.min(0), verts0.max(0)])
    corner_pts = np.stack(
        np.meshgrid(aabb_n[:, 0], aabb_n[:, 1], aabb_n[:, 2], indexing="ij"), -1
    ).reshape(-1, 3)
    nears, fars = [], []
    for v in views:
        n_, f_ = near_far_from_aabb(v.R, v.t, v.K, corner_pts, epsilon=0.5)
        nears.append(n_)
        fars.append(f_)
    near, far = min(nears), max(fars)

    mvps = np.stack([gl_mvp(v.K, v.R, v.t, H, W, near, far) for v in views])
    centers = np.stack([v.center for v in views]).astype(np.float32)
    Rs = np.stack([v.R for v in views]).astype(np.float32)
    targets = _stack_view_arrays(views)

    # Per-view targets live on DEVICE, indexed by view id inside the jitted
    # steps: streaming a 1024^2 target per iteration is a ~4-28 MB
    # host->device copy that stalls the dispatch queue every step (the
    # reference keeps all views resident on the GPU too, deformation.py:96).
    mvps_d = jnp.asarray(mvps)
    centers_d = jnp.asarray(centers)
    Rs_d = jnp.asarray(Rs)

    faces = jnp.asarray(topo.faces)
    edges = jnp.asarray(topo.edges)
    degree = jnp.asarray(topo.degree)
    connected = jnp.asarray(topo.connected_faces)
    v0 = jnp.asarray(verts0)
    V = verts0.shape[0]

    # ---- shader ----
    shader = NeuralShader(NeuralShaderConfig())
    shader_params = shader.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )
    shader_opt = optax.adam(cfg.lr_shader)
    shader_opt_state = shader_opt.init(shader_params)

    vertex_opt = optax.adam(cfg.lr_vertices)
    vertex_opt_state = vertex_opt.init(jnp.zeros_like(v0))

    w_mask1, w_nc1, w_lap1 = cfg.first_stage_weights

    # ---- optional strip mesh (intra-step spatial sharding) ----
    mesh = None
    if mesh_devices:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from garmentdreamer_tpu.deformer.strips import AXIS

        devs = jax.devices()
        if len(devs) < mesh_devices:
            raise ValueError(f"need {mesh_devices} devices, have {len(devs)}")
        if H % mesh_devices:
            raise ValueError(
                f"render height {H} not divisible by {mesh_devices} strips"
            )
        mesh = Mesh(np.array(devs[:mesh_devices]), (AXIS,))
        S = mesh_devices
        _row_sharded = NamedSharding(mesh, P(None, AXIS))

    # big per-view stacks enter the jitted steps as ARGUMENTS -- closed-over
    # device arrays are baked into the HLO as constants and the axon remote
    # compile service rejects multi-GB programs; under a strip mesh each
    # device holds only its own rows of every view target.
    # Device-resident targets are stored UINT8 and cast to f32 per-view
    # INSIDE the step (one view = ~4 MB, free): the f32 stacks at 407 views
    # @1024^2 were 1.7 GB of HBM and the round-5 production run crashed the
    # 16 GB TPU worker in this stage; targets come from 8-bit PNGs, so the
    # round-trip through uint8 is exact (the reference keeps f32 stacks on
    # its GPU, deformation.py:96 -- a 24 GB-card luxury).
    masks_d = jnp.asarray(
        np.round(np.asarray(targets["mask"]) * 255.0).astype(np.uint8)
    )  # (V_views, H, W, 1) uint8
    if mesh is not None:
        masks_d = jax.device_put(masks_d, _row_sharded)

    # ---- stage-1 jitted scan (one dispatch per chunk of iterations) ----
    @jax.jit
    def run1(offsets, opt_state, vis, masks):
        def body(carry, vi):
            off, ostate = carry
            mvp = mvps_d[vi]
            tgt_mask = masks[vi].astype(jnp.float32) / 255.0

            def loss_fn(off_):
                verts = v0 + off_
                vn = vertex_normals(verts, faces, V)
                g = render_gbuffer(
                    verts, faces, vn, mvp, H, W,
                    cfg.max_tiles_per_tri, cfg.max_per_tile,
                )
                l_mask = mask_loss(tgt_mask, g["mask"])
                l_nc = normal_consistency_loss(verts, faces, connected)
                l_lap = laplacian_loss(verts, edges, degree)
                return (
                    w_mask1 * l_mask + w_nc1 * l_nc + w_lap1 * l_lap,
                    g["n_dropped"],
                )

            (loss, nd), grad = jax.value_and_grad(loss_fn, has_aux=True)(off)
            updates, ostate = vertex_opt.update(grad, ostate)
            return (optax.apply_updates(off, updates), ostate), (loss, nd)

        (offsets, opt_state), (losses, nds) = jax.lax.scan(
            body, (offsets, opt_state), vis
        )
        return offsets, opt_state, losses[-1], nds.max()

    # ---- stage-2 jitted step ----
    stage2_weights = {
        "hole_mask": cfg.weight_hole_mask,
        "mask": cfg.weight_mask,
        "normal_consistency": cfg.weight_normal_consistency,
        "laplacian": cfg.weight_laplacian,
        "normal": cfg.weight_normal,
        "shading": cfg.weight_shading,
    }

    def compute_rf_stack(rf_verts, picked):
        """Reference-mesh G-buffers for the picked views, rendered ONCE.

        The reference re-renders its frozen stage-1 mesh every iteration
        (deformation.py:263-268 inside the loop); rf_verts and the picked
        cameras are constant between remeshes, so this is a pure cache --
        ~24 renders instead of 1000, and the stage-2 step drops a full
        G-buffer pass."""
        rf_vn = vertex_normals(rf_verts, faces, int(rf_verts.shape[0]))

        @jax.jit
        def one(mvp):
            return jax.lax.stop_gradient(
                render_gbuffer(rf_verts, faces, rf_vn, mvp, H, W,
                               cfg.max_tiles_per_tri, cfg.max_per_tile)
            )

        outs = [one(mvps_d[i]) for i in picked]
        return {k: jnp.stack([o[k] for o in outs]) for k in outs[0]}

    def make_step2(lr_vertices: float, w_lap: float, w_nc: float, picked):
        picked_d = jnp.asarray(np.asarray(picked, np.int32))

        def step2(offsets, sh_params, sh_opt_state, pi, key, tgt, grf):
            vi = picked_d[pi]
            mvp = mvps_d[vi]
            cam_R = Rs_d[vi]
            cam_c = centers_d[vi]
            tgt_mask = tgt["mask"][vi].astype(jnp.float32) / 255.0
            tgt_normal = tgt["normal"][pi].astype(jnp.float32) / 255.0
            tgt_rgb = tgt["rgb"][pi].astype(jnp.float32) / 255.0
            g_rf = jax.tree_util.tree_map(lambda a: a[pi], grf)

            def loss_fn(off, sp):
                verts = v0 + off
                vn = vertex_normals(verts, faces, V)
                g = render_gbuffer(verts, faces, vn, mvp, H, W,
                                   cfg.max_tiles_per_tri, cfg.max_per_tile)
                l = {}
                l["hole_mask"] = hole_mask_loss(g, g_rf, cam_R, cam_c)
                l["mask"] = mask_loss(tgt_mask, g["mask"])
                l["normal_consistency"] = normal_consistency_loss(verts, faces, connected)
                l["laplacian"] = laplacian_loss(verts, edges, degree)
                if cfg.enhanced_normal_map_loss:
                    l["normal"] = normal_map_loss_enhanced(
                        tgt_normal, tgt_mask, g, cam_R, cam_c
                    )
                else:
                    l["normal"] = normal_map_loss(tgt_normal, tgt_mask, g, cam_R)
                si = shading_loss_inputs(
                    tgt_rgb, tgt_mask, g, cam_R, cam_c, key,
                    cfg.shading_samples, cfg.shading_percentage,
                )
                pred = shader.apply(sp, si.position, si.normal, si.view_dir)
                denom = jnp.maximum(jnp.sum(si.weight), 1.0)
                l["shading"] = jnp.sum(
                    jnp.abs(pred - si.target_rgb) * si.weight[:, None]
                ) / (denom * 3)
                # post-remesh weight bumps replace the yml laplacian/nc weights
                # (deformation.py:287-290)
                weights = dict(stage2_weights)
                weights["laplacian"] = w_lap
                weights["normal_consistency"] = w_nc
                total = sum(weights[k] * v for k, v in l.items())
                l["n_dropped"] = g["n_dropped"]
                l["face_id"] = g["face_id"]
                return total, l

            (loss, aux), grads = jax.value_and_grad(loss_fn, (0, 1), has_aux=True)(
                offsets, sh_params
            )
            g_off, g_sh = grads

            def reg_grad(off):
                """Gradient of the coverage-independent regularizers only
                (laplacian + normal consistency): what an invisible-at-1x
                vertex still owes. Cheap -- no render involved."""
                verts = v0 + off
                return (
                    w_nc * normal_consistency_loss(verts, faces, connected)
                    + w_lap * laplacian_loss(verts, edges, degree)
                )

            # visibility lives INSIDE the step (one program dispatch per
            # iteration, not two -- each dispatch is ~5-8 ms via the tunnel).
            # Default: derived from the loss render's own face-id buffer --
            # the same vertices at the same view were just rasterized, so a
            # second (2x-supersampled) rasterization pays a full extra
            # raster + 4x the sort rows. The 1x buffer misses sub-pixel
            # faces the reference's 8x pass (renderer.py:104-126) would
            # catch; their DATA gradients through this buffer are zero, but
            # the laplacian/normal-consistency regularizers are
            # coverage-independent, so invisible-at-1x vertices step on the
            # regularizer-only gradient instead of freezing (ADVICE r4).
            # The supersampled pass stays behind
            # visibility_from_gbuffer=False for reference parity (there the
            # mask is absolute, like the reference's fresh visible-only
            # Adam, deformation.py:304-313).
            if cfg.optim_only_visible and cfg.visibility_from_gbuffer:
                vis = visibility_from_face_ids(
                    aux["face_id"], faces, int(v0.shape[0])
                )
                g_reg = jax.grad(reg_grad)(offsets)
            elif cfg.optim_only_visible:
                vis = vertex_visibility(
                    v0 + offsets, faces, mvp[None], H, W, int(v0.shape[0]),
                    cfg.visibility_upsample, cfg.max_tiles_per_tri,
                    cfg.max_per_tile,
                )
                g_reg = jnp.zeros_like(g_off)
            else:
                vis = jnp.ones((v0.shape[0],), bool)
                g_reg = jnp.zeros_like(g_off)
            # fresh-Adam single step == lr * g / (|g| + eps) on visible verts
            # (deformation.py:304-313; Adam bias-corrected first step)
            upd = -lr_vertices * g_off / (jnp.abs(g_off) + 1e-8)
            upd_invis = -lr_vertices * g_reg / (jnp.abs(g_reg) + 1e-8)
            upd_invis = jnp.where(jnp.abs(g_reg) > 0, upd_invis, 0.0)
            offsets = offsets + jnp.where(vis[:, None], upd, upd_invis)

            sh_updates, sh_opt_state = shader_opt.update(g_sh, sh_opt_state)
            sh_params = optax.apply_updates(sh_params, sh_updates)
            return offsets, sh_params, sh_opt_state, loss, aux["n_dropped"]

        @jax.jit
        def run2(offsets, sh_params, sh_opt_state, pis, keys, tgt, grf):
            def body(carry, xs):
                off, sp, so = carry
                pi, key = xs
                off, sp, so, loss, nd = step2(off, sp, so, pi, key, tgt, grf)
                return (off, sp, so), (loss, nd)

            (offsets, sh_params, sh_opt_state), (losses, nds) = jax.lax.scan(
                body, (offsets, sh_params, sh_opt_state), (pis, keys)
            )
            return offsets, sh_params, sh_opt_state, losses[-1], nds.max()

        return run2

    # ---- strip-sharded program variants (deformer/strips.py) ----
    if mesh is not None:
        from garmentdreamer_tpu.parallel.dp import shard_map_nocheck

        from garmentdreamer_tpu.deformer.strips import (
            AXIS, render_gbuffer_strip, strip_hole_mask_loss, strip_mask_loss,
            strip_normal_map_loss, strip_normal_map_loss_enhanced,
            strip_shading_inputs,
        )
        from garmentdreamer_tpu.rast.gbuffer import (
            _face_hit_from_ids, _vertex_vis_from_face_hit,
        )

        if cfg.optim_only_visible and not cfg.visibility_from_gbuffer:
            raise NotImplementedError(
                "strip mesh mode computes visibility from the strip face-id "
                "buffers; the dedicated supersampled pass "
                "(visibility_from_gbuffer=False) is single-device only"
            )

        def _run1_core(offsets, opt_state, vis, masks):
            k = jax.lax.axis_index(AXIS)

            def body(carry, vi):
                off, ostate = carry
                mvp = mvps_d[vi]
                tgt_mask = masks[vi].astype(jnp.float32) / 255.0  # strip rows

                def loss_fn(off_):
                    verts = v0 + off_
                    vn = vertex_normals(verts, faces, V)
                    g = render_gbuffer_strip(
                        verts, faces, vn, mvp, k, H, W, S,
                        cfg.max_tiles_per_tri, cfg.max_per_tile,
                    )
                    l_mask = strip_mask_loss(tgt_mask, g["mask"], H, W)
                    # vertex-local regularizers are replicated compute: /S so
                    # the gradient psum counts them once
                    l_reg = (
                        w_nc1 * normal_consistency_loss(verts, faces, connected)
                        + w_lap1 * laplacian_loss(verts, edges, degree)
                    ) / S
                    return w_mask1 * l_mask + l_reg, g["n_dropped"]

                (loss, nd), grad = jax.value_and_grad(loss_fn, has_aux=True)(off)
                grad = jax.lax.psum(grad, AXIS)
                loss = jax.lax.psum(loss, AXIS)
                nd = jax.lax.psum(nd, AXIS)
                updates, ostate = vertex_opt.update(grad, ostate)
                return (optax.apply_updates(off, updates), ostate), (loss, nd)

            (offsets, opt_state), (losses, nds) = jax.lax.scan(
                body, (offsets, opt_state), vis
            )
            return offsets, opt_state, losses[-1], nds.max()

        from jax.sharding import PartitionSpec as P

        run1 = jax.jit(
            shard_map_nocheck(
                _run1_core, mesh=mesh,
                in_specs=(P(), P(), P(), P(None, AXIS)),
                out_specs=(P(), P(), P(), P()),
            )
        )

        def compute_rf_stack(rf_verts, picked):  # noqa: F811 - strip variant
            """Frozen reference-mesh G-buffers, rendered per strip: device k
            holds rows [k*hs, (k+1)*hs) of every picked view."""
            rf_vn = vertex_normals(rf_verts, faces, int(rf_verts.shape[0]))
            picked_mvps = mvps_d[jnp.asarray(np.asarray(picked, np.int32))]

            def _core(mvps_p):
                k = jax.lax.axis_index(AXIS)

                def one(mvp):
                    g = render_gbuffer_strip(
                        rf_verts, faces, rf_vn, mvp, k, H, W, S,
                        cfg.max_tiles_per_tri, cfg.max_per_tile,
                    )
                    return {kk: jax.lax.stop_gradient(g[kk])
                            for kk in ("mask", "position", "normal")}

                return jax.lax.map(one, mvps_p)

            return jax.jit(
                shard_map_nocheck(
                    _core, mesh=mesh, in_specs=(P(),),
                    out_specs=P(None, AXIS),
                )
            )(picked_mvps)

        def make_step2(lr_vertices: float, w_lap: float, w_nc: float, picked):  # noqa: F811
            picked_d = jnp.asarray(np.asarray(picked, np.int32))
            ns_strip = max(1, cfg.shading_samples // S)

            def _core(offsets, sh_params, sh_opt_state, pis, keys,
                      t_mask_all, t_normal_all, t_rgb_all,
                      rf_mask, rf_pos, rf_nrm):
                k = jax.lax.axis_index(AXIS)

                def step2(offsets, sh_params, sh_opt_state, pi, key):
                    vi = picked_d[pi]
                    mvp = mvps_d[vi]
                    cam_R = Rs_d[vi]
                    cam_c = centers_d[vi]
                    t_mask = t_mask_all[vi].astype(jnp.float32) / 255.0
                    t_normal = t_normal_all[pi].astype(jnp.float32) / 255.0
                    t_rgb = t_rgb_all[pi].astype(jnp.float32) / 255.0
                    g_rf = {"mask": rf_mask[pi], "position": rf_pos[pi],
                            "normal": rf_nrm[pi]}

                    def loss_fn(off, sp):
                        verts = v0 + off
                        vn = vertex_normals(verts, faces, V)
                        g = render_gbuffer_strip(
                            verts, faces, vn, mvp, k, H, W, S,
                            cfg.max_tiles_per_tri, cfg.max_per_tile,
                        )
                        l = {}
                        l["hole_mask"] = strip_hole_mask_loss(g, g_rf, cam_R, cam_c)
                        l["mask"] = strip_mask_loss(t_mask, g["mask"], H, W)
                        l["normal_consistency"] = normal_consistency_loss(
                            verts, faces, connected
                        ) / S
                        l["laplacian"] = laplacian_loss(verts, edges, degree) / S
                        if cfg.enhanced_normal_map_loss:
                            l["normal"] = strip_normal_map_loss_enhanced(
                                t_normal, t_mask, g, cam_R, cam_c
                            )
                        else:
                            l["normal"] = strip_normal_map_loss(
                                t_normal, t_mask, g, cam_R
                            )
                        si = strip_shading_inputs(
                            t_rgb, t_mask, g, cam_R, cam_c, key, k,
                            ns_strip, cfg.shading_percentage,
                        )
                        pred = shader.apply(sp, si.position, si.normal, si.view_dir)
                        l["shading"] = jnp.sum(
                            jnp.abs(pred - si.target_rgb) * si.weight[:, None]
                        ) / (si.denom * 3)
                        weights = dict(stage2_weights)
                        weights["laplacian"] = w_lap
                        weights["normal_consistency"] = w_nc
                        total = sum(weights[kk] * v for kk, v in l.items())
                        l["n_dropped"] = g["n_dropped"]
                        l["face_id"] = g["face_id"]
                        return total, l

                    (loss, aux), grads = jax.value_and_grad(
                        loss_fn, (0, 1), has_aux=True
                    )(offsets, sh_params)
                    g_off = jax.lax.psum(grads[0], AXIS)
                    g_sh = jax.lax.psum(grads[1], AXIS)
                    loss = jax.lax.psum(loss, AXIS)
                    nd = jax.lax.psum(aux["n_dropped"], AXIS)

                    if cfg.optim_only_visible:
                        hit = _face_hit_from_ids(
                            aux["face_id"], int(faces.shape[0])
                        )
                        hit = jax.lax.psum(hit.astype(jnp.int32), AXIS) > 0
                        vis = _vertex_vis_from_face_hit(
                            hit, faces, int(v0.shape[0])
                        )
                        g_reg = jax.grad(
                            lambda off: w_nc * normal_consistency_loss(
                                v0 + off, faces, connected
                            ) + w_lap * laplacian_loss(v0 + off, edges, degree)
                        )(offsets)
                    else:
                        vis = jnp.ones((v0.shape[0],), bool)
                        g_reg = jnp.zeros_like(g_off)
                    upd = -lr_vertices * g_off / (jnp.abs(g_off) + 1e-8)
                    upd_invis = -lr_vertices * g_reg / (jnp.abs(g_reg) + 1e-8)
                    upd_invis = jnp.where(jnp.abs(g_reg) > 0, upd_invis, 0.0)
                    offsets = offsets + jnp.where(vis[:, None], upd, upd_invis)

                    sh_updates, sh_opt_state = shader_opt.update(g_sh, sh_opt_state)
                    sh_params = optax.apply_updates(sh_params, sh_updates)
                    return offsets, sh_params, sh_opt_state, loss, nd

                def body(carry, xs):
                    off, sp, so = carry
                    pi, key = xs
                    off, sp, so, loss, nd = step2(off, sp, so, pi, key)
                    return (off, sp, so), (loss, nd)

                (offsets, sh_params, sh_opt_state), (losses, nds) = jax.lax.scan(
                    body, (offsets, sh_params, sh_opt_state), (pis, keys)
                )
                return offsets, sh_params, sh_opt_state, losses[-1], nds.max()

            core = jax.jit(
                shard_map_nocheck(
                    _core, mesh=mesh,
                    in_specs=(P(), P(), P(), P(), P(),
                              P(None, AXIS), P(None, AXIS), P(None, AXIS),
                              P(None, AXIS), P(None, AXIS), P(None, AXIS)),
                    out_specs=(P(), P(), P(), P(), P()),
                )
            )

            def run2(offsets, sh_params, sh_opt_state, pis, keys, tgt, grf):
                return core(
                    offsets, sh_params, sh_opt_state, pis, keys,
                    tgt["mask"], tgt["normal"], tgt["rgb"],
                    grf["mask"], grf["position"], grf["normal"],
                )

            return run2

    # =========================== stage 1 ===========================
    # the whole view-pick sequence is a pure function of the host seed:
    # precompute it and run the loop as chunked on-device lax.scan programs,
    # breaking only at checkpoint boundaries (same picks and same updates as
    # the per-iteration loop; the drop canary is the max over each chunk,
    # collected as device scalars and synced ONCE per stage -- a blocking
    # int(nd) after every chunk paid one tunnel round-trip per dispatch,
    # serializing host and device)
    offsets = jnp.zeros_like(v0)
    lo, hi = cfg.picked_views_first
    view_pool1 = [i for i in range(lo, min(hi, len(views)))] or list(range(len(views)))
    vi_seq1 = np.array(
        [rng.choice(view_pool1) for _ in range(cfg.iterations_first)], np.uint32
    )
    nd_warned = False

    def _chunk_bounds(start_it, end_it, events):
        """Yield (lo, hi] sub-ranges of (start_it, end_it] that break at
        ``events`` (checkpoint/remesh iterations) and at cfg.scan_chunk."""
        bounds = sorted({e for e in events if start_it < e <= end_it} | {end_it})
        lo_ = start_it
        for b in bounds:
            while lo_ < b:
                hi_ = min(lo_ + max(1, cfg.scan_chunk), b)
                yield lo_, hi_
                lo_ = hi_

    save_pts1 = (
        {1} | set(range(cfg.save_frequency, cfg.iterations_first + 1, cfg.save_frequency))
        if cfg.save_frequency > 0
        else set()
    )
    nd_pending: list = []
    for lo_it, hi_it in _chunk_bounds(0, cfg.iterations_first, save_pts1):
        offsets, vertex_opt_state, loss, nd = run1(
            offsets, vertex_opt_state, jnp.asarray(vi_seq1[lo_it:hi_it]), masks_d
        )
        nd_pending.append((hi_it, nd))
        if hi_it in save_pts1:
            # the checkpoint save blocks for offsets anyway, so flushing the
            # pending drop canaries here costs no extra sync (ADVICE r4)
            _save_mesh_checkpoint(meshes_dir, hi_it, v0, offsets, topo, A_inv)
            nd_warned = _warn_dropped(nd_pending, "stage-1", nd_warned)
            nd_pending = []
    nd_warned = _warn_dropped(nd_pending, "stage-1", nd_warned)

    # =========================== stage 2 ===========================
    rf_verts = v0 + jax.lax.stop_gradient(offsets)
    view_pool2 = [i for i in cfg.picked_views_second if i < len(views)] or view_pool1
    lr_v = cfg.lr_vertices
    w_lap, w_nc = cfg.weight_laplacian, cfg.weight_normal_consistency
    grf_stack = compute_rf_stack(rf_verts, view_pool2)
    targets2_d = {
        "mask": masks_d,
        "normal": jnp.asarray(np.round(
            np.asarray(targets["normal"][list(view_pool2)]) * 255.0
        ).astype(np.uint8)),
        "rgb": jnp.asarray(np.round(
            np.asarray(targets["rgb"][list(view_pool2)]) * 255.0
        ).astype(np.uint8)),
    }
    if mesh is not None:
        targets2_d = {
            k_: jax.device_put(v, _row_sharded) for k_, v in targets2_d.items()
        }
    run2 = make_step2(lr_v, w_lap, w_nc, view_pool2)
    key = jax.random.PRNGKey(cfg.seed)

    total_second = cfg.iterations_first + cfg.iterations_second
    n2 = cfg.iterations_second
    # precompute the whole stage-2 pick sequence (same host-rng call order as
    # the per-iteration loop) and per-iteration rng keys; remesh events do not
    # consume host randomness so the sequence is unaffected by them
    pi_seq = np.array([rng.choice(len(view_pool2)) for _ in range(n2)], np.uint32)
    key_seq = jax.random.split(key, max(n2, 1))
    save_pts2 = (
        set(range(cfg.save_frequency, total_second + 1, cfg.save_frequency))
        if cfg.save_frequency > 0
        else set()
    )
    # upsample happens BEFORE running its iteration: break the chunking so a
    # boundary lands at (upsample_it - 1)
    events2 = save_pts2 | {u - 1 for u in cfg.upsample_iterations}

    nd_pending = []
    for lo_it, hi_it in _chunk_bounds(cfg.iterations_first, total_second, events2):
        if lo_it + 1 in cfg.upsample_iterations:
            new = _try_remesh(v0 + offsets, topo)
            if new is not None:
                verts_new, topo = new
                v0 = jnp.asarray(verts_new)
                V = verts_new.shape[0]
                faces = jnp.asarray(topo.faces)
                edges = jnp.asarray(topo.edges)
                degree = jnp.asarray(topo.degree)
                connected = jnp.asarray(topo.connected_faces)
                offsets = jnp.zeros_like(v0)
                # the reference keeps rf_mesh on the pre-remesh topology
                # (deformation.py:265); we rebase it on the remeshed surface
                # (same geometry, valid topology for the jitted renderer)
                rf_verts = v0
            w_lap *= 4
            w_nc *= 4
            lr_v *= 0.25
            grf_stack = compute_rf_stack(rf_verts, view_pool2)
            run2 = make_step2(lr_v, w_lap, w_nc, view_pool2)

        s0, s1 = lo_it - cfg.iterations_first, hi_it - cfg.iterations_first
        offsets, shader_params, shader_opt_state, loss, nd = run2(
            offsets, shader_params, shader_opt_state,
            jnp.asarray(pi_seq[s0:s1]), key_seq[s0:s1],
            targets2_d, grf_stack,
        )
        nd_pending.append((hi_it, nd))
        if hi_it in save_pts2:
            _save_mesh_checkpoint(meshes_dir, hi_it, v0, offsets, topo, A_inv)
            nd_warned = _warn_dropped(nd_pending, "stage-2", nd_warned)
            nd_pending = []
    nd_warned = _warn_dropped(nd_pending, "stage-2", nd_warned)

    # =========================== export ===========================
    final_local = np.asarray(v0 + offsets)
    final_world = final_local @ A_inv[:3, :3].T + A_inv[:3, 3]
    gio.save_obj(
        os.path.join(meshes_dir, f"mesh_{total_second:06d}.obj"),
        gio.ObjMesh(vertices=final_world, faces=topo.faces),
    )
    final_path = os.path.join(os.path.dirname(output_dir), "final_mesh.obj")
    _write_final_mesh(final_path, final_world, topo.faces, cfg.decimate_target)
    return final_path


def _warn_dropped(pending, stage, warned):
    """Deferred drop-canary check: sync all per-chunk n_dropped maxima in one
    device->host transfer at the end of the stage (pending holds (iteration,
    device scalar) pairs) and warn once, naming the worst chunk."""
    if warned or not pending:
        return warned
    nds = np.asarray(jnp.stack([nd for _, nd in pending]))
    if int(nds.max()) > 0:
        it = pending[int(nds.argmax())][0]
        print(
            f"[deformer] {stage} it {it}: up to {int(nds.max())} triangle "
            "instances dropped by rasterizer caps -- raise "
            "max_tiles_per_tri/max_per_tile", flush=True,
        )
        return True
    return warned


def _save_mesh_checkpoint(meshes_dir, it, v0, offsets, topo, A_inv):
    v = np.asarray(v0 + offsets)
    v = v @ A_inv[:3, :3].T + A_inv[:3, 3]
    gio.save_obj(
        os.path.join(meshes_dir, f"mesh_{it:06d}.obj"),
        gio.ObjMesh(vertices=v, faces=topo.faces),
    )


def _try_remesh(verts, topo):
    """Botsch-Kobbelt remesh at half the average edge length via the native
    geometry library (deformation.py:273-295). The config DEMANDED a remesh
    (upsample_iterations is non-empty), so an unavailable/unbuildable
    library is a hard error, not a silent algorithm downgrade (the reference
    remeshes unconditionally); geometry.py compiles the library on demand
    with g++, so this only raises when that build itself fails."""
    try:
        from garmentdreamer_tpu.native import geometry as ng

        ng._lib()  # force the on-demand build/dlopen NOW for a specific error
    except Exception as e:
        raise RuntimeError(
            "native geometry library unavailable and the deformer config "
            "demands a remesh (upsample_iterations); on-demand g++ build "
            f"failed: {e}"
        ) from e
    v = np.asarray(verts, np.float64)
    e = topo.edges
    h = float(np.linalg.norm(v[e[:, 0]] - v[e[:, 1]], axis=-1).mean() / 2)
    v2, f2 = ng.remesh(v, topo.faces, target_edge_length=h)
    return v2.astype(np.float32), build_topology(f2, v2.shape[0])


def _write_final_mesh(path, verts, faces, decimate_target):
    """Rotate -90deg about x, decimate to 40k faces (io.py:18-37) -- decimation
    via the native geometry library when available."""
    ang = np.radians(-90.0)
    Rx = np.array(
        [[1, 0, 0], [0, np.cos(ang), -np.sin(ang)], [0, np.sin(ang), np.cos(ang)]],
        np.float32,
    )
    v = verts @ Rx.T
    f = faces
    if f.shape[0] > decimate_target:
        # the export contract requires <= decimate_target faces
        # (io.py:25-36); a missing native library must fail loudly, not
        # silently ship a different mesh (geometry.py builds on demand)
        try:
            from garmentdreamer_tpu.native import geometry as ng

            ng._lib()
        except Exception as e:
            raise RuntimeError(
                "native geometry library unavailable but the final mesh "
                f"needs decimation to {decimate_target} faces; on-demand "
                f"g++ build failed: {e}"
            ) from e
        v, f = ng.decimate(v.astype(np.float64), f, target_faces=decimate_target)
        v = v.astype(np.float32)
        f = f.astype(np.int32)
    gio.save_obj(path, gio.ObjMesh(vertices=v, faces=f))

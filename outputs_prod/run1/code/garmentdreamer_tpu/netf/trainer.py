"""Stage-4 NeTF trainer: fit a texture field on the deformed mesh from the
stage-1 renders, then refine it with VSD.

TPU-native rebuild of the reference trainer (netf/trainer.py:14-273 with
configs/garment_netf_configs.yml defaults):

* ``fit_texture`` (600 it @1024^2): per picked view, derive the render pose
  from the cameras.json C2W via the reference's flip dance
  (mesh_renderer.py:176-213), GL projection from the view K (:216-221), MSE on
  pixels valid under render alpha AND flipud'ed view mask AND back-facing
  view cosines (:224-230); Adam with hashgrid_lr 1e-2 / mlp_lr 1e-3;
* ``train_vsd`` (200 it @512^2): random orbit view (ver in [-65,35), hor in
  [-180,180), radius 5 + U[-3,1]) (trainer.py:176-181), VSD loss through
  render -> VAE -> latents, gradient accumulated over batch_size_train=4
  steps (:222-224); each step also runs K=1 LoRA v-pred updates with camera
  conditioning and 10% pose dropout (:226-256), Adam lr 1e-4;
* exports: final_mesh_fitted_texture.obj after fitting (mesh_renderer.py:146)
  and final_mesh_finetuned.obj at the end (trainer.py:264-273), both with the
  reverse x-flip.

Each optimization step is one jitted function; the render resolution, mesh
topology, and batch shapes are static.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from garmentdreamer_tpu.core import io as gio
from garmentdreamer_tpu.guidance.vsd import VSDGuidance
from garmentdreamer_tpu.netf.cameras import (
    orbit_pose,
    perspective,
    projection_from_K,
    reconstruction_pose,
)
from garmentdreamer_tpu.netf.export import export_textured_mesh
from garmentdreamer_tpu.netf.renderer import (
    TextureField, clean_mesh, fit_gbuffer, render_textured,
)

from garmentdreamer_tpu.core.xla_opts import conv_jit

__all__ = ["NeTFConfig", "NeTFTrainer"]


@dataclasses.dataclass
class NeTFConfig:
    """Defaults = configs/garment_netf_configs.yml."""

    iters: int = 200
    fit_tex: bool = True
    fit_tex_iters: int = 600
    fit_resolution: int = 1024
    render_resolution: int = 512
    radius: float = 5.0
    fovy: float = 49.1
    hashgrid_lr: float = 1e-2
    mlp_lr: float = 1e-3
    unet_lr: float = 1e-4
    batch_size_train: int = 4  # grad accumulation period
    # texture-fit pixel sample budget per step (0 = full image). Sampling is
    # the TPU answer to the hash-grid row costs (renderer.render_fit_samples
    # docstring); 2^17 = an eighth of the 1024^2 fit render (see the
    # budget-vs-PSNR table in BENCH_E2E.md for the quality curve behind the
    # default).
    fit_pixel_budget: int = 1 << 17
    # hash-grid table rows (log2) for the texture field; 19 = the reference's
    # tinycudann default (texture_encoder.py:17). Exposed so the fit-quality
    # oracle can probe whether the fit PSNR ceiling is capacity-bound.
    hashgrid_log2_size: int = 19
    # fit iterations fused into ONE on-device lax.scan dispatch: view index
    # and rng are pure functions of the step, so chunks of the loop run
    # without per-iteration host dispatch (the axon tunnel costs ms per
    # dispatch on a 1-vCPU host). One chunk boundary per progress report.
    fit_scan_chunk: int = 100
    # VSD refinement iterations fused the same way; 25 divides the reference
    # count (200) so production replays one compiled executable with no
    # ragged tail, and amortizes the per-dispatch arg marshalling (~1200
    # frozen UNet+VAE leaves) to well under 1% of a step.
    vsd_scan_chunk: int = 25
    K: int = 1
    K2: int = 1
    uncond_p: float = 0.1
    # Fraction of the render's H*W the VSD/IF2 texture query is compacted to
    # (renderer.render_textured cover_cap): the hash-grid row costs dominate
    # the refinement step (scripts/vsd_breakdown.py) and the garment covers
    # well under the full frame at the reference orbit radii. Coverage
    # overflow renders those pixels as background and is surfaced by a
    # deferred canary warning after the loop. 0 disables compaction.
    vsd_cover_frac: float = 0.625
    t5_iters: int = -1
    texture_resolution: int = 1024
    enhance: bool = True  # run the VSD refinement (reconstruction.py:26-28)
    max_tiles_per_tri: int = 32
    max_per_tile: int = 512
    seed: int = 3407
    mode: str = "SD"  # ['SD', 'IF2'] (garment_netf_configs.yml:29)
    reconstruction_picked_views: Tuple[int, ...] = (
        111, 115, 120, 125, 129, 133, 138, 143,
        148, 152, 157, 162, 166, 170, 175, 180,
        221, 189, 194, 199, 203, 207, 212, 217,
        222, 226, 231, 236, 240, 244, 249, 254,
        259, 263, 268, 273, 277, 281, 286, 291,
    )


class NeTFTrainer:
    def __init__(
        self,
        cfg: NeTFConfig,
        mesh_path: str,
        rgba_dir: str,
        outdir: str,
        guidance: Optional[VSDGuidance] = None,
        text_embeddings: Optional[jnp.ndarray] = None,  # (2, L, D) pos ++ neg
        q_params: Optional[Dict[str, Any]] = None,
        mesh_devices: int = 0,
    ):
        """``mesh_devices`` > 0 shards the texture fit's per-step pixel
        budget over that many chips: the SAME sampled pixel set is split
        into contiguous slices, per-device partial losses/gradients are
        ``psum``'d and every device applies the identical Adam update, so
        the sharded fit reproduces the single-device fit to float
        tolerance while the per-step pixel work drops by the device count
        (the fit loop itself is sequential SGD and cannot be view-parallel,
        netf/trainer.py:14-157)."""
        self.cfg = cfg
        self.outdir = outdir
        os.makedirs(outdir, exist_ok=True)
        self.mesh = None
        if mesh_devices:
            from jax.sharding import Mesh

            devs = jax.devices()
            if len(devs) < mesh_devices:
                raise ValueError(
                    f"need {mesh_devices} devices, have {len(devs)}"
                )
            self.mesh = Mesh(np.array(devs[:mesh_devices]), ("pix",))
        self.mesh_devices = mesh_devices
        self.guidance = guidance
        self.text_embeddings = text_embeddings
        self.q_params = q_params

        obj = gio.load_obj(mesh_path)
        v, f = clean_mesh(
            np.asarray(obj.vertices, np.float32), np.asarray(obj.faces, np.int32)
        )
        self.verts = jnp.asarray(v)
        self.faces = jnp.asarray(f)

        self.rng = jax.random.PRNGKey(cfg.seed)
        self.rng, sub = jax.random.split(self.rng)
        from garmentdreamer_tpu.texture.encoders import HashGridConfig

        self.field = TextureField(
            sub, HashGridConfig(log2_hashmap_size=cfg.hashgrid_log2_size)
        )
        self.tex_params = self.field.params

        self.tex_opt = optax.multi_transform(
            {
                "encoder": optax.adam(cfg.hashgrid_lr),
                "mlp": optax.adam(cfg.mlp_lr),
            },
            {"encoder": "encoder", "mlp": "mlp"},
        )
        self.tex_opt_state = self.tex_opt.init(self.tex_params)
        self.np_rng = np.random.RandomState(cfg.seed)

    # ---------------- texture fitting (mesh_renderer.py:158-240) -----------
    def load_views(self, sample_dir: str):
        """Views for fitting: rgba renders + cameras.json C2W positions."""
        import json

        from PIL import Image

        with open(os.path.join(sample_dir, "cameras.json")) as f:
            cams = sorted(json.load(f), key=lambda x: x["id"])
        rgba_dir = os.path.join(sample_dir, "gs_rendered_rgba")
        views = []
        for i in self.cfg.reconstruction_picked_views:
            if i >= len(cams):
                continue
            img = np.asarray(Image.open(os.path.join(rgba_dir, f"{i}.png")), np.float32) / 255.0
            info = cams[i]
            K = np.array(
                [[info["fx"], 0, info["width"] / 2],
                 [0, info["fy"], info["height"] / 2],
                 [0, 0, 1]],
                np.float32,
            )
            pose = reconstruction_pose(np.array(info["position"]))
            proj = projection_from_K(K, int(img.shape[1]), int(img.shape[0]))
            views.append(
                {
                    "rgb": img[..., :3],
                    "mask": img[..., 3],
                    "pose": pose,
                    "proj": proj,
                }
            )
        if not views:
            raise ValueError("no reconstruction views found")
        return views

    def precompute_fit_gbuffers(self, views, res: int):
        """Per-view fit geometry + targets, computed ONCE and kept on device.

        The mesh is frozen during texture fitting, so the surface position,
        coverage, view cosine, AND the target-side validity of every pixel
        are constants per view. The reference pays a full nvdiffrast pass
        per iteration (mesh_renderer.py:158-240); here 600 iterations share
        ~40 one-time geometry passes and the per-step validity test
        collapses to one precomputed bool per pixel.

        Returns (xyz_stack (V,HW,3) f32, ok_stack (V,HW) bool,
        rgb_stack (V,HW,3) f32).
        """
        cfg = self.cfg
        verts, faces = self.verts, self.faces
        n_pix = res * res
        all_pix = jnp.arange(n_pix, dtype=jnp.int32)

        def _down(img):
            if img.shape[0] != res:
                idx = (np.arange(res) / (res / img.shape[0])).astype(int)
                img = img[idx][:, idx]
            return np.flipud(img)

        @jax.jit
        def gbuf(pose, proj, tgt_mask):
            g = fit_gbuffer(
                verts, faces, pose, proj, res, res, all_pix,
                max_tiles_per_tri=cfg.max_tiles_per_tri,
                max_per_tile=cfg.max_per_tile,
            )
            # static per-pixel validity: coverage & flipud(view mask) &
            # back-facing view cosine (mesh_renderer.py:228-230)
            ok = g["valid"] & (tgt_mask > 0) & (g["cosinesview"] <= 0)
            return g["xyz"], ok

        xyzs, oks, rgbs = [], [], []
        for v in views:
            mask_f = jnp.asarray(_down(v["mask"]).reshape(n_pix))
            xyz, ok = gbuf(jnp.asarray(v["pose"]), jnp.asarray(v["proj"]), mask_f)
            xyzs.append(xyz)
            oks.append(ok)
            rgbs.append(_down(v["rgb"]).reshape(n_pix, 3))
        return jnp.stack(xyzs), jnp.stack(oks), jnp.asarray(np.stack(rgbs))

    def fit_texture(self, sample_dir: str, save: bool = True) -> float:
        cfg = self.cfg
        views = self.load_views(sample_dir)
        H = views[0]["rgb"].shape[0]
        res = min(cfg.fit_resolution, H)
        field = self.field
        opt = self.tex_opt

        xyz_stack, ok_stack, rgb_stack = self.precompute_fit_gbuffers(views, res)

        n_pix = res * res
        Q = min(cfg.fit_pixel_budget or n_pix, n_pix)
        sampled = Q < n_pix
        S = self.mesh_devices if self.mesh is not None else 1
        if Q % S:
            raise ValueError(
                f"fit pixel budget {Q} not divisible by {S} devices"
            )
        Qs = Q // S

        # the view stacks enter the jitted program as ARGUMENTS -- closed-over
        # device arrays of this size (~1 GB at 40 views @1024^2) are baked
        # into the HLO as constants and rejected by the remote compile service
        def _chunk_core(params, opt_state, vis, keys, xyzs, oks, rgbs):
            # under the pixel mesh, every device draws the SAME pixel set
            # (replicated key) and takes its contiguous Qs-slice; partial
            # sums psum to the single-device numbers exactly
            k = jax.lax.axis_index("pix") if S > 1 else 0

            def body(carry, xs):
                p, o = carry
                vi, key = xs
                if sampled:
                    pix = jax.random.randint(key, (Q,), 0, n_pix)
                else:
                    pix = jnp.arange(n_pix, dtype=jnp.int32)
                if S > 1:
                    pix = jax.lax.dynamic_slice_in_dim(pix, k * Qs, Qs)
                xyz_s = xyzs[vi, pix]  # (Qs,3)
                m = oks[vi, pix]  # (Qs,)
                tgt = rgbs[vi, pix]  # (Qs,3)

                def loss_fn(tp):
                    albedo = field.query(tp, xyz_s)
                    diff = (albedo - tgt) ** 2
                    cnt = jnp.sum(m)
                    if S > 1:
                        # global valid count: non-differentiable, VJP-safe
                        cnt = jax.lax.psum(cnt, "pix")
                    denom = jnp.maximum(cnt, 1) * 3
                    return jnp.sum(jnp.where(m[:, None], diff, 0.0)) / denom

                loss, grads = jax.value_and_grad(loss_fn)(p)
                if S > 1:
                    grads = jax.lax.psum(grads, "pix")
                    loss = jax.lax.psum(loss, "pix")
                updates, o = opt.update(grads, o)
                return (optax.apply_updates(p, updates), o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (vis, keys)
            )
            return params, opt_state, losses[-1]

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from garmentdreamer_tpu.parallel.dp import shard_map_nocheck

            # everything replicated: each device gathers arbitrary pixels
            # from the full stacks (~1 GB at 40 views @1024^2 -- well within
            # HBM), the split is in the INDEX set, not the data layout
            run_chunk = jax.jit(
                shard_map_nocheck(
                    _chunk_core, mesh=self.mesh,
                    in_specs=(P(),) * 7, out_specs=(P(), P(), P()),
                )
            )
        else:
            run_chunk = jax.jit(_chunk_core)

        # the whole fit runs as fit_tex_iters/chunk on-device scan programs:
        # view ids and rng keys are pure functions of the step index, so the
        # host loop only slices precomputed sequences (no per-iter dispatch)
        n_iters = cfg.fit_tex_iters
        vi_seq = np.array(
            [self.np_rng.randint(len(views)) for _ in range(n_iters)], np.uint32
        )
        self.rng, sub = jax.random.split(self.rng)
        key_seq = jax.random.split(sub, max(n_iters, 1))

        chunk = max(1, min(cfg.fit_scan_chunk, n_iters)) if n_iters else 1
        loss = 0.0
        for start in range(0, n_iters, chunk):
            # a ragged tail compiles a second (shorter-scan) program once;
            # padding it instead would apply extra optimizer updates
            end = min(start + chunk, n_iters)
            self.tex_params, self.tex_opt_state, l = run_chunk(
                self.tex_params, self.tex_opt_state,
                jnp.asarray(vi_seq[start:end]), key_seq[start:end],
                xyz_stack, ok_stack, rgb_stack,
            )
            if end == n_iters:
                loss = float(l)
        if save:
            self.export(os.path.join(self.outdir, "final_mesh_fitted_texture.obj"))
        return loss

    # ---------------- VSD refinement (trainer.py:158-256) ------------------
    def train_vsd(self) -> None:
        cfg = self.cfg
        if self.guidance is None:
            raise ValueError("train_vsd requires a VSDGuidance")
        proj = jnp.asarray(perspective(cfg.fovy))
        field = self.field
        verts, faces = self.verts, self.faces
        guidance = self.guidance
        text = self.text_embeddings
        res = cfg.render_resolution
        opt = self.tex_opt
        # Only the LoRA matrices + camera-conditioning MLP train (reference:
        # lora_layers = AttnProcsLayers + camera_embedding, trainer.py:
        # 108-120); the base UNet weights inside q_params stay frozen.
        # Partitioning the tree (instead of masking) keeps Adam state AND
        # weight-gradient compute restricted to the small trainable subset --
        # adam on the full 800M-param copy OOMs a 16GB chip.
        import flax.traverse_util as tu

        flat_q = tu.flatten_dict(self.q_params)

        def _trainable(path) -> bool:
            return "lora_down" in path or "lora_up" in path or path[0] == "camera"

        train_p = {k: v for k, v in flat_q.items() if _trainable(k)}
        frozen_p = {k: v for k, v in flat_q.items() if not _trainable(k)}

        def merge(train, frozen):
            d = dict(frozen)
            d.update(train)
            return tu.unflatten_dict(d)

        lora_opt = optax.adam(cfg.unet_lr)
        lora_opt_state = lora_opt.init(train_p)

        # frozen SD weights enter jit as an argument (not multi-GB captured
        # constants; see SDSGuidance.__call__ params contract)
        sd_params = {"unet": guidance.unet_params, "vae": guidance.vae_params}

        # The whole refinement loop runs as iters/vsd_scan_chunk on-device
        # lax.scan programs (same dispatch-fusion as fit_texture /
        # deformer.driver): one Python dispatch per iteration was marshalling
        # the ~1200-leaf frozen UNet+VAE tree through the tunnel three times
        # per step (vsd grad, accum, lora update), which dominated the
        # measured 1454 ms/it round-4 rate. The camera pose per step is a
        # pure function of the host rng sequence, so the full pose schedule
        # is precomputed; the grad-accumulation cadence (batch_size_train)
        # and the K-per-K2 LoRA updates become lax.cond/fori_loop on the
        # in-scan step counter (reference loop: netf/trainer.py:158-262).
        total = cfg.iters
        hw = res * res
        S = self.mesh_devices if self.mesh is not None else 1
        cap = 0
        if cfg.vsd_cover_frac and cfg.vsd_cover_frac < 1.0:
            gran = 1024 * S
            cap = min(hw, -(-int(hw * cfg.vsd_cover_frac) // gran) * gran)
        if S > 1:
            # the per-device split rides the compacted query; cap == hw
            # degenerates to sharding the full-grid query (still exact)
            cap = cap or hw
            if cap % S:
                raise ValueError(
                    f"render {res}^2 pixel count not divisible by {S} devices"
                )
        pose_list = []
        for _ in range(total):
            ver = self.np_rng.randint(-65, 35)
            hor = self.np_rng.randint(-180, 180)
            radius = self.np_rng.uniform() * 4 - 3
            pose_list.append(orbit_pose(ver, hor, cfg.radius + radius))
        poses = (
            jnp.asarray(np.stack(pose_list), jnp.float32)
            if pose_list else jnp.zeros((0, 4, 4), jnp.float32)
        )
        pose16s = poses.reshape(-1, 1, 16)
        steps = jnp.arange(1, total + 1, dtype=jnp.int32)
        # per-step flags precomputed on host so the compiled program does not
        # depend on `total` (one executable serves any iteration count whose
        # chunking matches; scan length is the only remaining shape)
        steps_np = np.arange(1, total + 1, dtype=np.int32)
        tex_apply_flags = jnp.asarray(
            (steps_np % cfg.batch_size_train == 0) | (steps_np == total)
        )
        lora_flags = jnp.asarray(steps_np % cfg.K2 == 0)
        self.rng, base_key = jax.random.split(self.rng)

        def chunk_core(tex_params, opt_state, accum, train, lora_state,
                       frozen, sd_p, key, poses_c, pose16_c, steps_c,
                       tex_flags_c, lora_flags_c):
            def body(carry, xs):
                tex_params, opt_state, accum, train, lora_state = carry
                pose, pose16, step, tex_flag, lora_flag = xs
                r1, r3 = jax.random.split(jax.random.fold_in(key, step))
                qp = merge(train, frozen)

                def loss_fn(p):
                    out = render_textured(
                        p, verts, faces, pose, proj, res, res, field,
                        max_tiles_per_tri=cfg.max_tiles_per_tri,
                        max_per_tile=cfg.max_per_tile,
                        cover_cap=cap,
                        shard_axis="pix" if S > 1 else None, n_shards=S,
                    )
                    loss, latents = guidance.train_step(
                        qp, out["image"][None], text, pose16, r1, params=sd_p
                    )
                    return loss, (latents, out["n_cov"], out["n_cov_dropped"])

                (loss, (latents, n_cov, n_drop)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(tex_params)
                if S > 1:
                    # each device saw only its cover-slice of the query; the
                    # total texture gradient is the sum of the partials
                    # (everything downstream of the psum'd image is
                    # replicated, so loss/latents/LoRA grads already agree)
                    grads = jax.lax.psum(grads, "pix")
                accum = jax.tree_util.tree_map(jnp.add, accum, grads)

                def tex_apply(args):
                    p, o, a = args
                    updates, o = opt.update(a, o)
                    p = optax.apply_updates(p, updates)
                    return p, o, jax.tree_util.tree_map(jnp.zeros_like, a)

                tex_params, opt_state, accum = jax.lax.cond(
                    tex_flag, tex_apply, lambda a: a,
                    (tex_params, opt_state, accum),
                )

                def lora_updates(args):
                    def one(i, ts):
                        tr, st = ts

                        def lf(t_):
                            return guidance.lora_loss(
                                merge(t_, frozen), latents, text[:1], pose16,
                                jax.random.fold_in(r3, i), cfg.uncond_p,
                            )

                        g = jax.grad(lf)(tr)
                        up, st = lora_opt.update(g, st)
                        return optax.apply_updates(tr, up), st

                    return jax.lax.fori_loop(0, cfg.K, one, args)

                train, lora_state = jax.lax.cond(
                    lora_flag, lora_updates, lambda a: a,
                    (train, lora_state),
                )
                return (tex_params, opt_state, accum, train, lora_state), (
                    loss, n_cov, n_drop)

            return jax.lax.scan(
                body, (tex_params, opt_state, accum, train, lora_state),
                (poses_c, pose16_c, steps_c, tex_flags_c, lora_flags_c),
            )

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            from garmentdreamer_tpu.parallel.dp import shard_map_nocheck

            # everything enters replicated; devices diverge only in which
            # cover-slice they query, and the per-step grad psum restores
            # replication before any carry is updated
            run_chunk = conv_jit(
                shard_map_nocheck(
                    chunk_core, mesh=self.mesh,
                    in_specs=(P(),) * 13, out_specs=P(),
                )
            )
        else:
            run_chunk = conv_jit(chunk_core)

        accum = jax.tree_util.tree_map(jnp.zeros_like, self.tex_params)
        carry = (self.tex_params, self.tex_opt_state, accum, train_p,
                 lora_opt_state)
        chunk = max(1, min(cfg.vsd_scan_chunk, total)) if total else 1
        i = 0
        pending_cov = []  # deferred: one device sync for all chunks at the end
        while i < total:
            # a ragged tail compiles a second (shorter-scan) program once;
            # every full chunk replays the same cached executable
            n = min(chunk, total - i)
            carry, (_, n_covs, n_drops) = run_chunk(
                *carry, frozen_p, sd_params, base_key,
                poses[i:i + n], pose16s[i:i + n], steps[i:i + n],
                tex_apply_flags[i:i + n], lora_flags[i:i + n],
            )
            pending_cov.append((n_covs.max(), n_drops.max()))
            i += n
        self.tex_params, self.tex_opt_state, accum, train_p, lora_opt_state = carry
        if cap and pending_cov:
            max_cov = max(int(c) for c, _ in pending_cov)
            max_drop = max(int(d) for _, d in pending_cov)
            if max_drop > 0:
                import warnings

                warnings.warn(
                    f"VSD cover_cap={cap} overflowed: up to {max_drop} covered "
                    f"pixels/view rendered as background (max coverage "
                    f"{max_cov}/{hw}); raise vsd_cover_frac above "
                    f"{max_cov / hw:.2f}"
                )

        self.q_params = merge(train_p, frozen_p)
        self.export(os.path.join(self.outdir, "final_mesh_finetuned.obj"))

    # ---------------- IF2 refinement (mode: "IF2") -------------------------
    def train_if2(self, guidance, text_emb, uncond_emb) -> None:
        """Refine the texture with pixel-space IF-II SDS instead of VSD
        (reference: garment_netf_configs.yml mode "IF2" ->
        netf/guidance/if2_utils.py; the reference loads this guidance but its
        training branch only supports vds -- here the mode actually runs).

        The super-resolution conditioning image (if2_utils.py's ``ori_rgb``)
        is the render under the FROZEN pre-refinement texture at the same
        pose; no LoRA updates (IF2 is plain SDS).
        """
        cfg = self.cfg
        proj = jnp.asarray(perspective(cfg.fovy))
        field = self.field
        verts, faces = self.verts, self.faces
        res = cfg.render_resolution
        opt = self.tex_opt
        init_params = jax.tree_util.tree_map(lambda x: x, self.tex_params)
        hw = res * res
        cap = 0
        if cfg.vsd_cover_frac and cfg.vsd_cover_frac < 1.0:
            cap = min(hw, -(-int(hw * cfg.vsd_cover_frac) // 1024) * 1024)

        @conv_jit
        def if2_step(params, pose, azim, rng):
            ori = render_textured(
                init_params, verts, faces, pose, proj, res, res, field,
                max_tiles_per_tri=cfg.max_tiles_per_tri,
                max_per_tile=cfg.max_per_tile, cover_cap=cap,
            )["image"]

            def loss_fn(p):
                out = render_textured(
                    p, verts, faces, pose, proj, res, res, field,
                    max_tiles_per_tri=cfg.max_tiles_per_tri,
                    max_per_tile=cfg.max_per_tile, cover_cap=cap,
                )
                from garmentdreamer_tpu.guidance.if2 import direction_index

                d = direction_index(azim)
                g_out = guidance(
                    out["image"][None], ori[None],
                    text_emb[d][None], uncond_emb[None], rng,
                )
                return g_out["loss_sds"]

            loss, grads = jax.value_and_grad(loss_fn)(params)
            return grads, loss

        accum = jax.tree_util.tree_map(jnp.zeros_like, self.tex_params)
        for step_i in range(1, cfg.iters + 1):
            ver = self.np_rng.randint(-65, 35)
            hor = self.np_rng.randint(-180, 180)
            radius = self.np_rng.uniform() * 4 - 3
            pose = jnp.asarray(orbit_pose(ver, hor, cfg.radius + radius))
            self.rng, r1 = jax.random.split(self.rng)
            grads, loss = if2_step(
                self.tex_params, pose, jnp.float32(hor), r1
            )
            accum = jax.tree_util.tree_map(jnp.add, accum, grads)
            if step_i % cfg.batch_size_train == 0 or step_i == cfg.iters:
                updates, self.tex_opt_state = self.tex_opt.update(
                    accum, self.tex_opt_state
                )
                self.tex_params = optax.apply_updates(self.tex_params, updates)
                accum = jax.tree_util.tree_map(jnp.zeros_like, self.tex_params)

        self.export(os.path.join(self.outdir, "final_mesh_finetuned.obj"))

    # ---------------- export ----------------------------------------------
    def export(self, path: str) -> str:
        params = self.tex_params
        field = self.field

        @jax.jit
        def query(xyz):
            return field.query(params, xyz)

        return export_textured_mesh(
            path, lambda x: query(jnp.asarray(x, jnp.float32)),
            np.asarray(self.verts), np.asarray(self.faces),
            texture_resolution=self.cfg.texture_resolution, reverse=True,
        )

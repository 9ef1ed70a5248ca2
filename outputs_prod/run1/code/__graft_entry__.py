"""Driver entry points: single-chip compile check + multi-chip dry run.

``entry()`` returns a jittable forward step on the flagship model -- the
tile-binned differentiable Gaussian-splat renderer at 512^2 over a 100k cloud
(the pipeline's hottest custom kernel).

``dryrun_multichip(n)`` builds an n-device mesh and runs ONE full stage-1
training step (render -> SDS guidance w/ tiny UNet+VAE -> grads -> Adam update)
with the view batch sharded over the 'data' axis and Gaussian/UNet parameters
replicated -- the data-parallel layout described in SURVEY.md section 2.6.
"""

from __future__ import annotations

import numpy as np


def _make_scene(n=100_000, cap=131_072, seed=0):
    import jax.numpy as jnp

    from garmentdreamer_tpu.splat import state as state_mod

    rng = np.random.default_rng(seed)
    # a garment-ish shell: points on a noisy cylinder
    theta = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(-1.0, 1.0, n)
    r = 0.6 + 0.05 * rng.normal(size=n)
    pts = np.stack([r * np.cos(theta), r * np.sin(theta), z], 1).astype(np.float32)
    cols = rng.uniform(0.2, 0.9, size=(n, 3)).astype(np.float32)
    return state_mod.create_from_pcd(pts, cols, capacity=cap)


def entry():
    """-> (fn, example_args): jittable splat render @512^2."""
    import jax
    import jax.numpy as jnp

    from garmentdreamer_tpu.core import cameras as cam
    from garmentdreamer_tpu.splat.render import render_view

    st = _make_scene()
    c = cam.gs_camera_from_spherical(15.0, 30.0, 3.5, float(np.deg2rad(70.0)), 512, 512)
    cams = {k: jnp.asarray(v) for k, v in c.as_arrays().items()}
    bg = jnp.ones(3, jnp.float32)

    def fn(params, stats, cams):
        st_r = st.replace(params=params, stats=stats)
        out = render_view(st_r, cams, bg, 512, 512, max_per_tile=512)
        return out["render"], out["alpha"]

    return fn, (st.params, st.stats, cams)


def _force_virtual_cpu_mesh(n_devices: int):
    """Force an ``n_devices``-device virtual CPU platform, like tests/conftest.py.

    This container's sitecustomize registers the axon TPU plugin and pins
    ``jax_platforms=axon`` at interpreter start, so setting JAX_PLATFORMS in
    the environment is not enough: we must (a) request host-platform device
    multiplexing via XLA_FLAGS before the CPU backend initializes and (b)
    override the platform pin via jax.config before first JAX use.
    """
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    devs = jax.devices()
    if len(devs) < n_devices:
        raise RuntimeError(
            f"virtual CPU mesh has {len(devs)} devices, need {n_devices}; "
            "JAX was likely initialized before dryrun_multichip() could set "
            "--xla_force_host_platform_device_count"
        )
    return devs[:n_devices]


def dryrun_multichip(n_devices: int) -> None:
    """One data-parallel stage-1 training step over an n-device mesh."""
    devices = _force_virtual_cpu_mesh(n_devices)

    import jax
    import jax.numpy as jnp

    from garmentdreamer_tpu.data.cameras import RandomCameraConfig, RandomCameraSampler
    from garmentdreamer_tpu.guidance import (
        AutoencoderKL, PromptEmbeddings, SDSConfig, SDSGuidance,
        UNet2DCondition, UNetConfig, VAEConfig,
    )
    from garmentdreamer_tpu.parallel import (
        data_parallel_mesh, replicate, shard_view_batch,
    )
    from garmentdreamer_tpu.systems.gaussiandreamer import (
        GaussianDreamerConfig, GaussianDreamerSystem,
    )
    from garmentdreamer_tpu.splat import state as state_mod

    mesh = data_parallel_mesh(devices=devices)

    # tiny shapes: 32^2 renders, 2-level UNet, 512-point cloud
    ucfg = UNetConfig.tiny()
    unet = UNet2DCondition(ucfg)
    vcfg = VAEConfig.tiny()
    vae = AutoencoderKL(vcfg)
    latent, img = 8, 32
    up = unet.init(jax.random.key(0), jnp.zeros((1, latent, latent, 4)), jnp.array([0]),
                   jnp.zeros((1, 7, ucfg.cross_attention_dim)))
    vp = vae.init(jax.random.key(1), jnp.zeros((1, img, img, 3)), jax.random.key(2))
    guidance = SDSGuidance(
        SDSConfig(latent_size=latent, image_size=img, guidance_scale=7.5),
        lambda p, l, t, c: unet.apply(p, l, t, c), up,
        lambda p, x, r: vae.apply(p, x, r, method=AutoencoderKL.sample_latents), vp,
    )
    emb = PromptEmbeddings(
        text_vd=jnp.ones((4, 7, ucfg.cross_attention_dim)) * 0.1,
        uncond_vd=jnp.zeros((4, 7, ucfg.cross_attention_dim)),
        text=jnp.ones((7, ucfg.cross_attention_dim)) * 0.1,
        uncond=jnp.zeros((7, ucfg.cross_attention_dim)),
    )

    cfg = GaussianDreamerConfig(
        capacity=512, max_tiles_per_gaussian=8, max_per_tile=128, max_steps=1
    )
    B = n_devices  # one view per device
    data_cfg = RandomCameraConfig(height=32, width=32, batch_size=B)
    system = GaussianDreamerSystem(cfg, data_cfg, guidance, emb)

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(300, 3)).astype(np.float32) * 0.5
    cols = rng.uniform(size=(300, 3)).astype(np.float32)
    st = state_mod.create_from_pcd(pts, cols, capacity=cfg.capacity)
    opt_state = system.init_optimizer(st)

    batch = system.sampler.sample()
    step_fn = system.train_step_fn(0, 32, 32)

    params = replicate(st.params, mesh)
    stats = replicate(st.stats, mesh)
    opt_state = replicate(opt_state, mesh)
    cams, elev, azim = shard_view_batch(
        batch["gs_cameras"], batch["elevation"], batch["azimuth"], mesh
    )

    lambdas = {"sds": jnp.float32(1.0), "sparsity": jnp.float32(1.0), "opaque": jnp.float32(0.0)}
    g_params = replicate(system.guidance_params, mesh)
    params, stats, opt_state, aux = step_fn(
        params, stats, opt_state, cams, elev, azim,
        jax.random.key(0), jnp.float32(2.0), lambdas, g_params,
    )
    jax.block_until_ready(aux["loss"])
    assert np.isfinite(float(aux["loss"])), "multichip step produced non-finite loss"
    print(f"dryrun_multichip({n_devices}) ok: loss={float(aux['loss']):.4f}")

    if n_devices % 2 == 0:
        # production devices>views layout: B = n/2 views, each split into 2
        # horizontal strips via shard_map (systems/gaussiandreamer mesh mode;
        # parallel/dp.strip_cameras) -- one (view, strip) cell per chip
        B2 = n_devices // 2
        data_cfg2 = RandomCameraConfig(height=32, width=32, batch_size=B2)
        system2 = GaussianDreamerSystem(
            cfg, data_cfg2, guidance, emb, mesh=mesh
        )
        st2 = state_mod.create_from_pcd(pts, cols, capacity=cfg.capacity)
        auxes = []
        system2.fit(st2, callback=lambda s, _st, a: auxes.append(a))
        loss2 = float(auxes[0]["loss"])
        assert np.isfinite(loss2), "strip-mesh step produced non-finite loss"
        print(
            f"dryrun_multichip({n_devices}) strip mode ok "
            f"(B={B2} views x 2 strips): loss={loss2:.4f}"
        )

    _dryrun_vsd(mesh, n_devices)
    _dryrun_stage2_vit(mesh, n_devices)
    _dryrun_strip_deformer(n_devices)
    _dryrun_sharded_fit(n_devices)
    _dryrun_sharded_vsd(n_devices)


def _tiny_garment_artifacts(tmp, H=64, W=64, n_views=4):
    """Tiny stage-1/2-shaped artifacts (rgba renders + normals + cameras.json)
    plus a bumpy-tube template.obj, for driving stages 3/4 in the dryrun."""
    import json
    import os

    from PIL import Image

    from garmentdreamer_tpu.core import cameras as cc
    from garmentdreamer_tpu.core import io as gio

    rs = np.random.RandomState(0)
    t = np.linspace(0, 2 * np.pi, 14, endpoint=False)
    zz = np.linspace(-0.85, 0.85, 9)
    verts, faces = [], []
    for z in zz:
        for a in t:
            r = 0.75 + 0.1 * rs.uniform(-1, 1)
            verts.append((r * np.cos(a), r * np.sin(a), z))
    n_t = len(t)
    for i in range(len(zz) - 1):
        for j in range(n_t):
            a_, b_ = i * n_t + j, i * n_t + (j + 1) % n_t
            c_, d_ = (i + 1) * n_t + j, (i + 1) * n_t + (j + 1) % n_t
            faces.append((a_, b_, d_))
            faces.append((a_, d_, c_))
    tpl = os.path.join(tmp, "template.obj")
    gio.save_obj(tpl, gio.ObjMesh(
        vertices=np.array(verts, np.float32),
        faces=np.array(faces, np.int32),
    ))

    os.makedirs(os.path.join(tmp, "gs_rendered_rgba"))
    os.makedirs(os.path.join(tmp, "estimated_normals"))
    cams = []
    for i in range(n_views):
        pos = cc.spherical_positions(
            np.array([10.0]), np.array([i * 360.0 / n_views]), np.array([3.0])
        )
        c2w = cc.lookat_c2w(pos)[0]
        cams.append(cc.camera_json_entry(i, c2w, 70.0, H, W))
        rgba = np.zeros((H, W, 4), np.uint8)
        rgba[10:54, 14:50] = [140, 110, 90, 255]
        Image.fromarray(rgba, "RGBA").save(
            os.path.join(tmp, "gs_rendered_rgba", f"{i}.png")
        )
        nrm = np.full((H, W, 4), 128, np.uint8)
        nrm[..., 3] = rgba[..., 3]
        Image.fromarray(nrm, "RGBA").save(
            os.path.join(tmp, "estimated_normals", f"{i}.png")
        )
    with open(os.path.join(tmp, "cameras.json"), "w") as f:
        json.dump(cams, f)
    return tpl


def _dryrun_strip_deformer(n_devices: int) -> None:
    """Stage-3 strip-sharded step (VERDICT r4 next-1/next-9): the full
    two-stage deformer driver with each step's G-buffer render + per-pixel
    losses split into one row-strip per device (deformer/strips.py) must
    reproduce the single-device driver to float tolerance."""
    import tempfile

    from garmentdreamer_tpu.core import io as gio
    from garmentdreamer_tpu.deformer import DeformerConfig, deformation

    tmp = tempfile.mkdtemp(prefix="dryrun_strip_")
    tpl = _tiny_garment_artifacts(tmp)
    kw = dict(
        iterations_first=2, iterations_second=2, upsample_iterations=(),
        picked_views_first=(0, 4), picked_views_second=(0, 1, 2, 3),
        shading_samples=512, weight_shading=0.0, save_frequency=0,
        max_per_tile=128, max_tiles_per_tri=16, scan_chunk=2,
    )
    import os

    v1 = gio.load_obj(deformation(
        tmp, tpl, bound=1.75, cfg=DeformerConfig(**kw),
        output_dir=os.path.join(tmp, "d1"),
    )).vertices
    vN = gio.load_obj(deformation(
        tmp, tpl, bound=1.75, cfg=DeformerConfig(**kw),
        output_dir=os.path.join(tmp, "dN"), mesh_devices=n_devices,
    )).vertices
    np.testing.assert_allclose(vN, v1, atol=5e-5)
    print(
        f"dryrun_multichip strip deformer ok ({n_devices} row strips/step "
        f"== single device, max|dv|={np.abs(vN - v1).max():.2e})"
    )


def _dryrun_sharded_fit(n_devices: int) -> None:
    """Stage-4 pixel-sharded texture fit (VERDICT r4 next-1): the fit step's
    sampled pixel budget split over the mesh must reproduce the
    single-device fit to float tolerance (netf/trainer.py fit_texture)."""
    import tempfile

    import jax

    from garmentdreamer_tpu.netf import NeTFConfig, NeTFTrainer

    tmp = tempfile.mkdtemp(prefix="dryrun_fit_")
    tpl = _tiny_garment_artifacts(tmp)
    cfg = NeTFConfig(
        fit_tex_iters=6, fit_resolution=32, texture_resolution=64,
        reconstruction_picked_views=(0, 1, 2, 3),
        max_per_tile=64, max_tiles_per_tri=16, fit_pixel_budget=512,
    )
    import os

    finals = []
    for md in (0, n_devices):
        tr = NeTFTrainer(cfg, tpl, os.path.join(tmp, "gs_rendered_rgba"),
                         os.path.join(tmp, f"out{md}"), mesh_devices=md)
        tr.fit_texture(tmp, save=False)
        finals.append(jax.tree_util.tree_map(np.asarray, tr.tex_params))
    for a, b in zip(jax.tree_util.tree_leaves(finals[0]),
                    jax.tree_util.tree_leaves(finals[1])):
        np.testing.assert_allclose(b, a, atol=2e-5)
    print(
        f"dryrun_multichip sharded fit ok (budget 512 split over "
        f"{n_devices} devices == single device)"
    )


def _tiny_vsd_guidance():
    """Tiny VSD guidance stack (2-level UNet + VAE + LoRA + camera MLP) for
    the dryrun sections; returns (guidance, lora_params, camera_params)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from garmentdreamer_tpu.guidance.unet import UNetConfig, UNet2DCondition
    from garmentdreamer_tpu.guidance.vae import VAEConfig, AutoencoderKL
    from garmentdreamer_tpu.guidance.vsd import CameraEmb, VSDConfig, VSDGuidance

    ucfg = UNetConfig.tiny()
    unet = UNet2DCondition(ucfg)
    x0 = jnp.zeros((1, 8, 8, 4))
    t0 = jnp.zeros((1,), jnp.int32)
    ctx0 = jnp.zeros((1, 7, ucfg.cross_attention_dim))
    up = unet.init(jax.random.PRNGKey(0), x0, t0, ctx0)

    lcfg = dataclasses.replace(UNetConfig.tiny(), lora_rank=2, extra_emb_dim=32)
    lora = UNet2DCondition(lcfg)
    lp = lora.init(jax.random.PRNGKey(1), x0, t0, ctx0, extra_emb=jnp.zeros((1, 32)))

    vae = AutoencoderKL(VAEConfig.tiny())
    vp = vae.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(3),
        method=AutoencoderKL.sample_latents,
    )
    cam = CameraEmb(time_embed_dim=32)
    cp = cam.init(jax.random.PRNGKey(4), jnp.zeros((1, 16)))

    guidance = VSDGuidance(
        VSDConfig(latent_size=16, image_size=32, time_embed_dim=32),
        unet_apply=lambda p, x_, t_, c_: unet.apply(p, x_, t_, c_),
        unet_params=up,
        vae_encode=lambda p, im, r: vae.apply(
            p, im, r, method=AutoencoderKL.sample_latents
        ),
        vae_params=vp,
        lora_apply=lambda p, x_, t_, c_, e_: lora.apply(p, x_, t_, c_, extra_emb=e_),
        camera_emb_apply=lambda p, pose, sh: cam.apply(p, pose, sh),
    )
    return guidance, lp, cp, ucfg


def _dryrun_sharded_vsd(n_devices: int) -> None:
    """Stage-4 pixel-sharded VSD refinement (VERDICT r4 next-1 applied to the
    refinement loop): the full NeTFTrainer.train_vsd with the per-step
    covered-pixel query split over the mesh (renderer cover sharding + one
    grad psum) must reproduce the single-device refinement to float
    tolerance."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from garmentdreamer_tpu.core import io as gio
    from garmentdreamer_tpu.netf.trainer import NeTFConfig, NeTFTrainer

    tmp = tempfile.mkdtemp(prefix="dryrun_svsd_")
    tpl = _tiny_garment_artifacts(tmp)
    import os

    text = jnp.ones((2, 7, 32)) * 0.1
    finals = []
    for md in (0, n_devices):
        guidance, lp, cp, _ = _tiny_vsd_guidance()
        cfg = NeTFConfig(
            iters=2, fit_tex_iters=0, render_resolution=32,
            texture_resolution=32, batch_size_train=2,
            max_per_tile=64, max_tiles_per_tri=16,
        )
        tr = NeTFTrainer(
            cfg, tpl, os.path.join(tmp, "gs_rendered_rgba"),
            os.path.join(tmp, f"svsd{md}"), guidance=guidance,
            text_embeddings=text, q_params={"lora": lp, "camera": cp},
            mesh_devices=md,
        )
        tr.train_vsd()
        finals.append(jax.tree_util.tree_map(np.asarray, tr.tex_params))
    # Adam amplifies the partial-scatter reorder noise (~1e-7) toward the lr
    # scale on a few fresh table rows; see tests/test_netf.py
    # test_sharded_vsd_parity for the measured distribution
    for a, b in zip(jax.tree_util.tree_leaves(finals[0]),
                    jax.tree_util.tree_leaves(finals[1])):
        np.testing.assert_allclose(b, a, atol=8e-3)
        assert np.abs(b - a).mean() < 1e-4
    print(
        f"dryrun_multichip sharded VSD ok (cover query split over "
        f"{n_devices} devices == single device)"
    )


def _dryrun_vsd(mesh, n_devices: int) -> None:
    """Stage-4 VSD/LoRA training over the mesh: render -> frozen-SD CFG +
    LoRA v-pred -> texture grads (all-reduced by the SPMD partitioner) ->
    Adam, then one LoRA/camera-MLP update on the batch of latents.

    This is the likeliest sharding bug nest (two UNets, a partitioned
    trainable subset, grad accumulation collapsed into a batched step):
    view batch sharded over 'data', texture field + both UNets + optimizer
    states replicated (netf/trainer.py train_vsd layout at tiny shapes)."""
    import flax.traverse_util as tu
    import jax
    import jax.numpy as jnp
    import optax

    from garmentdreamer_tpu.netf.cameras import orbit_pose, perspective
    from garmentdreamer_tpu.netf.renderer import TextureField, render_textured
    from garmentdreamer_tpu.parallel import replicate, shard_batch
    from garmentdreamer_tpu.texture.encoders import HashGridConfig

    guidance, lp, cp, ucfg = _tiny_vsd_guidance()
    up, vp = guidance.unet_params, guidance.vae_params

    # small sphere mesh + small hash grid
    th = np.linspace(0, 2 * np.pi, 10, endpoint=False)
    zz = np.linspace(-0.9, 0.9, 7)
    verts = np.array(
        [
            (np.sqrt(max(1 - z * z, 1e-4)) * np.cos(a),
             np.sqrt(max(1 - z * z, 1e-4)) * np.sin(a), z)
            for z in zz for a in th
        ],
        np.float32,
    )
    faces = []
    n = len(th)
    for i in range(len(zz) - 1):
        for j in range(n):
            a_, b_ = i * n + j, i * n + (j + 1) % n
            c_, d_ = (i + 1) * n + j, (i + 1) * n + (j + 1) % n
            faces.append((a_, b_, d_))
            faces.append((a_, d_, c_))
    verts_d = jnp.asarray(verts)
    faces_d = jnp.asarray(np.array(faces, np.int32))

    field = TextureField(
        jax.random.PRNGKey(5),
        HashGridConfig(num_levels=4, log2_hashmap_size=10, desired_resolution=64),
    )
    tex_params = field.params
    tex_opt = optax.adam(1e-2)
    tex_opt_state = tex_opt.init(tex_params)

    flat_q = tu.flatten_dict({"lora": lp, "camera": cp})

    def _trainable(path):
        return "lora_down" in path or "lora_up" in path or path[0] == "camera"

    train_p = {k: v for k, v in flat_q.items() if _trainable(k)}
    frozen_p = {k: v for k, v in flat_q.items() if not _trainable(k)}

    def merge(train, frozen):
        d = dict(frozen)
        d.update(train)
        return tu.unflatten_dict(d)

    lora_opt = optax.adam(1e-4)
    lora_opt_state = lora_opt.init(train_p)

    B, res = n_devices, 32
    proj = jnp.asarray(perspective(49.1))
    poses = jnp.asarray(
        np.stack([orbit_pose(-10.0 + 3 * i, 360.0 * i / B, 4.5) for i in range(B)])
    ).astype(jnp.float32)
    text = jnp.ones((2, 7, ucfg.cross_attention_dim)) * 0.1
    sd_params = {"unet": up, "vae": vp}

    @jax.jit
    def super_step(tex_params, tex_opt_state, train_p, lora_opt_state,
                   poses, keys, frozen, sd_p):
        q = merge(train_p, frozen)

        def tex_loss(tp):
            def one(pose, key):
                out = render_textured(
                    tp, verts_d, faces_d, pose, proj, res, res, field,
                    max_tiles_per_tri=16, max_per_tile=64,
                )
                loss, lat = guidance.train_step(
                    q, out["image"][None], text, pose.reshape(1, 16), key,
                    params=sd_p,
                )
                return loss, lat[0]

            losses, lats = jax.vmap(one)(poses, keys)
            return losses.sum() / B, lats

        (loss, lats), grads = jax.value_and_grad(tex_loss, has_aux=True)(tex_params)
        updates, tex_opt_state = tex_opt.update(grads, tex_opt_state)
        tex_params = optax.apply_updates(tex_params, updates)

        def l_loss(tr):
            return guidance.lora_loss(
                merge(tr, frozen), lats,
                jnp.broadcast_to(text[:1], (B,) + text.shape[1:]),
                poses.reshape(B, 16), keys[0], uncond_p=0.1,
            )

        ll, lgrads = jax.value_and_grad(l_loss)(train_p)
        lupd, lora_opt_state = lora_opt.update(lgrads, lora_opt_state)
        train_p = optax.apply_updates(train_p, lupd)
        return tex_params, tex_opt_state, train_p, lora_opt_state, loss, ll

    tex_params = replicate(tex_params, mesh)
    tex_opt_state = replicate(tex_opt_state, mesh)
    train_p = replicate(train_p, mesh)
    lora_opt_state = replicate(lora_opt_state, mesh)
    frozen_p = replicate(frozen_p, mesh)
    sd_params = replicate(sd_params, mesh)
    poses = shard_batch(poses, mesh)
    keys = shard_batch(jax.random.split(jax.random.PRNGKey(6), B), mesh)

    out = super_step(tex_params, tex_opt_state, train_p, lora_opt_state,
                     poses, keys, frozen_p, sd_params)
    jax.block_until_ready(out[4])
    loss, ll = float(out[4]), float(out[5])
    assert np.isfinite(loss) and np.isfinite(ll), (
        f"VSD multichip step non-finite: vsd={loss} lora={ll}"
    )
    print(
        f"dryrun_multichip VSD/LoRA ok (B={B} views sharded, LoRA+camera "
        f"replicated): vsd_loss={loss:.4f} lora_loss={ll:.4f}"
    )


def _dryrun_stage2_vit(mesh, n_devices: int) -> None:
    """Stage-2 normal-estimator inference DP: one ViT+RAFT forward with the
    view batch sharded over 'data' and params replicated (the
    normal/pipeline.py mesh_devices layout at tiny config)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from garmentdreamer_tpu.normal.model import (
        NormalEstimator, NormalEstimatorConfig, init_params,
    )
    from garmentdreamer_tpu.parallel import replicate

    cfg = NormalEstimatorConfig.tiny()
    H, W = 56, 112  # multiple of 28 (patch 14, /4 grid)
    params = init_params(cfg, jax.random.PRNGKey(0), (H, W))
    model = NormalEstimator(cfg)

    @jax.jit
    def forward(p, img):
        return model.apply(p, img)["normal_out_list"][0]

    params = replicate(params, mesh)
    img = jax.device_put(
        jnp.linspace(0, 1, n_devices * H * W * 3, dtype=jnp.float32).reshape(
            n_devices, H, W, 3
        ),
        NamedSharding(mesh, P("data")),
    )
    out = forward(params, img)
    jax.block_until_ready(out)
    assert out.shape == (n_devices, H, W, 4)
    assert np.isfinite(np.asarray(out)).all(), "stage-2 DP forward non-finite"
    print(
        f"dryrun_multichip stage-2 ViT ok (B={n_devices} views sharded "
        f"@{H}x{W}): out={tuple(out.shape)}"
    )


if __name__ == "__main__":
    fn, args = entry()
    import jax

    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    print("entry ok:", [o.shape for o in out])

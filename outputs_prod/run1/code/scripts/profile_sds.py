"""On-chip profile of the stage-1 SDS train step (VERDICT r2 next-3).

Times the three jitted programs of the production train step at SD-2.1 scale
(B=4 views @512^2, 100k cloud) SEPARATELY, plus their interior hot parts
(UNet fwd, VAE encode fwd / fwd+bwd, splat XLA fwd / fwd+bwd), so the round-3
speedup work attacks the real bottleneck with data.

Also exercises the persistent compilation cache (jax_compilation_cache_dir):
run twice; the second run's wall-clock-to-first-result is the warm-compile
figure (VERDICT r2 next-2).

Writes one JSON line per measurement to stdout; run in background and poll
the log (foreground Bash timeouts kill chip work -- memory: axon-chip-env).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")  # repo-root imports (__graft_entry__); keep
# PYTHONPATH unset -- it breaks the sitecustomize that registers axon

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

RES = 512
N_GAUSS = 100_000
B = 4


def _sync(x):
    return np.asarray(x)


def emit(name, seconds, extra=None):
    rec = {"name": name, "ms": round(seconds * 1e3, 2)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def time_loop(fn, args_list, iters=8, warmup=2, name="?", extra=None):
    t_c0 = time.perf_counter()
    for i in range(warmup):
        _sync(fn(*args_list[i % len(args_list)]))
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = fn(*args_list[i % len(args_list)])
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    emit(name, dt, {**(extra or {}), "compile_s": round(compile_s, 1)})
    return dt


def main():
    t_start = time.perf_counter()
    import dataclasses

    from __graft_entry__ import _make_scene
    from garmentdreamer_tpu.core import cameras as cam
    from garmentdreamer_tpu.data.cameras import RandomCameraConfig
    from garmentdreamer_tpu.guidance import (
        AutoencoderKL, PromptEmbeddings, SDSConfig, SDSGuidance,
        UNet2DCondition, UNetConfig, VAEConfig,
    )
    from garmentdreamer_tpu.systems.gaussiandreamer import (
        GaussianDreamerConfig, GaussianDreamerSystem,
    )

    ucfg = dataclasses.replace(UNetConfig.sd21(), dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    vcfg = dataclasses.replace(VAEConfig(), dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg)
    k = jax.random.key(0)
    up = jax.eval_shape(
        lambda: unet.init(k, jnp.zeros((1, 64, 64, 4)), jnp.array([0]),
                          jnp.zeros((1, 77, ucfg.cross_attention_dim)))
    )
    up = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), up)
    vp = jax.eval_shape(lambda: vae.init(k, jnp.zeros((1, 512, 512, 3)), k))
    vp = jax.tree.map(lambda s: jnp.full(s.shape, 0.02, s.dtype), vp)

    # ---- interior parts -------------------------------------------------
    # UNet forward at the CFG batch (2B = 8)
    unet_fn = jax.jit(lambda p, l, t, c: unet.apply(p, l, t, c).sum())
    lat_in = [jax.random.normal(jax.random.key(i), (2 * B, 64, 64, 4)) for i in range(3)]
    txt = jnp.ones((2 * B, 77, ucfg.cross_attention_dim)) * 0.01
    t_in = jnp.full((2 * B,), 500, jnp.int32)
    time_loop(lambda l: unet_fn(up, l, t_in, txt), [(l,) for l in lat_in],
              name="unet_fwd_b8_64", iters=8)

    # VAE encode forward (B=4 @512^2)
    venc = jax.jit(lambda p, x, r: vae.apply(p, x, r, method=AutoencoderKL.sample_latents).sum())
    imgs = [jax.random.normal(jax.random.key(10 + i), (B, 512, 512, 3)) for i in range(3)]
    time_loop(lambda x: venc(vp, x, jax.random.key(0)), [(x,) for x in imgs],
              name="vae_enc_fwd_b4_512", iters=8)

    # VAE encode fwd+bwd (the differentiated path in guidance_grads)
    def venc_loss(p, x, r):
        z = vae.apply(p, x, r, method=AutoencoderKL.sample_latents)
        return jnp.sum(z * z)

    venc_grad = jax.jit(lambda p, x, r: jax.grad(venc_loss, argnums=1)(p, x, r).sum())
    time_loop(lambda x: venc_grad(vp, x, jax.random.key(0)), [(x,) for x in imgs],
              name="vae_enc_fwdbwd_b4_512", iters=8)

    # A/B: same program with the space-to-batch pass disabled (core/xla_opts;
    # round-3 finding -- the s2b rewrite drowns the encoder in layout copies)
    from garmentdreamer_tpu.core.xla_opts import conv_jit

    venc_grad_opt = conv_jit(
        lambda p, x, r: jax.grad(venc_loss, argnums=1)(p, x, r).sum()
    )
    time_loop(lambda x: venc_grad_opt(vp, x, jax.random.key(0)),
              [(x,) for x in imgs], name="vae_enc_fwdbwd_b4_512_no_s2b", iters=8)

    # ---- the three production programs ---------------------------------
    guidance = SDSGuidance(
        SDSConfig(latent_size=64, image_size=512, guidance_scale=100.0),
        lambda p, l, t, c: unet.apply(p, l, t, c), up,
        lambda p, x, r: vae.apply(p, x, r, method=AutoencoderKL.sample_latents), vp,
    )
    emb = PromptEmbeddings(
        text_vd=jnp.ones((4, 77, ucfg.cross_attention_dim)) * 0.01,
        uncond_vd=jnp.zeros((4, 77, ucfg.cross_attention_dim)),
        text=jnp.ones((77, ucfg.cross_attention_dim)) * 0.01,
        uncond=jnp.zeros((77, ucfg.cross_attention_dim)),
    )
    cfg = GaussianDreamerConfig(capacity=1 << 17, max_steps=1)
    data_cfg = RandomCameraConfig(height=RES, width=RES, batch_size=B)
    system = GaussianDreamerSystem(cfg, data_cfg, guidance, emb)
    st = _make_scene(n=N_GAUSS, cap=cfg.capacity)
    opt_state = system.init_optimizer(st)
    g_params = system.guidance_params

    # re-create the three programs exactly as _build_train_step does, so each
    # can be timed in isolation
    from garmentdreamer_tpu.splat import state as state_mod
    from garmentdreamer_tpu.splat.render import render_batch
    from garmentdreamer_tpu.guidance.prompt import select_text_embeddings

    bg = jnp.asarray(cfg.bg_color, jnp.float32)

    batches = [system.sampler.sample(step=i) for i in range(3)]
    cams_list = [
        {kk: jnp.asarray(v) for kk, v in b["gs_cameras"].items()} for b in batches
    ]

    def _state(params, stats):
        return state_mod.GaussianState(
            params=params, stats=stats, active_sh_degree=0, max_sh_degree=cfg.sh_degree
        )

    @jax.jit
    def render_fwd(params, stats, cams):
        out = render_batch(
            _state(params, stats), cams, bg, RES, RES,
            max_per_tile=512, fast=True, payload_dtype="packed",
            classes=((6, None), (64, 8192)),
        )
        return out["render"], out["depth"]

    time_loop(lambda c: render_fwd(st.params, st.stats, c)[0].sum(),
              [(c,) for c in cams_list], name="A_render_fwd_packed_b4", iters=8)

    @jax.jit
    def guidance_grads(g_params, images, depth, elevation, azimuth, rng):
        text_emb = select_text_embeddings(emb, elevation, azimuth)

        def loss_fn(im, dp):
            g_out = guidance(
                im, text_emb, rng,
                min_step_percent=cfg.min_step_percent,
                max_step_percent=cfg.max_step_percent,
                grad_clip_val=jnp.float32(2.0), params=g_params,
            )
            opacity_norm = dp / (jnp.max(dp) + 1e-5)
            loss = g_out["loss_sds"] + jnp.mean(jnp.sqrt(opacity_norm**2 + 0.01))
            return loss, g_out["loss_sds"]

        (d_im, d_dp), _aux = jax.grad(loss_fn, argnums=(0, 1), has_aux=True)(images, depth)
        return d_im, d_dp

    im0, dp0 = render_fwd(st.params, st.stats, cams_list[0])
    elev = jnp.asarray(batches[0]["elevation"]); azim = jnp.asarray(batches[0]["azimuth"])
    gg_args = [(g_params, im0, dp0, elev, azim, jax.random.key(i)) for i in range(3)]
    time_loop(lambda *a: guidance_grads(*a)[0].sum(), gg_args,
              name="B_guidance_grads_b4", iters=8)

    d_im, d_dp = guidance_grads(*gg_args[0])

    @jax.jit
    def apply_grads(params, stats, opt_state, cams, d_im, d_dp):
        stt = _state(params, stats)
        B_ = d_im.shape[0]
        screen_offsets = jnp.zeros((B_, stt.capacity, 2), jnp.float32)

        def proxy(p, so):
            out = render_batch(
                stt.replace(params=p), cams, bg, RES, RES,
                screen_offsets=so,
                max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
                max_per_tile=cfg.max_per_tile,
                big_budget=cfg.big_budget, big_tiles=cfg.big_tiles,
            )
            val = jnp.sum(out["render"] * d_im) + jnp.sum(out["depth"] * d_dp)
            return val, (out["radii"], jnp.sum(out["n_dropped"]))

        (_, (radii, n_dropped)), (grads, so_grads) = jax.value_and_grad(
            proxy, argnums=(0, 1), has_aux=True
        )(stt.params, screen_offsets)
        return sum(jnp.sum(g) for g in jax.tree.leaves(grads))

    ag_args = [(st.params, st.stats, opt_state, c, d_im, d_dp) for c in cams_list]
    time_loop(lambda *a: apply_grads(*a), ag_args, name="C_apply_grads_b4", iters=6)

    # splat XLA-path fwd alone at B=4 for reference
    @jax.jit
    def xla_fwd(params, stats, cams):
        out = render_batch(
            _state(params, stats), cams, bg, RES, RES,
            max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
            max_per_tile=cfg.max_per_tile,
            big_budget=cfg.big_budget, big_tiles=cfg.big_tiles,
        )
        return out["render"].sum()

    time_loop(lambda c: xla_fwd(st.params, st.stats, c), [(c,) for c in cams_list],
              name="xla_render_fwd_b4", iters=6)

    emit("total_wallclock", time.perf_counter() - t_start)


if __name__ == "__main__":
    main()

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.guidance import (
    AutoencoderKL,
    PromptConfig,
    PromptEmbeddings,
    PromptProcessor,
    SDSConfig,
    SDSGuidance,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
    add_noise,
    ddim_step,
    eps_from_velocity,
    make_schedule,
    select_text_embeddings,
    velocity_from_eps,
    view_direction_index,
)


def test_schedule_matches_diffusers_table():
    s = make_schedule()
    # endpoints of the scaled_linear schedule for SD
    assert float(s.betas[0]) == pytest.approx(0.00085, rel=1e-5)
    assert float(s.betas[-1]) == pytest.approx(0.012, rel=1e-5)
    # known alphas_cumprod endpoints (diffusers DDIMScheduler values)
    assert float(s.alphas_cumprod[0]) == pytest.approx(1 - 0.00085, rel=1e-5)
    assert float(s.alphas_cumprod[-1]) == pytest.approx(0.0047, abs=2e-4)
    assert (np.diff(np.asarray(s.alphas_cumprod)) < 0).all()


def test_add_noise_and_velocity_roundtrip():
    s = make_schedule()
    rng = jax.random.key(0)
    x0 = jax.random.normal(rng, (2, 8, 8, 4))
    eps = jax.random.normal(jax.random.key(1), x0.shape)
    t = jnp.array([10, 500])
    xt = add_noise(s, x0, eps, t)
    v = velocity_from_eps(s, x0, eps, t)
    eps_back = eps_from_velocity(s, xt, v, t)
    np.testing.assert_allclose(np.asarray(eps_back), np.asarray(eps), atol=1e-5)


def test_ddim_step_denoises_exactly_for_perfect_eps():
    s = make_schedule()
    x0 = jax.random.normal(jax.random.key(2), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.key(3), x0.shape)
    t = jnp.array([999])
    xt = add_noise(s, x0, eps, t)
    x_prev = ddim_step(s, xt, eps, t, jnp.array([-1]))  # jump straight to clean
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x0), atol=1e-4)


def test_view_direction_index():
    elev = jnp.array([0.0, 0.0, 0.0, 80.0, 0.0])
    azim = jnp.array([90.0, 10.0, 175.0, 0.0, -170.0])
    idx = np.asarray(view_direction_index(elev, azim))
    assert list(idx) == [0, 1, 2, 3, 2]  # side, front, back, overhead, back


@pytest.mark.slow
def test_unet_tiny_shapes_and_determinism():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    rng = jax.random.key(0)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([10, 20])
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
    params = model.init(rng, x, t, ctx)
    y = model.apply(params, x, t, ctx)
    assert y.shape == (2, 16, 16, 4)
    y2 = model.apply(params, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))
    # timestep affects output
    y3 = model.apply(params, x, jnp.array([500, 600]), ctx)
    assert np.abs(np.asarray(y3 - y)).max() > 1e-6


@pytest.mark.slow
def test_unet_lora_init_is_identity():
    cfg = UNetConfig.tiny()
    lora_cfg = UNetConfig(
        block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
        cross_attention_dim=cfg.cross_attention_dim,
        attention_head_dim=cfg.attention_head_dim,
        down_block_types=cfg.down_block_types,
        up_block_types=cfg.up_block_types,
        norm_groups=cfg.norm_groups,
        lora_rank=4,
    )
    base = UNet2DCondition(cfg)
    lora = UNet2DCondition(lora_cfg)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
    t = jnp.array([100])
    ctx = jax.random.normal(jax.random.key(2), (1, 7, cfg.cross_attention_dim))
    lora_params = lora.init(jax.random.key(0), x, t, ctx)
    y_lora = lora.apply(lora_params, x, t, ctx)

    # strip lora leaves -> same params for base model; lora_up is zero-init so
    # outputs must match exactly
    def strip(d):
        if isinstance(d, dict):
            return {k: strip(v) for k, v in d.items() if k not in ("lora_down", "lora_up")}
        return d

    import flax

    raw = flax.core.unfreeze(lora_params)
    y_base = base.apply(strip(raw), x, t, ctx)
    np.testing.assert_allclose(np.asarray(y_lora), np.asarray(y_base), atol=1e-6)


def test_unet_extra_emb_changes_output():
    import dataclasses

    cfg = dataclasses.replace(UNetConfig.tiny(), extra_emb_dim=16)
    model = UNet2DCondition(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([5])
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    extra = jnp.ones((1, 16))
    params = model.init(jax.random.key(0), x, t, ctx, extra)
    y0 = model.apply(params, x, t, ctx, jnp.zeros((1, 16)))
    y1 = model.apply(params, x, t, ctx, extra)
    assert np.abs(np.asarray(y1 - y0)).max() > 1e-6


def test_vae_tiny_roundtrip_shapes():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    params = vae.init(jax.random.key(1), x, jax.random.key(2))
    mean, logvar = vae.apply(params, x, method=AutoencoderKL.encode)
    assert mean.shape == (1, 16, 16, 4)  # two downsamples
    z = vae.apply(params, x, jax.random.key(3), method=AutoencoderKL.sample_latents)
    rec = vae.apply(params, z, method=AutoencoderKL.decode)
    assert rec.shape == x.shape


def test_prompt_processor_cache_and_selection(tmp_path):
    D, L = 16, 7
    calls = {"n": 0}

    def fake_encode(prompts):
        calls["n"] += 1
        # deterministic embedding from hash of text
        out = np.stack(
            [
                np.full((L, D), (hash(p) % 1000) / 1000.0, np.float32)
                for p in prompts
            ]
        )
        return out

    cfg = PromptConfig(
        prompt="a blue denim tee",
        negative_prompt="ugly",
        positive_prompt_head="A DSLR photo of ",
        positive_prompt_tail="best quality",
        cache_dir=str(tmp_path),
    )
    pp = PromptProcessor(cfg, fake_encode)
    emb = pp()
    assert emb.text_vd.shape == (4, L, D)
    assert calls["n"] == 1
    # second construction hits the cache
    pp2 = PromptProcessor(cfg, fake_encode)
    assert calls["n"] == 1
    np.testing.assert_allclose(np.asarray(pp2().text_vd), np.asarray(emb.text_vd))

    sel = select_text_embeddings(emb, jnp.array([0.0, 80.0]), jnp.array([10.0, 0.0]))
    assert sel.shape == (4, L, D)  # 2 cond + 2 uncond
    np.testing.assert_allclose(np.asarray(sel[0]), np.asarray(emb.text_vd[1]))  # front
    np.testing.assert_allclose(np.asarray(sel[1]), np.asarray(emb.text_vd[3]))  # overhead


def _tiny_guidance():
    ucfg = UNetConfig.tiny()
    unet = UNet2DCondition(ucfg)
    vcfg = VAEConfig.tiny()
    vae = AutoencoderKL(vcfg)
    latent, img = 8, 32
    x = jnp.zeros((1, latent, latent, 4))
    ctx = jnp.zeros((1, 7, ucfg.cross_attention_dim))
    up = unet.init(jax.random.key(0), x, jnp.array([0]), ctx)
    vp = vae.init(jax.random.key(1), jnp.zeros((1, img, img, 3)), jax.random.key(2))

    def unet_apply(params, lat, t, ctx):
        return unet.apply(params, lat, t, ctx)

    def vae_encode(params, images, rng):
        return vae.apply(params, images, rng, method=AutoencoderKL.sample_latents)

    cfg = SDSConfig(latent_size=latent, image_size=img, guidance_scale=7.5)
    return SDSGuidance(cfg, unet_apply, up, vae_encode, vp), ucfg


@pytest.mark.slow
def test_sds_loss_and_gradient_flow():
    guidance, ucfg = _tiny_guidance()
    rgb = jnp.full((2, 24, 24, 3), 0.5)
    emb = jnp.zeros((4, 7, ucfg.cross_attention_dim))

    def loss_fn(rgb):
        out = guidance(rgb, emb, jax.random.key(0), grad_clip_val=jnp.float32(2.0))
        return out["loss_sds"]

    loss, g = jax.value_and_grad(loss_fn)(rgb)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0

    # t range respected
    out = guidance(rgb, emb, jax.random.key(1), min_step_percent=0.02, max_step_percent=0.55)
    t = np.asarray(out["t"])
    assert (t >= 20).all() and (t <= 550).all()


@pytest.mark.slow
def test_sjc_grad_matches_reference_algebra():
    """SJC branch (stable_diffusion_guidance.py:278-372): with a stubbed
    eps-predictor the grad must equal the closed form
    -(Ds - y)/sigma = eps_hat - (y + sigma*eps - y)/sigma ... = eps_hat - eps
    scaled into sigma space; verify both var_red settings against an
    independent numpy re-derivation."""
    import dataclasses as dc

    from garmentdreamer_tpu.guidance.scheduler import make_schedule

    latent = 8
    sched = make_schedule(1000)

    # stub unet: eps_hat == 2 * input latents (deterministic, CFG collapses
    # since cond == uncond inputs)
    def unet_apply(params, lat, t, ctx):
        return 2.0 * lat

    def vae_encode(params, images, rng):
        B = images.shape[0]
        return jnp.mean(images, axis=-1, keepdims=True)[
            :, :latent, :latent, :
        ] * jnp.ones((B, latent, latent, 4))

    for var_red in (True, False):
        cfg = SDSConfig(latent_size=latent, image_size=16, guidance_scale=3.0,
                        use_sjc=True, var_red=var_red)
        g = SDSGuidance(cfg, unet_apply, None, vae_encode, None)
        rgb = jnp.full((1, 16, 16, 3), 0.25)
        emb = jnp.zeros((2, 7, 4))
        rng = jax.random.key(0)
        out = g(rgb, emb, rng)
        assert np.isfinite(float(out["loss_sds"]))

        # independent recomputation: replicate the rng splits
        rng_vae, rng_t, rng_noise = jax.random.split(rng, 3)
        y = np.asarray(vae_encode(None, jax.image.resize(rgb, (1, 16, 16, 3), "bilinear") * 2 - 1, rng_vae))
        mn, mx = g.min_max_step(cfg.min_step_percent, cfg.max_step_percent)
        t = np.asarray(jax.random.randint(rng_t, (1,), mn, mx + 1))
        noise = np.asarray(jax.random.normal(rng_noise, y.shape))
        a = np.asarray(sched.alphas_cumprod)[t].reshape(1, 1, 1, 1)
        sigma = np.sqrt((1 - a) / a)
        zs = y + sigma * noise
        scaled = zs / np.sqrt(1 + sigma**2)
        e = 2.0 * scaled  # stub
        eps_hat = e + cfg.guidance_scale * (e - e)  # cond==uncond
        Ds = zs - sigma * eps_hat
        grad = -(Ds - y) / sigma if var_red else -(Ds - zs) / sigma
        expect = 0.5 * np.sum((y - (y - grad)) ** 2) / 1
        np.testing.assert_allclose(float(out["loss_sds"]), expect, rtol=1e-4)


class TestGuidanceEval:
    @pytest.mark.slow
    def test_preview_shapes_and_range(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from garmentdreamer_tpu.guidance import (
            AutoencoderKL, SDSConfig, SDSGuidance, UNet2DCondition, UNetConfig, VAEConfig,
        )
        from garmentdreamer_tpu.guidance.sds import guidance_eval

        ucfg = UNetConfig.tiny()
        unet = UNet2DCondition(ucfg)
        vae = AutoencoderKL(VAEConfig.tiny())
        latent, img = 16, 32
        up = unet.init(jax.random.key(0), jnp.zeros((1, latent, latent, 4)),
                       jnp.array([0]), jnp.zeros((1, 7, ucfg.cross_attention_dim)))
        vp = vae.init(jax.random.key(1), jnp.zeros((1, img, img, 3)), jax.random.key(2))
        g = SDSGuidance(
            SDSConfig(latent_size=latent, image_size=img, guidance_scale=7.5),
            lambda p, l, t, c: unet.apply(p, l, t, c), up,
            lambda p, x, r: vae.apply(p, x, r, method=AutoencoderKL.sample_latents), vp,
        )
        rgb = jax.random.uniform(jax.random.PRNGKey(0), (2, img, img, 3))
        text = jax.random.normal(jax.random.PRNGKey(1), (4, 7, ucfg.cross_attention_dim))
        out = guidance_eval(
            g, lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode), vp,
            rgb, text, jax.random.PRNGKey(2), num_steps=4,
        )
        for k in ("img_noisy", "img_1step", "img_final"):
            a = np.asarray(out[k])
            assert a.shape == (2, img, img, 3)
            assert (a >= 0).all() and (a <= 1).all()
        assert out["t"].shape == (2,)

"""Config-gated guidance variants reach the jitted step (VERDICT r2 next-5).

Round 2 shipped Perp-Neg and SJC as unit-tested library code with no
activation path; these tests pin the wiring: the YAML-exposed flags flow
through build_guidance_stack / GaussianDreamerSystem into the train step,
the Perp-Neg path actually runs the 4-way UNet batch (reference:
stable_diffusion_guidance.py:185-232), and each variant trains a finite
step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.data.cameras import RandomCameraConfig
from garmentdreamer_tpu.guidance import (
    AutoencoderKL,
    PromptConfig,
    PromptEmbeddings,
    SDSConfig,
    SDSGuidance,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from garmentdreamer_tpu.systems.gaussiandreamer import (
    GaussianDreamerConfig,
    GaussianDreamerSystem,
)


def _tiny_guidance(use_sjc=False, record_batches=None):
    ucfg = UNetConfig.tiny()
    unet = UNet2DCondition(ucfg)
    vcfg = VAEConfig.tiny()
    vae = AutoencoderKL(vcfg)
    latent, img = 8, 32
    up = unet.init(
        jax.random.key(0), jnp.zeros((1, latent, latent, 4)), jnp.array([0]),
        jnp.zeros((1, 7, ucfg.cross_attention_dim)),
    )
    vp = vae.init(jax.random.key(1), jnp.zeros((1, img, img, 3)), jax.random.key(2))

    def unet_apply(params, lat, t, ctx):
        if record_batches is not None:
            # shapes are static: recorded once at trace time
            record_batches.append(int(lat.shape[0]))
        return unet.apply(params, lat, t, ctx)

    def vae_encode(params, images, rng):
        return vae.apply(params, images, rng, method=AutoencoderKL.sample_latents)

    g = SDSGuidance(
        SDSConfig(latent_size=latent, image_size=img, guidance_scale=7.5,
                  use_sjc=use_sjc),
        unet_apply, up, vae_encode, vp,
    )
    emb = PromptEmbeddings(
        text_vd=jnp.ones((4, 7, ucfg.cross_attention_dim)) * 0.1,
        uncond_vd=jnp.zeros((4, 7, ucfg.cross_attention_dim)),
        text=jnp.ones((7, ucfg.cross_attention_dim)) * 0.1,
        uncond=jnp.zeros((7, ucfg.cross_attention_dim)),
    )
    return g, emb


def _run_one_step(guidance, emb, prompt_cfg=None):
    cfg = GaussianDreamerConfig(
        num_pts_space=500, num_surface_pts=0, capacity=512, max_steps=1,
        densify_from=10, max_tiles_per_gaussian=8, max_per_tile=128,
    )
    data_cfg = RandomCameraConfig(height=32, width=32, batch_size=2)
    sys = GaussianDreamerSystem(cfg, data_cfg, guidance, emb,
                                prompt_cfg=prompt_cfg)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(300, 3)).astype(np.float32) * 0.5
    cols = rng.uniform(size=(300, 3)).astype(np.float32)
    from garmentdreamer_tpu.splat import state as state_mod

    st = state_mod.create_from_pcd(pts, cols, capacity=cfg.capacity)
    losses = []
    sys.fit(st, callback=lambda step, s, aux: losses.append(float(aux["loss"])))
    return losses


@pytest.mark.slow
def test_perp_neg_step_runs_4way_unet_batch():
    seen = []
    g, emb = _tiny_guidance(record_batches=seen)
    pcfg = PromptConfig(prompt="p", use_perp_neg=True)
    losses = _run_one_step(g, emb, prompt_cfg=pcfg)
    assert len(losses) == 1 and np.isfinite(losses[0])
    # B=2 views -> the perp-neg layout batches [pos, uncond, neg0, neg1] = 4B
    assert 8 in seen, f"UNet batches seen: {seen} (expected 4B=8)"


@pytest.mark.slow
def test_sjc_step_finite():
    g, emb = _tiny_guidance(use_sjc=True)
    losses = _run_one_step(g, emb)
    assert len(losses) == 1 and np.isfinite(losses[0])


def test_build_guidance_stack_gates_flags(tmp_path):
    from garmentdreamer_tpu.pipeline.models import build_guidance_stack

    stack = build_guidance_stack(
        "a dress", scale="tiny", with_vsd=False,
        cache_dir=str(tmp_path / "c1"),
        use_sjc=True, use_perp_neg=True,
        prompt_overrides={"perp_neg_f_sb": [2.0, 0.5, -0.6]},
    )
    assert stack.sds.cfg.use_sjc is True
    assert stack.prompt_cfg.use_perp_neg is True
    assert stack.prompt_cfg.perp_neg_f_sb == (2.0, 0.5, -0.6)

    stack2 = build_guidance_stack(
        "a dress", scale="tiny", with_vsd=False,
        cache_dir=str(tmp_path / "c2"),
    )
    assert stack2.sds.cfg.use_sjc is False
    assert stack2.prompt_cfg.use_perp_neg is False

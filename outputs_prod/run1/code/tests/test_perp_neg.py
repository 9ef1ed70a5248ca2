"""Perp-Neg prompt/guidance path (reference: base.py:80-165,
stable_diffusion_guidance.py:185-232, ops.py:423-442)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.guidance.prompt import (
    PromptConfig,
    PromptEmbeddings,
    get_text_embeddings_perp_neg,
    shift_azimuth_deg,
    shifted_exponential_decay,
    view_direction_index,
)
from garmentdreamer_tpu.guidance.sds import perpendicular_component


def _emb(L=5, D=7, seed=0):
    r = np.random.RandomState(seed)
    return PromptEmbeddings(
        text_vd=jnp.asarray(r.randn(4, L, D).astype(np.float32)),
        uncond_vd=jnp.asarray(r.randn(4, L, D).astype(np.float32)),
        text=jnp.asarray(r.randn(L, D).astype(np.float32)),
        uncond=jnp.asarray(r.randn(L, D).astype(np.float32)),
    )


def _reference_loop(emb, elev, azim, cfg):
    """Independent numpy re-derivation of the reference's per-view loop."""
    idx = np.asarray(view_direction_index(jnp.asarray(elev), jnp.asarray(azim),
                                          cfg.front_threshold, cfg.back_threshold,
                                          cfg.overhead_threshold))
    side, front, back, overhead = [np.asarray(emb.text_vd[i]) for i in range(4)]
    uncond_vd = np.asarray(emb.uncond_vd)

    def decay(f, r):
        a, b, c = f
        return a * np.exp(-b * r) + c

    pos, unc, negs, ws = [], [], [], []
    for i in range(len(elev)):
        azi = (azim[i] + 180) % 360 - 180
        unc.append(uncond_vd[idx[i]])
        if idx[i] == 3:
            pos.append(overhead)
            negs += [uncond_vd[idx[i]], uncond_vd[idx[i]]]
            ws += [0.0, 0.0]
        elif abs(azi) < 90:
            r = 1 - abs(azi) / 90
            pos.append(r * front + (1 - r) * side)
            negs += [front, side]
            ws += [-decay(cfg.perp_neg_f_fs, r), -decay(cfg.perp_neg_f_sf, 1 - r)]
        else:
            r = 2 - abs(azi) / 90
            pos.append(r * side + (1 - r) * back)
            negs += [side, front]
            ws += [-decay(cfg.perp_neg_f_sb, r), -decay(cfg.perp_neg_f_fsb, r)]
    text = np.concatenate([np.stack(pos), np.stack(unc), np.stack(negs)], 0)
    return text, np.asarray(ws, np.float32).reshape(len(elev), 2)


@pytest.mark.parametrize(
    "elev,azim",
    [
        # front (azi 0), side (azi 90-ish edge), back (azi 170), overhead,
        # negative azimuths, interpolation mid-points
        ([0.0, 5.0, 10.0, 75.0], [0.0, 95.0, 170.0, 0.0]),
        ([0.0, 0.0, 0.0, 0.0], [-30.0, -120.0, 45.0, 89.0]),
        ([20.0, 61.0, -10.0, 0.0], [200.0, 10.0, -170.0, 135.0]),
    ],
)
def test_perp_neg_matches_reference_algebra(elev, azim):
    cfg = PromptConfig(use_perp_neg=True)
    emb = _emb()
    want_text, want_w = _reference_loop(emb, elev, azim, cfg)
    got_text, got_w = get_text_embeddings_perp_neg(
        emb, jnp.asarray(elev), jnp.asarray(azim), cfg
    )
    np.testing.assert_allclose(np.asarray(got_w), want_w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_text), want_text, rtol=1e-5, atol=1e-6)


def test_decay_zero_at_one():
    # f_fs is chosen so f(1) ~ 0 (reference comment base.py:201-205)
    v = shifted_exponential_decay(4.0, 0.5, -2.426, jnp.asarray(1.0))
    assert abs(float(v)) < 1e-2


def test_perpendicular_component():
    r = np.random.RandomState(0)
    x = jnp.asarray(r.randn(3, 4, 4, 2).astype(np.float32))
    y = jnp.asarray(r.randn(3, 4, 4, 2).astype(np.float32))
    p = perpendicular_component(x, y)
    dots = np.asarray(jnp.sum(p * y, axis=(1, 2, 3)))
    np.testing.assert_allclose(dots, 0.0, atol=1e-4)
    # perpendicular to y, and x - p is parallel to y
    resid = np.asarray(x - p)
    yn = np.asarray(y)
    for i in range(3):
        c = np.dot(resid[i].ravel(), yn[i].ravel()) / np.dot(yn[i].ravel(), yn[i].ravel())
        np.testing.assert_allclose(resid[i], c * yn[i], atol=1e-5)


@pytest.mark.slow
def test_sds_perp_neg_branch_runs_and_grads():
    from garmentdreamer_tpu.guidance import (
        AutoencoderKL, SDSConfig, SDSGuidance, UNet2DCondition, UNetConfig, VAEConfig,
    )

    ucfg = UNetConfig.tiny()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(VAEConfig.tiny())
    latent, img = 8, 32
    up = unet.init(jax.random.key(0), jnp.zeros((1, latent, latent, 4)),
                   jnp.array([0]), jnp.zeros((1, 5, ucfg.cross_attention_dim)))
    vp = vae.init(jax.random.key(1), jnp.zeros((1, img, img, 3)), jax.random.key(2))
    g = SDSGuidance(
        SDSConfig(latent_size=latent, image_size=img, guidance_scale=7.5),
        lambda p, l, t, c: unet.apply(p, l, t, c), up,
        lambda p, x, r: vae.apply(p, x, r, method=AutoencoderKL.sample_latents), vp,
    )
    B = 2
    emb = _emb(L=5, D=ucfg.cross_attention_dim)
    cfg = PromptConfig(use_perp_neg=True)
    text, w = get_text_embeddings_perp_neg(
        emb, jnp.asarray([10.0, 0.0]), jnp.asarray([30.0, 160.0]), cfg
    )
    assert text.shape == (4 * B, 5, ucfg.cross_attention_dim)

    def loss_fn(rgb):
        out = g(rgb, text, jax.random.key(3), neg_guidance_weights=w)
        return out["loss_sds"]

    rgb = jnp.ones((B, img, img, 3)) * 0.5
    val, grad = jax.value_and_grad(loss_fn)(rgb)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).max()) > 0

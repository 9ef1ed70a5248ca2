"""IF-II super-resolution guidance (reference: netf/guidance/if2_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.guidance import UNet2DCondition
from garmentdreamer_tpu.guidance.if2 import (
    IF2Config,
    IF2Guidance,
    direction_index,
    if2_unet_config,
)


def test_direction_index_thresholds():
    # if2_utils.py:140-145: front |h|<60, side |h|<120, back otherwise
    hors = jnp.array([0.0, 59.9, -59.9, 60.0, 119.9, -100.0, 120.0, 180.0, -150.0])
    expect = jnp.array([0, 0, 0, 1, 1, 1, 2, 2, 2])
    np.testing.assert_array_equal(np.asarray(direction_index(hors)), np.asarray(expect))


def _tiny_if2(R=32):
    cfg = if2_unet_config(tiny=True)
    unet = UNet2DCondition(cfg)
    params = unet.init(
        jax.random.key(0),
        jnp.zeros((1, R, R, 6)),
        jnp.array([0]),
        jnp.zeros((1, 7, cfg.cross_attention_dim)),
        jnp.zeros((1, cfg.extra_emb_dim)),
    )
    gcfg = IF2Config(resolution=R, extra_emb_dim=cfg.extra_emb_dim)
    g = IF2Guidance(
        gcfg,
        lambda p, x, t, c, e: unet.apply(p, x, t, c, e),
        params,
    )
    return g, cfg


@pytest.mark.slow
def test_if2_unet_io_shapes():
    g, cfg = _tiny_if2()
    out = g.unet_apply(
        g.unet_params,
        jnp.zeros((2, 32, 32, 6)),
        jnp.array([10, 20]),
        jnp.zeros((2, 7, cfg.cross_attention_dim)),
        jnp.zeros((2, cfg.extra_emb_dim)),
    )
    assert out.shape == (2, 32, 32, 6)  # eps + learned variance


@pytest.mark.slow
def test_if2_loss_and_gradient_flow():
    g, cfg = _tiny_if2()
    B, R = 2, 32
    rng = jax.random.key(1)
    pred = jax.random.uniform(jax.random.key(2), (B, R, R, 3))
    ori = jax.random.uniform(jax.random.key(3), (B, R, R, 3))
    text = jnp.ones((B, 7, cfg.cross_attention_dim)) * 0.1
    uncond = jnp.zeros((B, 7, cfg.cross_attention_dim))

    def loss_of(x):
        return g(x, ori, text, uncond, rng)["loss_sds"]

    loss, grad = jax.value_and_grad(loss_of)(pred)
    assert np.isfinite(float(loss))
    assert float(jnp.max(jnp.abs(grad))) > 0.0
    # SpecifyGradient semantics: d(loss)/d(images256) == images - target = grad_sds,
    # so the pixel grad must be nonzero everywhere w(t) is (sanity, not exact here
    # because of the bilinear resize VJP)


@pytest.mark.slow
def test_if2_dreamtime_t_schedule_clipped():
    g, cfg = _tiny_if2()
    B, R = 1, 32
    pred = jnp.zeros((B, R, R, 3))
    text = jnp.zeros((B, 7, cfg.cross_attention_dim))

    # step_ratio ~ 1 -> t pinned at min_step; ~0 -> max_step (if2_utils:109)
    for sr in (0.0, 0.5, 1.0):
        out = g(pred, pred, text, text, jax.random.key(0), step_ratio=jnp.float32(sr))
        assert np.isfinite(float(out["loss_sds"]))

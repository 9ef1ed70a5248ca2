"""Adan optimizer + scheduler factory (reference:
threestudio/systems/optimizers.py:23-255, systems/utils.py:55-86)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from garmentdreamer_tpu.core.optim_extras import adan, parse_scheduler


def _adan_numpy(g_seq, lr=0.01, betas=(0.98, 0.92, 0.99), eps=1e-8,
                wd=0.0, no_prox=False, p0=None):
    """Independent numpy transcription of the torch loop
    (optimizers.py:221-255) for parity checking."""
    b1, b2, b3 = betas
    p = np.array(p0, np.float64)
    m = np.zeros_like(p); d = np.zeros_like(p); n = np.zeros_like(p)
    prev = None
    for t, g in enumerate(g_seq, start=1):
        g = np.asarray(g, np.float64)
        bc1, bc2, bc3 = 1 - b1**t, 1 - b2**t, 1 - b3**t
        diff = np.zeros_like(g) if prev is None else g - prev
        m = b1 * m + (1 - b1) * g
        d = b2 * d + (1 - b2) * diff
        nv = g + b2 * diff
        n = b3 * n + (1 - b3) * nv * nv
        denom = np.sqrt(n) / np.sqrt(bc3) + eps
        if no_prox:
            p = p * (1 - lr * wd)
            p = p - (lr / bc1) * m / denom - (lr * b2 / bc2) * d / denom
        else:
            p = p - (lr / bc1) * m / denom - (lr * b2 / bc2) * d / denom
            p = p / (1 + lr * wd)
        prev = g
    return p


@pytest.mark.parametrize("wd,no_prox", [(0.0, False), (0.01, False), (0.01, True)])
def test_adan_matches_reference_math(wd, no_prox):
    rs = np.random.RandomState(0)
    p0 = rs.randn(5).astype(np.float32)
    g_seq = [rs.randn(5).astype(np.float32) for _ in range(7)]

    opt = adan(0.01, weight_decay=wd, no_prox=no_prox)
    p = jnp.asarray(p0)
    state = opt.init(p)
    for g in g_seq:
        u, state = opt.update(jnp.asarray(g), state, p)
        p = optax.apply_updates(p, u)

    ref = _adan_numpy(g_seq, wd=wd, no_prox=no_prox, p0=p0)
    np.testing.assert_allclose(np.asarray(p), ref, rtol=2e-5, atol=1e-6)


def test_adan_optimizes_quadratic():
    opt = adan(0.05)
    p = jnp.asarray([3.0, -2.0])
    state = opt.init(p)
    for _ in range(800):
        g = 2 * p
        u, state = opt.update(g, state, p)
        p = optax.apply_updates(p, u)
    assert float(jnp.abs(p).max()) < 0.1  # converged from |3.0|


def test_adan_with_schedule():
    sched = parse_scheduler(
        {"name": "cosine_warmup",
         "args": {"peak_value": 0.01, "warmup_steps": 5, "total_steps": 20}}
    )
    opt = adan(sched)
    p = jnp.ones(3)
    state = opt.init(p)
    u, state = opt.update(jnp.ones(3), state, p)
    p = optax.apply_updates(p, u)
    assert np.isfinite(np.asarray(p)).all()


class TestSchedulers:
    def test_multistep(self):
        s = parse_scheduler(
            {"name": "multistep",
             "args": {"init_value": 1.0, "milestones": [10, 20], "gamma": 0.1}}
        )
        assert float(s(0)) == 1.0
        assert abs(float(s(10)) - 0.1) < 1e-6
        assert abs(float(s(25)) - 0.01) < 1e-6

    def test_sequential(self):
        s = parse_scheduler(
            {
                "name": "sequential",
                "milestones": [5],
                "schedulers": [
                    {"name": "constant", "args": {"value": 1.0}},
                    {"name": "constant", "args": {"value": 0.5}},
                ],
            }
        )
        assert float(s(0)) == 1.0 and float(s(6)) == 0.5

    def test_cosine_warmup_shape(self):
        s = parse_scheduler(
            {"name": "cosine_warmup",
             "args": {"peak_value": 2.0, "warmup_steps": 10, "total_steps": 100}}
        )
        assert float(s(0)) == 0.0
        assert abs(float(s(10)) - 2.0) < 1e-6
        assert float(s(100)) < 1e-6

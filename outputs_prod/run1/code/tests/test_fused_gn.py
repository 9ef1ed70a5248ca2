"""FusedGroupNorm parity vs flax nn.GroupNorm: forward, input-grad, and
param-grads, in f32 and bf16."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.core.fused_gn import FusedGroupNorm, group_norm


def _pair(dtype, groups=4, shape=(2, 8, 8, 16)):
    ref = nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=dtype)
    fused = FusedGroupNorm(num_groups=groups, epsilon=1e-6, dtype=dtype)
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32) * 3.0 + 1.5
    p = ref.init(jax.random.key(1), x)
    # non-trivial affine params
    p = jax.tree.map(
        lambda a: a + jax.random.normal(jax.random.key(2), a.shape) * 0.3, p
    )
    return ref, fused, p, x.astype(dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_parity(dtype):
    ref, fused, p, x = _pair(dtype)
    yr = ref.apply(p, x)
    yf = fused.apply(p, x)
    assert yf.dtype == yr.dtype
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(yf, np.float32), np.asarray(yr, np.float32), atol=tol, rtol=tol
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_grad_parity(dtype):
    ref, fused, p, x = _pair(dtype)
    w = jax.random.normal(jax.random.key(3), x.shape, jnp.float32)

    def loss(mod):
        def f(pp, xx):
            y = mod.apply(pp, xx).astype(jnp.float32)
            return jnp.sum(y * w)

        return f

    gr_p, gr_x = jax.grad(loss(ref), argnums=(0, 1))(p, x)
    gf_p, gf_x = jax.grad(loss(fused), argnums=(0, 1))(p, x)
    tol = 1e-4 if dtype == jnp.float32 else 6e-2
    np.testing.assert_allclose(
        np.asarray(gf_x, np.float32), np.asarray(gr_x, np.float32), atol=tol, rtol=tol
    )
    for k in ("scale", "bias"):
        np.testing.assert_allclose(
            np.asarray(gf_p["params"][k]),
            np.asarray(gr_p["params"][k]),
            atol=tol,
            rtol=tol,
        )


def test_3d_input():
    # (B, L, C) tokens path
    x = jax.random.normal(jax.random.key(0), (2, 64, 32), jnp.float32)
    sc = jnp.ones((32,))
    b = jnp.zeros((32,))
    y = group_norm(x, sc, b, 8, 1e-6)
    yr = nn.GroupNorm(num_groups=8, epsilon=1e-6).apply(
        {"params": {"scale": sc, "bias": b}}, x
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-5, rtol=1e-5)


def test_finite_diff_input_grad():
    # independent check of the hand-written VJP against numerical gradient
    x = jax.random.normal(jax.random.key(5), (1, 4, 4, 8), jnp.float32)
    sc = jnp.linspace(0.5, 1.5, 8)
    b = jnp.linspace(-0.2, 0.2, 8)
    w = jax.random.normal(jax.random.key(6), x.shape, jnp.float32)

    def f(xx):
        return jnp.sum(group_norm(xx, sc, b, 2, 1e-6) * w)

    g = jax.grad(f)(x)
    # eps large enough that f32 evaluation noise stays well below the secant
    eps = 1e-2
    idxs = [(0, 0, 0, 0), (0, 1, 2, 3), (0, 3, 3, 7), (0, 2, 1, 4)]
    for idx in idxs:
        e = jnp.zeros_like(x).at[idx].set(eps)
        num = (f(x + e) - f(x - e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[idx]), np.asarray(num), atol=5e-3)

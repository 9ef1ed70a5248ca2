import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from garmentdreamer_tpu.splat import state as state_mod
from garmentdreamer_tpu.splat.densify import add_densification_stats, densify_and_prune
from garmentdreamer_tpu.splat.optim import (
    GaussianOptimConfig,
    make_optimizer,
    reset_moments_rows,
    xyz_lr_schedule,
)


def _state(n=20, cap=64, seed=0, scale_value=None):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    st = state_mod.create_from_pcd(pts, cols, capacity=cap)
    if scale_value is not None:
        st = st.replace(
            params=st.params.replace(
                scaling=jnp.where(
                    st.stats.active[:, None], jnp.log(scale_value), st.params.scaling
                )
            )
        )
    return st


def test_stats_accumulation():
    st = _state()
    g = jnp.ones((st.capacity, 2))
    vis = jnp.arange(st.capacity) < 10
    radii = jnp.full((st.capacity,), 7, jnp.int32)
    st2 = add_densification_stats(st, g, vis, radii)
    acc = np.asarray(st2.stats.xyz_grad_accum)
    np.testing.assert_allclose(acc[:10], np.sqrt(2.0), rtol=1e-6)
    np.testing.assert_allclose(acc[10:], 0.0)
    assert np.asarray(st2.stats.denom)[:10].sum() == 10
    assert np.asarray(st2.stats.max_radii2d)[:10].max() == 7


def test_clone_small_hot_gaussians():
    # small scale (clone branch), high grads on first 5 active rows
    st = _state(n=20, cap=64, scale_value=0.001)
    stats = st.stats.replace(
        xyz_grad_accum=jnp.where(jnp.arange(64) < 5, 1.0, 0.0),
        denom=jnp.ones((64,)),
    )
    st = st.replace(stats=stats)
    res = densify_and_prune(
        st, max_grad=0.0002, min_opacity=0.05, extent=4.0, size_threshold=None,
        percent_dense=0.01, rng=jax.random.key(0),
    )
    assert int(res.n_cloned) == 5
    assert int(res.n_split) == 0
    assert int(res.n_pruned) == 0
    assert int(res.state.n_active()) == 25
    # clones are exact copies located at some previously-free rows
    xyz = np.asarray(res.state.params.xyz)
    active = np.asarray(res.state.stats.active)
    new_rows = active & (np.arange(64) >= 20)
    assert new_rows.sum() == 5
    orig = np.asarray(st.params.xyz[:5])
    clones = xyz[new_rows]
    for c in clones:
        assert np.min(np.linalg.norm(orig - c, axis=1)) < 1e-6


def test_split_large_hot_gaussians():
    st = _state(n=20, cap=64, scale_value=0.5)  # > percent_dense*extent = 0.04
    stats = st.stats.replace(
        xyz_grad_accum=jnp.where(jnp.arange(64) < 4, 1.0, 0.0),
        denom=jnp.ones((64,)),
    )
    st = st.replace(stats=stats)
    res = densify_and_prune(
        st, max_grad=0.0002, min_opacity=0.05, extent=4.0, size_threshold=None,
        percent_dense=0.01, rng=jax.random.key(1),
    )
    assert int(res.n_split) == 4
    # 20 - 4 parents + 8 children
    assert int(res.state.n_active()) == 24
    # children scale = parent/1.6
    sc = np.asarray(jnp.exp(res.state.params.scaling))
    active = np.asarray(res.state.stats.active)
    child_rows = active & (np.asarray(res.rewritten_rows))
    assert np.allclose(sc[child_rows], 0.5 / 1.6, atol=1e-5)


def test_prune_low_opacity_and_big():
    st = _state(n=20, cap=64, scale_value=0.05)  # below the 0.1*extent size prune
    op = st.params.opacity
    # rows 0..2 low opacity; row 3 huge world size; row 4 huge screen radius
    op = op.at[:3].set(-10.0)
    params = st.params.replace(
        opacity=op,
        scaling=st.params.scaling.at[3].set(jnp.log(1.0)),  # > 0.1*extent=0.4
    )
    stats = st.stats.replace(max_radii2d=st.stats.max_radii2d.at[4].set(50.0))
    st = st.replace(params=params, stats=stats)
    res = densify_and_prune(
        st, max_grad=0.0002, min_opacity=0.05, extent=4.0, size_threshold=20.0,
        percent_dense=0.01, rng=jax.random.key(2),
    )
    active = np.asarray(res.state.stats.active)
    assert not active[:5].any()
    assert int(res.n_pruned) == 5
    assert int(res.state.n_active()) == 15


def test_capacity_overflow_counted():
    st = _state(n=20, cap=22, scale_value=0.001)
    stats = st.stats.replace(
        xyz_grad_accum=jnp.where(jnp.arange(22) < 10, 1.0, 0.0),
        denom=jnp.ones((22,)),
    )
    st = st.replace(stats=stats)
    res = densify_and_prune(
        st, max_grad=0.0002, min_opacity=0.05, extent=4.0, size_threshold=None,
        percent_dense=0.01, rng=jax.random.key(3),
    )
    assert int(res.n_overflow) == 8  # 10 clones, 2 free rows
    assert int(res.state.n_active()) == 22


@pytest.mark.slow
def test_optimizer_moment_surgery():
    st = _state(n=8, cap=16)
    opt = make_optimizer(GaussianOptimConfig())
    opt_state = opt.init(st.params)
    g = jax.tree.map(jnp.ones_like, st.params)
    _, opt_state = opt.update(g, opt_state, st.params)
    mask = jnp.arange(16) < 4
    new_state = reset_moments_rows(opt_state, mask)

    def get_adam(s):
        for e in s if isinstance(s, tuple) else (s,):
            if isinstance(e, optax.ScaleByAdamState):
                return e
        return s

    adam = get_adam(new_state)
    mu = np.asarray(adam.mu.xyz)
    assert (mu[:4] == 0).all()
    assert (mu[4:8] != 0).all()


def test_xyz_schedule_endpoints():
    cfg = GaussianOptimConfig()
    sched = xyz_lr_schedule(cfg)
    assert float(sched(0)) == pytest.approx(cfg.position_lr_init * cfg.spatial_lr_scale, rel=1e-5)
    assert float(sched(cfg.position_lr_max_steps)) == pytest.approx(
        cfg.position_lr_final * cfg.spatial_lr_scale, rel=1e-5
    )


def test_optimizer_moves_params_toward_grad():
    st = _state(n=8, cap=16)
    opt = make_optimizer(GaussianOptimConfig())
    opt_state = opt.init(st.params)
    g = jax.tree.map(jnp.ones_like, st.params)
    updates, opt_state = opt.update(g, opt_state, st.params)
    # with all-ones grads Adam steps by ~ -lr
    assert float(updates.opacity[0, 0]) == pytest.approx(-0.01, rel=1e-3)
    assert float(updates.scaling[0, 0]) == pytest.approx(-0.005, rel=1e-3)
    assert float(updates.features_dc[0, 0, 0]) == pytest.approx(-0.0125, rel=1e-3)
    assert float(updates.features_rest[0].sum()) == 0.0 or updates.features_rest.shape[1] == 0

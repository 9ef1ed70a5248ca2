import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.splat import knn, sh, state
from garmentdreamer_tpu.splat.project import build_cov3d, build_rotation


def test_sh_degree0_constant():
    coeff = jnp.array([[0.7, -0.2, 0.1]])[None]  # (1,1,3)
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    out = sh.eval_sh(0, coeff, dirs)
    np.testing.assert_allclose(out[0], sh.C0 * np.array([0.7, -0.2, 0.1]), atol=1e-6)


def test_sh_rgb_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, atol=1e-6)


def test_sh_color_clamped_nonnegative():
    shs = -5.0 * jnp.ones((4, 1, 3))
    pos = jnp.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]])
    out = sh.sh_color(0, shs, pos, jnp.zeros(3))
    assert (np.asarray(out) >= 0).all()


def test_sh_degree1_matches_formula():
    rng = np.random.default_rng(0)
    coeff = jnp.asarray(rng.normal(size=(5, 4, 3)).astype(np.float32))
    d = rng.normal(size=(5, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = sh.eval_sh(1, coeff, jnp.asarray(d))
    expect = (
        sh.C0 * coeff[:, 0]
        - sh.C1 * d[:, 1:2] * coeff[:, 1]
        + sh.C1 * d[:, 2:3] * coeff[:, 2]
        - sh.C1 * d[:, 0:1] * coeff[:, 3]
    )
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_knn_brute_matches_numpy():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(257, 3)).astype(np.float32)
    got = np.asarray(knn.mean_dist2_knn3_brute(jnp.asarray(pts), chunk=64))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expect = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_knn_host_matches_brute():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    exact = np.asarray(knn.mean_dist2_knn3_brute(jnp.asarray(pts)))
    host = knn.mean_dist2_knn3_host(pts)
    np.testing.assert_allclose(host, exact, rtol=1e-4, atol=1e-6)


def test_build_rotation_identity_and_orthonormal():
    q = jnp.array([[1.0, 0, 0, 0], [0.5, 0.5, 0.5, 0.5]])
    R = np.asarray(build_rotation(q))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[1] @ R[1].T, np.eye(3), atol=1e-6)
    assert np.linalg.det(R[1]) == pytest.approx(1.0, abs=1e-6)


def test_build_cov3d_isotropic():
    s = jnp.array([[0.3, 0.3, 0.3]])
    q = jnp.array([[0.2, 0.5, -0.1, 0.8]])
    cov = np.asarray(build_cov3d(s, q))
    np.testing.assert_allclose(cov[0], 0.09 * np.eye(3), atol=1e-6)


def test_create_from_pcd_invariants():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.uniform(size=(100, 3)).astype(np.float32)
    st = state.create_from_pcd(pts, cols, capacity=256)
    assert st.capacity == 256
    assert int(st.n_active()) == 100
    op = np.asarray(st.get_opacity())
    np.testing.assert_allclose(op[:100], 0.1, atol=1e-5)
    np.testing.assert_allclose(op[100:], 0.0)
    # colors roundtrip through DC SH
    np.testing.assert_allclose(
        np.asarray(sh.sh_to_rgb(st.params.features_dc[:100, 0])), cols, atol=1e-5
    )
    # scales: log sqrt(mean knn dist2), all three axes equal
    sc = np.asarray(st.params.scaling[:100])
    np.testing.assert_allclose(sc[:, 0], sc[:, 1])
    exact = np.asarray(knn.mean_dist2_knn3_brute(jnp.asarray(pts)))
    np.testing.assert_allclose(sc[:, 0], 0.5 * np.log(np.maximum(exact, 1e-7)), atol=1e-4)

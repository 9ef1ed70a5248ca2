import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.core import cameras as cam
from garmentdreamer_tpu.splat import state as state_mod
from garmentdreamer_tpu.splat.project import Projected, project_gaussians
from garmentdreamer_tpu.splat.rasterize import bin_gaussians, rasterize_tiled
from garmentdreamer_tpu.splat.rasterize_ref import rasterize_brute
from garmentdreamer_tpu.splat.render import render_view

H = W = 64


def _random_scene(n=300, seed=0, cap=None):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    st = state_mod.create_from_pcd(pts, cols, capacity=cap or n)
    return st


def _camera():
    c = cam.gs_camera_from_spherical(15.0, 30.0, 3.5, np.deg2rad(70.0), H, W)
    return {k: jnp.asarray(v) for k, v in c.as_arrays().items()}


def _project(st, c):
    return project_gaussians(
        xyz=st.params.xyz,
        scaling=st.get_scaling(),
        rotation_q=st.params.rotation,
        opacity=st.get_opacity(),
        shs=st.get_features(),
        sh_degree=0,
        world_view=c["world_view"],
        full_proj=c["full_proj"],
        camera_center=c["camera_center"],
        tanfovx=c["tanfov"][0],
        tanfovy=c["tanfov"][1],
        height=H,
        width=W,
    )


def test_projection_center_gaussian():
    st = state_mod.create_from_pcd(
        np.zeros((4, 3), np.float32) + np.eye(4, 3, dtype=np.float32) * 1e-3,
        np.full((4, 3), 0.5, np.float32),
    )
    c = _camera()
    proj = _project(st, c)
    d = np.asarray(proj.depths)
    assert d[0] == pytest.approx(3.5, abs=2e-3)
    m = np.asarray(proj.means2d)
    # world origin projects to image center (pixel coords (W-1)/2)
    assert m[0, 0] == pytest.approx((W - 1) / 2, abs=0.5)
    assert m[0, 1] == pytest.approx((H - 1) / 2, abs=0.5)
    assert (np.asarray(proj.radii) > 0).all()


@pytest.mark.slow
def test_binning_covers_gaussian_footprint():
    st = _random_scene(50)
    c = _camera()
    proj = _project(st, c)
    b = bin_gaussians(proj.means2d, proj.depths, proj.radii, H, W, max_tiles_per_gaussian=64)
    starts = np.asarray(b.tile_starts)
    assert starts.shape == (H // 16 * (W // 16) + 1,)
    assert (np.diff(starts) >= 0).all()
    assert int(b.n_dropped) == 0
    # every visible gaussian appears at least once
    vis = (np.asarray(proj.radii) > 0).sum()
    assert starts[-1] >= vis


def test_tiled_matches_brute():
    st = _random_scene(300, seed=1)
    c = _camera()
    proj = _project(st, c)
    bg = jnp.array([1.0, 1.0, 1.0])
    ref = rasterize_brute(proj, H, W, bg)
    color, alpha, depth, ndrop, _nh = rasterize_tiled(
        proj, H, W, bg, max_tiles_per_gaussian=64, max_per_tile=512, tile_chunk=16
    )
    assert int(ndrop) == 0
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color), atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha), atol=2e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth), atol=1e-4)


@pytest.mark.slow
def test_tiled_gradients_match_brute():
    st = _random_scene(120, seed=2)
    c = _camera()
    bg = jnp.zeros(3)
    target = jnp.ones((H, W, 3)) * 0.3

    def loss_tiled(params):
        st2 = st.replace(params=params)
        proj = _project(st2, c)
        color, _, _, _, _nh = rasterize_tiled(proj, H, W, bg, max_tiles_per_gaussian=64, max_per_tile=256, tile_chunk=16)
        return jnp.mean((color - target) ** 2)

    def loss_brute(params):
        st2 = st.replace(params=params)
        proj = _project(st2, c)
        out = rasterize_brute(proj, H, W, bg)
        return jnp.mean((out.color - target) ** 2)

    g_t = jax.grad(loss_tiled)(st.params)
    g_b = jax.grad(loss_brute)(st.params)
    for name in ("xyz", "features_dc", "scaling", "rotation", "opacity"):
        gt = np.asarray(getattr(g_t, name))
        gb = np.asarray(getattr(g_b, name))
        denom = np.abs(gb).max() + 1e-12
        np.testing.assert_allclose(gt / denom, gb / denom, atol=5e-4, err_msg=name)
    assert np.abs(np.asarray(g_t.xyz)).max() > 0  # gradients actually flow


@pytest.mark.slow
def test_inactive_rows_contribute_nothing():
    st_small = _random_scene(80, seed=3)
    st_padded = _random_scene(80, seed=3, cap=256)
    c = _camera()
    bg = jnp.array([0.2, 0.4, 0.6])
    out_s = render_view(st_small, c, bg, H, W, max_per_tile=256)
    out_p = render_view(st_padded, c, bg, H, W, max_per_tile=256)
    np.testing.assert_allclose(
        np.asarray(out_s["render"]), np.asarray(out_p["render"]), atol=1e-5
    )


def test_background_blending():
    # empty scene -> pure background, alpha 0
    st = state_mod.create_from_pcd(
        np.full((4, 3), 50.0, np.float32), np.full((4, 3), 0.5, np.float32)
    )  # far outside the frustum
    c = _camera()
    bg = jnp.array([0.1, 0.5, 0.9])
    out = render_view(st, c, bg, H, W, max_per_tile=128)
    np.testing.assert_allclose(np.asarray(out["render"]), np.broadcast_to(bg, (H, W, 3)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["alpha"]), 0.0, atol=1e-6)


@pytest.mark.slow
def test_screen_offset_gradient_is_viewspace_grad():
    st = _random_scene(60, seed=4)
    c = _camera()
    bg = jnp.zeros(3)
    so = jnp.zeros((st.capacity, 2))

    def loss(offset):
        out = render_view(st, c, bg, H, W, screen_offset=offset, max_per_tile=256)
        return jnp.mean(out["render"])

    g = np.asarray(jax.grad(loss)(so))
    assert g.shape == (st.capacity, 2)
    assert np.abs(g).max() > 0

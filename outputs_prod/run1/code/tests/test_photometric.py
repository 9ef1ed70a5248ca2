"""Photometric 3DGS fitting + metrics tests (vanilla gaussiansplatting
train.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.splat.metrics import l1_loss, photometric_loss, psnr, ssim


class TestMetrics:
    def test_psnr_identical(self):
        a = jnp.ones((8, 8, 3)) * 0.5
        assert float(psnr(a, a)) > 100

    def test_psnr_known_value(self):
        a = jnp.zeros((4, 4, 3))
        b = jnp.ones((4, 4, 3)) * 0.1
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-3)

    def test_ssim_identical_is_one(self):
        a = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        np.testing.assert_allclose(float(ssim(a, a)), 1.0, atol=1e-5)

    def test_ssim_noise_lowers(self):
        a = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        b = jnp.clip(a + 0.3 * jax.random.normal(jax.random.PRNGKey(1), a.shape), 0, 1)
        assert float(ssim(a, b)) < 0.8

    def test_photometric_zero_for_identical(self):
        a = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 3))
        assert float(photometric_loss(a, a)) < 1e-5


@pytest.mark.slow
class TestPhotometricFit:
    def test_psnr_improves(self):
        """Fit a small cloud to renders of a known cloud: PSNR should climb."""
        from garmentdreamer_tpu.core import cameras as cam
        from garmentdreamer_tpu.data.cameras import gs_camera_stack
        from garmentdreamer_tpu.splat import state as state_mod
        from garmentdreamer_tpu.splat.photometric import PhotometricConfig, fit_photometric
        from garmentdreamer_tpu.splat.render import render_batch

        rs = np.random.RandomState(0)
        n = 200
        pts = rs.randn(n, 3).astype(np.float32) * 0.3
        cols = rs.uniform(0.2, 0.9, (n, 3)).astype(np.float32)
        gt = state_mod.create_from_pcd(pts, cols, capacity=256)

        H = W = 32
        elev = np.array([10.0, -10.0, 25.0, 0.0])
        azim = np.array([0.0, 90.0, 180.0, 270.0])
        dist = np.full(4, 2.5)
        fovy = np.full(4, np.deg2rad(60.0))
        cams = gs_camera_stack(elev, azim, dist, fovy, H, W)
        bg = jnp.zeros(3, jnp.float32)
        out = render_batch(
            gt, {k: jnp.asarray(v) for k, v in cams.items()}, bg, H, W,
            max_tiles_per_gaussian=8, max_per_tile=64,
        )
        targets = np.asarray(out["render"])

        # perturbed init: same points jittered, gray colors
        st = state_mod.create_from_pcd(
            pts + rs.randn(n, 3).astype(np.float32) * 0.03,
            np.full((n, 3), 0.5, np.float32),
            capacity=256,
        )
        psnrs = []
        cfg = PhotometricConfig(
            iterations=30, batch_size=2, densify_from=1000,
            max_tiles_per_gaussian=8, max_per_tile=64,
        )
        st2, metrics = fit_photometric(
            st, cams, targets, cfg,
            callback=lambda i, s, m: psnrs.append(m["psnr"]),
        )
        assert np.isfinite(metrics["psnr"])
        assert metrics["psnr"] > psnrs[0] + 1.0, (psnrs[0], metrics["psnr"])

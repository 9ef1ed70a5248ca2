"""Stage-2 (Metric3D normal estimator) tests: preprocessing contracts,
decoder math vs closed forms, tiny end-to-end run."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.normal import (
    CANONICAL_CROP,
    NormalEstimator,
    NormalEstimatorConfig,
    estimate_normals,
    init_params,
    norm_normalize,
    postprocess_normal,
    preprocess_rgb,
)
from garmentdreamer_tpu.normal.raft_decoder import (
    pool2x,
    resize_bilinear_ac,
    upsample_flow,
)


class TestPreprocess:
    def test_1024_square_geometry(self):
        """1024^2 render -> 616x616 resize + 224px side pads
        (do_test.py:87-139 with crop 616x1064)."""
        rgb = np.full((1024, 1024, 3), 128, np.uint8)
        v = preprocess_rgb(rgb)
        assert v.rgb.shape == (*CANONICAL_CROP, 3)
        assert v.cam_model.shape == (*CANONICAL_CROP, 4)
        assert v.pad == (0, 0, 224, 224)
        assert v.ori_shape == (1024, 1024)
        np.testing.assert_allclose(v.label_scale, 1024 / 616, rtol=1e-6)
        # pad region carries the mean pixel -> exactly 0 after normalization
        np.testing.assert_allclose(v.rgb[:, :224], 0.0, atol=1e-5)
        # cam model pad: cv2 scalar border fills channel 0 with -1, rest 0
        # (same cv2 behavior as the reference, do_test.py:126-134)
        np.testing.assert_allclose(v.cam_model[:, :10, 0], -1.0)
        np.testing.assert_allclose(v.cam_model[:, :10, 1:], 0.0)

    def test_normalization_values(self):
        rgb = np.zeros((616, 1064, 3), np.float32)
        rgb[..., 0] = 123.675
        rgb[..., 1] = 116.28
        rgb[..., 2] = 103.53
        v = preprocess_rgb(rgb)
        np.testing.assert_allclose(v.rgb, 0.0, atol=1e-5)
        assert v.pad == (0, 0, 0, 0)

    def test_postprocess_flips_and_masks(self):
        """All three components flipped, [-1,1]->[0,255], alpha=mask
        (visualization.py:49-79,113-123)."""
        normal = np.zeros((8, 12, 4), np.float32)
        normal[..., 0] = 1.0  # +x -> flipped to -x -> pixel 0
        normal[..., 2] = -1.0  # -z -> flipped to +z -> pixel 255
        mask = np.full((4, 4), 200.0, np.float32)
        rgba = postprocess_normal(normal, (0, 0, 4, 4), mask)
        assert rgba.shape == (4, 4, 4)
        np.testing.assert_allclose(rgba[..., 0], 0.0, atol=1e-3)
        np.testing.assert_allclose(rgba[..., 1], 127.5, atol=1e-3)
        np.testing.assert_allclose(rgba[..., 2], 255.0, atol=1e-3)
        np.testing.assert_allclose(rgba[..., 3], 200.0)


class TestDecoderMath:
    def test_norm_normalize(self):
        x = jnp.array([[[[3.0, 0.0, 4.0, 0.0]]]])
        out = norm_normalize(x)
        np.testing.assert_allclose(out[0, 0, 0, :3], [0.6, 0.0, 0.8], atol=1e-6)
        # kappa = elu(0)+1.01 = 1.01
        np.testing.assert_allclose(out[0, 0, 0, 3], 1.01, atol=1e-6)

    def test_pool2x_matches_torch_avgpool(self):
        """avg_pool2d(3,2,1) with count_include_pad=True."""
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(0).randn(2, 7, 9, 3).astype(np.float32)
        ours = np.asarray(pool2x(jnp.asarray(x)))
        theirs = (
            F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2, 1)
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_resize_bilinear_align_corners(self):
        import torch
        import torch.nn.functional as F

        x = np.random.RandomState(1).randn(1, 5, 7, 2).astype(np.float32)
        ours = np.asarray(resize_bilinear_ac(jnp.asarray(x), (11, 4)))
        theirs = (
            F.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2), (11, 4),
                mode="bilinear", align_corners=True,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_upsample_flow_convex_identity(self):
        """With a mask that puts all weight on the center tap, upsampling a
        constant field reproduces the constant (convex combination)."""
        B, H, W, D, f = 1, 3, 4, 6, 4
        flow = jnp.ones((B, H, W, D)) * jnp.arange(1, D + 1)
        mask = np.full((B, H, W, 9, f, f), -1e9, np.float32)
        mask[:, :, :, 4] = 0.0  # center of the 3x3 neighborhood
        up = upsample_flow(flow, jnp.asarray(mask.reshape(B, H, W, -1)), f)
        assert up.shape == (B, H * f, W * f, D)
        np.testing.assert_allclose(up, np.broadcast_to(np.arange(1, D + 1), up.shape), atol=1e-5)

    def test_upsample_flow_matches_torch(self):
        """Full parity with the reference convex upsampler (:858-872)."""
        import torch
        import torch.nn.functional as F

        rs = np.random.RandomState(2)
        B, H, W, D, f = 2, 3, 5, 6, 4
        flow = rs.randn(B, H, W, D).astype(np.float32)
        mask = rs.randn(B, H, W, 9 * f * f).astype(np.float32)

        ours = np.asarray(upsample_flow(jnp.asarray(flow), jnp.asarray(mask), f))

        tflow = torch.from_numpy(flow).permute(0, 3, 1, 2)
        tmask = torch.from_numpy(mask).permute(0, 3, 1, 2)
        m = tmask.view(B, 1, 9, f, f, H, W).softmax(dim=2)
        uf = F.unfold(tflow, [3, 3], padding=1).view(B, D, 9, 1, 1, H, W)
        up = (m * uf).sum(2).permute(0, 1, 4, 2, 5, 3).reshape(B, D, f * H, f * W)
        theirs = up.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.slow
class TestModel:
    def test_tiny_forward_shapes(self):
        cfg = NormalEstimatorConfig.tiny()
        # input must be a multiple of 28 (patch 14 and the /4 grid alignment)
        H, W = 56, 112
        params = init_params(cfg, jax.random.PRNGKey(0), (H, W))
        out = NormalEstimator(cfg).apply(params, jnp.zeros((2, H, W, 3)))
        assert out["prediction"].shape == (2, H, W, 1)
        assert out["prediction_normal"].shape == (2, H, W, 4)
        assert out["normal_out_list"].shape == (cfg.decoder.iters, 2, H, W, 4)
        n = np.asarray(out["normal_out_list"][0])
        # unit normals + positive kappa
        np.testing.assert_allclose(
            np.linalg.norm(n[..., :3], axis=-1), 1.0, atol=1e-4
        )
        assert (n[..., 3] > 0).all()
        # depth clamped to the log-bin range
        d = np.asarray(out["prediction"])
        assert (d >= 0.1 - 1e-5).all() and (d <= 200.0 + 1e-4).all()

    def test_first_iteration_invariant_to_iters(self):
        """normal_out_list[0] must not depend on how many GRU iterations run
        (the driver's iters=1 shortcut, raft_decoder.py docstring)."""
        import dataclasses

        cfg1 = NormalEstimatorConfig.tiny()
        cfg2 = NormalEstimatorConfig(
            vit=cfg1.vit, decoder=dataclasses.replace(cfg1.decoder, iters=1)
        )
        H, W = 56, 56
        params = init_params(cfg1, jax.random.PRNGKey(0), (H, W))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 3))
        out1 = NormalEstimator(cfg1).apply(params, x)
        out2 = NormalEstimator(cfg2).apply(params, x)
        np.testing.assert_allclose(
            np.asarray(out1["normal_out_list"][0]),
            np.asarray(out2["normal_out_list"][0]),
            atol=1e-6,
        )


@pytest.mark.slow
class TestStage2EndToEnd:
    def test_estimate_normals_writes_rgba(self, tmp_path):
        from PIL import Image

        render_dir = tmp_path / "gs_rendered_rgba"
        out_dir = tmp_path / "estimated_normals"
        render_dir.mkdir()
        rs = np.random.RandomState(0)
        for i in range(3):
            rgba = rs.randint(0, 255, (64, 64, 4), np.uint8)
            rgba[..., 3] = (rgba[..., 3] > 128) * 255
            Image.fromarray(rgba, "RGBA").save(render_dir / f"{i}.png")

        estimate_normals(
            str(render_dir), str(out_dir),
            batch_size=2, cfg=NormalEstimatorConfig.tiny(),
        )
        for i in range(3):
            img = np.asarray(Image.open(out_dir / f"{i}.png"))
            assert img.shape == (64, 64, 4)
            # alpha channel carries the render mask
            src = np.asarray(Image.open(render_dir / f"{i}.png"))
            np.testing.assert_array_equal(img[..., 3], src[..., 3])

    def test_estimate_normals_mesh_matches_single(self, tmp_path):
        """View-DP over the 8-device mesh (pipeline --mesh) writes the same
        normal maps as single-device execution (inference DP: no collectives
        touch per-view math)."""
        from PIL import Image

        render_dir = tmp_path / "gs_rendered_rgba"
        render_dir.mkdir()
        rs = np.random.RandomState(1)
        for i in range(3):
            rgba = rs.randint(0, 255, (64, 64, 4), np.uint8)
            rgba[..., 3] = (rgba[..., 3] > 128) * 255
            Image.fromarray(rgba, "RGBA").save(render_dir / f"{i}.png")

        estimate_normals(
            str(render_dir), str(tmp_path / "out_single"),
            batch_size=2, cfg=NormalEstimatorConfig.tiny(),
        )
        estimate_normals(
            str(render_dir), str(tmp_path / "out_mesh"),
            batch_size=2, cfg=NormalEstimatorConfig.tiny(), mesh_devices=8,
        )
        for i in range(3):
            a = np.asarray(Image.open(tmp_path / "out_single" / f"{i}.png"))
            b = np.asarray(Image.open(tmp_path / "out_mesh" / f"{i}.png"))
            # uint8-quantized normals: allow 1 lsb for reduction-order ulps
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

"""Full-config SD-2.1 UNet + VAE: converted weights through one real-shape
denoise step (VERDICT r3 next-5).

diffusers is NOT installed in this image and the reference's vendored
``netf/vsd/lora_unet.py`` imports diffusers' block zoo, so a torch-side
numerical oracle for the UNet/VAE does not exist offline (unlike Metric3D --
tests/test_metric3d_full_parity.py -- and the CLIP text tower --
tests/test_clip.py -- which both have genuine full-scale torch parity
tests). What CAN be pinned for the UNet at the real architecture:

* the converter consumes the exact SD-2.1 checkpoint key manifest and its
  output matches init() leaf-for-leaf (tests/test_convert_manifest.py);
* this test: those converted full-scale weights RUN -- one classifier-free
  guidance denoise step at the production latent shape (2x64x64x4, context
  2x77x1024) stays finite, and the batch rows are independent (the CFG
  split's correctness precondition: no cross-batch mixing anywhere in the
  real topology, which would silently corrupt guidance);
* VAE: one 512x512 encode through the converted full-scale tree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.fixtures.sd21_manifest import sd21_unet_manifest, sd21_vae_manifest


def _synth_sd(manifest, seed=0):
    rs = np.random.RandomState(seed)
    # small magnitudes: 24 residual stages of randn-scale weights overflow
    # f32 activations; scale roughly like trained-network spectra
    return {k: (rs.randn(*s) * 0.05).astype(np.float32) for k, s in manifest.items()}


@pytest.mark.slow
def test_sd21_unet_full_config_denoise_step():
    from garmentdreamer_tpu.guidance.convert import convert_sd_unet
    from garmentdreamer_tpu.guidance.unet import UNet2DCondition, UNetConfig

    params = convert_sd_unet(_synth_sd(sd21_unet_manifest()))
    model = UNet2DCondition(UNetConfig.sd21())

    rs = np.random.RandomState(1)
    lat = jnp.asarray(rs.randn(2, 64, 64, 4).astype(np.float32))
    ctx = jnp.asarray(rs.randn(2, 77, 1024).astype(np.float32) * 0.1)
    t = jnp.asarray([981, 981], jnp.int32)

    out = np.asarray(model.apply({"params": params}, lat, t, ctx))
    assert out.shape == (2, 64, 64, 4)
    assert np.isfinite(out).all()

    # CFG precondition: batch rows are independent -- running row 0 alone
    # must reproduce row 0 of the pair exactly
    solo = np.asarray(model.apply({"params": params}, lat[:1], t[:1], ctx[:1]))
    np.testing.assert_allclose(solo[0], out[0], atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_sd21_vae_full_config_encode():
    from garmentdreamer_tpu.guidance.convert import convert_sd_vae
    from garmentdreamer_tpu.guidance.vae import AutoencoderKL, VAEConfig

    params = convert_sd_vae(_synth_sd(sd21_vae_manifest()))
    model = AutoencoderKL(VAEConfig.sd())

    rs = np.random.RandomState(2)
    img = jnp.asarray(rs.rand(1, 512, 512, 3).astype(np.float32) * 2 - 1)
    lat = np.asarray(
        model.apply(
            {"params": params}, img, jax.random.PRNGKey(0),
            method=AutoencoderKL.sample_latents,
        )
    )
    assert lat.shape == (1, 64, 64, 4)
    assert np.isfinite(lat).all()

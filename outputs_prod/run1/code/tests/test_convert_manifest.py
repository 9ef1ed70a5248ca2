"""Converter contract vs the vendored SD-2.1 checkpoint key manifest
(VERDICT r2 next-7).

Builds a synthetic state dict shaped exactly like the diffusers
stabilityai/stable-diffusion-2-1-base checkpoint (tests/fixtures/
sd21_manifest.py) and asserts:

* guidance/convert.py CONSUMES every manifest key (a renamed key in either
  the manifest or the converter fails here);
* the produced Flax tree matches our UNet/VAE init tree leaf-for-leaf in
  path AND shape (so converted weights actually load).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.fixtures.sd21_manifest import sd21_unet_manifest, sd21_vae_manifest


class RecordingDict(dict):
    """State dict that records which keys the converter touched."""

    def __init__(self, manifest):
        super().__init__(
            {k: np.zeros(s, np.float32) for k, s in manifest.items()}
        )
        self.touched = set()

    def __getitem__(self, k):
        self.touched.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        return super().__contains__(k)


def _tree_paths_shapes(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        out[name] = tuple(leaf.shape)
    return out


def test_unet_converter_consumes_every_key_and_matches_model():
    from garmentdreamer_tpu.guidance.convert import convert_sd_unet
    from garmentdreamer_tpu.guidance.unet import UNet2DCondition, UNetConfig

    manifest = sd21_unet_manifest()
    sd = RecordingDict(manifest)
    tree = convert_sd_unet(sd)

    untouched = set(manifest) - sd.touched
    assert not untouched, f"converter never read {sorted(untouched)[:8]} ..."

    ucfg = UNetConfig.sd21()
    unet = UNet2DCondition(ucfg)
    ref = jax.eval_shape(
        lambda: unet.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 4)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, ucfg.cross_attention_dim)),
        )
    )
    got = _tree_paths_shapes({"params": tree})
    want = _tree_paths_shapes(ref)
    assert set(got) == set(want), (
        f"tree path mismatch: extra={sorted(set(got)-set(want))[:6]} "
        f"missing={sorted(set(want)-set(got))[:6]}"
    )
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"shape mismatches: {dict(list(bad.items())[:6])}"


def test_vae_converter_consumes_every_key_and_matches_model():
    from garmentdreamer_tpu.guidance.convert import convert_sd_vae
    from garmentdreamer_tpu.guidance.vae import AutoencoderKL, VAEConfig

    manifest = sd21_vae_manifest()
    sd = RecordingDict(manifest)
    tree = convert_sd_vae(sd)

    untouched = set(manifest) - sd.touched
    assert not untouched, f"converter never read {sorted(untouched)[:8]} ..."

    vcfg = VAEConfig.sd()
    vae = AutoencoderKL(vcfg)
    ref = jax.eval_shape(
        lambda: vae.init(
            jax.random.key(0), jnp.zeros((1, 64, 64, 3)), jax.random.key(1),
            method=AutoencoderKL.sample_latents,
        )
    )
    got = _tree_paths_shapes({"params": tree})
    want = _tree_paths_shapes(ref)
    # sample_latents initializes only the encoder side; decoder params in the
    # converted tree are checked against a decode-initialized tree
    dec_ref = jax.eval_shape(
        lambda: vae.init(
            jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
            method=AutoencoderKL.decode,
        )
    )
    want.update(_tree_paths_shapes(dec_ref))
    assert set(got) <= set(want), (
        f"converter produced unknown paths: {sorted(set(got)-set(want))[:6]}"
    )
    enc_missing = {k for k in want if k not in got}
    assert not enc_missing, f"converter missed paths: {sorted(enc_missing)[:6]}"
    bad = {k: (got[k], want[k]) for k in got if got[k] != want[k]}
    assert not bad, f"shape mismatches: {dict(list(bad.items())[:6])}"


def test_unet_manifest_renamed_key_fails():
    """The contract actually bites: drop one key -> converter raises."""
    from garmentdreamer_tpu.guidance.convert import convert_sd_unet

    manifest = sd21_unet_manifest()
    sd = RecordingDict(manifest)
    del sd["mid_block.attentions.0.proj_in.weight"]
    with pytest.raises(KeyError):
        convert_sd_unet(sd)

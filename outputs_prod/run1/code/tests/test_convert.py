"""Weight-converter tests: synthesize diffusers-style state dicts with the
tiny config's shapes, convert, and check the tree matches init() exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.guidance.convert import convert_sd_unet, convert_sd_vae
from garmentdreamer_tpu.guidance.unet import UNet2DCondition, UNetConfig
from garmentdreamer_tpu.guidance.vae import AutoencoderKL, VAEConfig


def tree_shapes(tree):
    return {
        "/".join(str(k.key) for k in path): v.shape
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def synth_torch_sd_from_tree(tree_shapes_map, rules):
    """Build a fake torch state dict whose converted output should reproduce
    the Flax tree. ``rules`` maps flax path -> (torch name, transform)."""
    sd = {}
    for fpath, shape in tree_shapes_map.items():
        tname, kind = rules(fpath, shape)
        rs = np.random.RandomState(abs(hash(fpath)) % (2**31))
        val = rs.randn(*shape).astype(np.float32)
        if kind == "conv_kernel":  # flax (kh,kw,I,O) <- torch (O,I,kh,kw)
            sd[tname] = np.transpose(val, (3, 2, 0, 1))
        elif kind == "dense_kernel":  # flax (I,O) <- torch (O,I)
            sd[tname] = np.transpose(val)
        else:
            sd[tname] = val
    return sd


def unet_rules(fpath, shape):
    p = fpath.replace("params/", "")
    parts = p.split("/")
    leaf = parts[-1]
    kind = "plain"
    if leaf == "kernel":
        kind = "conv_kernel" if len(shape) == 4 else "dense_kernel"

    def norm_leaf(n):
        return {"scale": "weight", "bias": "bias", "kernel": "weight"}[n] if n in ("scale", "bias", "kernel") else n

    name = parts[0]
    import re

    m = re.match(r"down_(\d+)_res_(\d+)", name)
    if m:
        base = f"down_blocks.{m.group(1)}.resnets.{m.group(2)}"
    elif re.match(r"down_(\d+)_attn_(\d+)", name):
        m2 = re.match(r"down_(\d+)_attn_(\d+)", name)
        base = f"down_blocks.{m2.group(1)}.attentions.{m2.group(2)}"
    elif re.match(r"down_(\d+)_downsample", name):
        m2 = re.match(r"down_(\d+)_downsample", name)
        base = f"down_blocks.{m2.group(1)}.downsamplers.0"
    elif re.match(r"up_(\d+)_res_(\d+)", name):
        m2 = re.match(r"up_(\d+)_res_(\d+)", name)
        base = f"up_blocks.{m2.group(1)}.resnets.{m2.group(2)}"
    elif re.match(r"up_(\d+)_attn_(\d+)", name):
        m2 = re.match(r"up_(\d+)_attn_(\d+)", name)
        base = f"up_blocks.{m2.group(1)}.attentions.{m2.group(2)}"
    elif re.match(r"up_(\d+)_upsample", name):
        m2 = re.match(r"up_(\d+)_upsample", name)
        base = f"up_blocks.{m2.group(1)}.upsamplers.0"
    elif name == "mid_res_0":
        base = "mid_block.resnets.0"
    elif name == "mid_res_1":
        base = "mid_block.resnets.1"
    elif name == "mid_attn":
        base = "mid_block.attentions.0"
    elif name == "norm_out":
        base = "conv_norm_out"
    elif name == "time_embed_1":
        base = "time_embedding.linear_1"
    elif name == "time_embed_2":
        base = "time_embedding.linear_2"
    else:
        base = name  # conv_in / conv_out

    mid = parts[1:-1]
    sub = ""
    for s in mid:
        if s.startswith("block_"):
            sub += f".transformer_blocks.{s.split('_')[1]}"
        elif s == "ff":
            sub += ".ff"
        elif s == "proj_in" and "ff" in mid:
            sub += ".net.0.proj"
        elif s == "proj_out" and "ff" in mid:
            sub += ".net.2"
        elif s == "to_out":
            sub += ".to_out.0"
        elif s == "base":
            pass  # LoraDense inner module; torch has no extra level
        elif s == "conv":
            sub += ".conv"
        else:
            sub += "." + s
    # ff proj handled above; standalone proj_in/proj_out of the transformer
    torch_name = base + sub + "." + norm_leaf(leaf)
    torch_name = torch_name.replace(".ff.proj_in", ".ff.net.0.proj").replace(
        ".ff.proj_out", ".ff.net.2"
    )
    return torch_name, kind


class TestUNetConvert:
    @pytest.mark.slow
    def test_roundtrip_tiny(self):
        cfg = UNetConfig.tiny()
        unet = UNet2DCondition(cfg)
        ref = unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 8, 4)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 7, cfg.cross_attention_dim)),
        )
        shapes = tree_shapes(ref)
        sd = synth_torch_sd_from_tree(shapes, unet_rules)
        conv = {"params": convert_sd_unet(
            sd,
            down_block_types=cfg.down_block_types,
            up_block_types=cfg.up_block_types,
            layers_per_block=cfg.layers_per_block,
            use_linear_projection=cfg.use_linear_projection,
        )}
        got = tree_shapes(conv)
        assert set(got) == set(shapes), (
            f"missing: {set(shapes) - set(got)}, extra: {set(got) - set(shapes)}"
        )
        for k in shapes:
            assert got[k] == shapes[k], (k, got[k], shapes[k])
        # converted params actually run
        out = unet.apply(
            conv, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 7, cfg.cross_attention_dim)),
        )
        assert np.isfinite(np.asarray(out)).all()


def vae_rules(fpath, shape):
    p = fpath.replace("params/", "")
    parts = p.split("/")
    tower = parts[0]  # encoder / decoder
    name = parts[1]
    leaf = parts[-1]
    kind = "plain"
    if leaf == "kernel":
        kind = "conv_kernel" if len(shape) == 4 else "dense_kernel"

    import re

    if name in ("quant_conv", "post_quant_conv"):
        base = name
    else:
        base = tower + "."
        m = re.match(r"down_(\d+)_res_(\d+)", name)
        m2 = re.match(r"up_(\d+)_res_(\d+)", name)
        if m:
            base += f"down_blocks.{m.group(1)}.resnets.{m.group(2)}"
        elif m2:
            base += f"up_blocks.{m2.group(1)}.resnets.{m2.group(2)}"
        elif re.match(r"down_(\d+)_downsample", name):
            mm = re.match(r"down_(\d+)_downsample", name)
            base += f"down_blocks.{mm.group(1)}.downsamplers.0.conv"
        elif re.match(r"up_(\d+)_upsample", name):
            mm = re.match(r"up_(\d+)_upsample", name)
            base += f"up_blocks.{mm.group(1)}.upsamplers.0.conv"
        elif name == "mid_res_0":
            base += "mid_block.resnets.0"
        elif name == "mid_res_1":
            base += "mid_block.resnets.1"
        elif name == "mid_attn":
            base += "mid_block.attentions.0"
        elif name == "norm_out":
            base += "conv_norm_out"
        else:
            base += name

    sub = ""
    for s in parts[2:-1]:
        if s == "norm" and "mid_attn" in name:
            sub += ".group_norm"
        elif s == "to_out":
            sub += ".to_out.0"
        else:
            sub += "." + s
    leaf_name = {"scale": "weight", "bias": "bias", "kernel": "weight"}[leaf]
    return base + sub + "." + leaf_name, kind


class TestVAEConvert:
    @pytest.mark.slow
    def test_roundtrip_tiny(self):
        cfg = VAEConfig.tiny()
        vae = AutoencoderKL(cfg)
        ref = vae.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(1),
            method=AutoencoderKL.sample_latents,
        )
        shapes = tree_shapes(ref)
        # decoder params are not initialized by sample_latents; init full
        ref_full = vae.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(1)
        )
        shapes = tree_shapes(ref_full)
        sd = synth_torch_sd_from_tree(shapes, vae_rules)
        conv = {"params": convert_sd_vae(
            sd, num_blocks=len(cfg.block_out_channels),
            layers_per_block=cfg.layers_per_block,
        )}
        got = tree_shapes(conv)
        assert set(got) == set(shapes), (
            f"missing: {set(shapes) - set(got)}, extra: {set(got) - set(shapes)}"
        )
        for k in shapes:
            assert got[k] == shapes[k], (k, got[k], shapes[k])
        out = vae.apply(
            conv, jnp.zeros((1, 32, 32, 3)), jax.random.PRNGKey(2),
            method=AutoencoderKL.sample_latents,
        )
        assert np.isfinite(np.asarray(out)).all()

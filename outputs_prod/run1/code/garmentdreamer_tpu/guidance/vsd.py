"""Variational Score Distillation guidance + LoRA-UNet conditioning for the
NeTF refinement stage.

TPU-native rebuild of the reference VSD
(reference: netf/guidance/sd_vsd_utils.py:31-319 with
netf/vsd/lora_unet.py:415-422,636-645 camera/shading conditioning):

* t in [0.02, 0.5] * 1000 (sd_vsd_utils.py:38,163-168; t5 anneal caps at 500);
* pretrained SD eps with CFG 7.5 (:183-192), LoRA-UNet prediction converted
  from v-parameterization: eps_q = sqrt(acp)*v + sqrt(1-acp)*x_t (:205-214);
* grad = w(t) * (eps_sd - eps_q), injected via the stop-gradient inner
  product (SpecifyGradient :15-28 == sum(latents * sg(grad)) in JAX);
* camera conditioning: flattened 4x4 pose -> MLP(16 -> temb -> temb) with
  SiLU, added to the time embedding; learned shading embeddings (albedo adds
  nothing) (lora_unet.py:415-422,636-645); 10% unconditional pose dropout
  during the LoRA update (trainer.py:236-237);
* the LoRA update trains a v-prediction MSE on re-noised current latents
  with t ~ U(0, 1000) (trainer.py:228-256).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .scheduler import DiffusionSchedule, add_noise, make_schedule, velocity_from_eps

__all__ = ["VSDConfig", "CameraEmb", "VSDGuidance"]


@dataclass(frozen=True)
class VSDConfig:
    guidance_scale: float = 7.5
    min_step_percent: float = 0.02
    max_step_percent: float = 0.5
    latent_size: int = 64
    image_size: int = 512
    num_train_timesteps: int = 1000
    time_embed_dim: int = 1280  # SD2.1 UNet temb width


class CameraEmb(nn.Module):
    """Pose (B,16) -> time-embedding-sized conditioning vector
    (lora_unet.py:415-419). Shading embeddings are separate learned vectors
    (:420-422); 'albedo' adds none (:636-645)."""

    time_embed_dim: int = 1280

    @nn.compact
    def __call__(self, pose16: jnp.ndarray, shading: str = "albedo") -> jnp.ndarray:
        h = nn.Dense(self.time_embed_dim, name="fc1")(pose16)
        h = nn.Dense(self.time_embed_dim, name="fc2")(nn.silu(h))
        if shading != "albedo":
            emb = self.param(
                f"{shading}_emb", nn.initializers.normal(1.0), (1, self.time_embed_dim)
            )
            h = h + emb
        return h


class VSDGuidance:
    """Callable bundle around apply functions.

    * ``unet_apply(params, x, t, ctx)`` -- frozen pretrained SD (eps pred);
    * ``lora_apply(lora_params, x, t, ctx, extra_emb)`` -- LoRA UNet (v pred);
    * ``camera_emb_apply(cam_params, pose16, shading)`` -- conditioning MLP.
    """

    def __init__(
        self,
        cfg: VSDConfig,
        unet_apply: Callable,
        unet_params: Any,
        vae_encode: Callable,
        vae_params: Any,
        lora_apply: Callable,
        camera_emb_apply: Callable,
    ):
        self.cfg = cfg
        self.schedule: DiffusionSchedule = make_schedule(cfg.num_train_timesteps)
        self.unet_apply = unet_apply
        self.unet_params = unet_params
        self.vae_encode = vae_encode
        self.vae_params = vae_params
        self.lora_apply = lora_apply
        self.camera_emb_apply = camera_emb_apply

    def encode_images(self, rgb01: jnp.ndarray, rng: jax.Array,
                      vae_params: Any = None) -> jnp.ndarray:
        B = rgb01.shape[0]
        rgb = jax.image.resize(
            rgb01, (B, self.cfg.image_size, self.cfg.image_size, 3), "bilinear"
        )
        vp = self.vae_params if vae_params is None else vae_params
        return self.vae_encode(vp, rgb * 2.0 - 1.0, rng)

    def train_step(
        self,
        q_params: Dict[str, Any],  # {"lora":..., "camera":...}
        rgb01: jnp.ndarray,  # (1, H, W, 3) rendered image, grads flow
        text_embeddings: jnp.ndarray,  # (2, L, D) pos ++ neg
        pose16: jnp.ndarray,  # (1, 16)
        rng: jax.Array,
        t_max_override: Optional[int] = None,  # t5 anneal (trainer.py:208-211)
        shading: str = "albedo",
        params: Optional[Dict[str, Any]] = None,
    ):
        """Returns (loss, latents). Differentiable w.r.t. the texture/geometry
        through ``rgb01`` -> VAE -> latents; the score difference is
        stop-gradient (sd_vsd_utils.py:196-218).

        ``params`` ({"unet":..., "vae":...}) overrides the stored frozen-SD
        weights so they enter jit as arguments, not multi-GB captured
        constants (same contract as SDSGuidance.__call__)."""
        cfg = self.cfg
        unet_params = self.unet_params if params is None else params["unet"]
        rng_vae, rng_t, rng_noise = jax.random.split(rng, 3)
        latents = self.encode_images(
            rgb01, rng_vae, None if params is None else params["vae"]
        )
        B = latents.shape[0]

        min_step = int(cfg.num_train_timesteps * cfg.min_step_percent)
        max_step = (
            t_max_override
            if t_max_override is not None
            else int(cfg.num_train_timesteps * cfg.max_step_percent)
        )
        t = jax.random.randint(rng_t, (B,), min_step, max_step + 1)

        noise = jax.random.normal(rng_noise, latents.shape, latents.dtype)
        lat_sg = jax.lax.stop_gradient(latents)
        latents_noisy = add_noise(self.schedule, lat_sg, noise, t)

        # pretrained SD eps, CFG
        lat_in = jnp.concatenate([latents_noisy, latents_noisy], axis=0)
        t_in = jnp.concatenate([t, t], axis=0)
        eps = self.unet_apply(unet_params, lat_in, t_in, text_embeddings)
        eps_cond, eps_uncond = jnp.split(eps, 2, axis=0)
        eps_sd = eps_uncond + cfg.guidance_scale * (eps_cond - eps_uncond)

        # LoRA UNet v-pred -> eps (sd_vsd_utils.py:205-214)
        cam = self.camera_emb_apply(q_params["camera"], pose16, shading)
        v_q = self.lora_apply(
            q_params["lora"], latents_noisy, t, text_embeddings[:B], cam
        )
        sacp = self.schedule.sqrt_acp(t).reshape(B, 1, 1, 1)
        s1m = self.schedule.sqrt_1m_acp(t).reshape(B, 1, 1, 1)
        eps_q = sacp * v_q + s1m * latents_noisy

        w = (1.0 - self.schedule.alphas_cumprod[t]).reshape(B, 1, 1, 1)
        grad = jnp.nan_to_num(w * (eps_sd - eps_q))
        grad = jax.lax.stop_gradient(grad)
        # SpecifyGradient: dL/dlatents == grad
        loss = jnp.sum(latents * grad)
        return loss, lat_sg

    def lora_loss(
        self,
        q_params: Dict[str, Any],
        latents_clean: jnp.ndarray,  # (B,64,64,4) stop-gradient
        text_pos: jnp.ndarray,  # (B, L, D)
        pose16: jnp.ndarray,  # (B, 16)
        rng: jax.Array,
        uncond_p: float = 0.1,
        shading: str = "albedo",
    ) -> jnp.ndarray:
        """v-prediction MSE for the LoRA update (trainer.py:228-256)."""
        B = latents_clean.shape[0]
        rng_t, rng_n, rng_u = jax.random.split(rng, 3)
        t = jax.random.randint(rng_t, (B,), 0, self.cfg.num_train_timesteps)
        noise = jax.random.normal(rng_n, latents_clean.shape, latents_clean.dtype)
        noisy = add_noise(self.schedule, latents_clean, noise, t)
        drop = jax.random.uniform(rng_u, ()) < uncond_p
        pose = jnp.where(drop, jnp.zeros_like(pose16), pose16)
        cam = self.camera_emb_apply(q_params["camera"], pose, shading)
        v_pred = self.lora_apply(q_params["lora"], noisy, t, text_pos, cam)
        v_target = velocity_from_eps(self.schedule, latents_clean, noise, t)
        return jnp.mean((v_pred - v_target) ** 2)

"""Score Distillation Sampling guidance against the SD 2.1 denoiser.

TPU-native equivalent of the reference StableDiffusionGuidance
(reference: threestudio/models/guidance/stable_diffusion_guidance.py:18-591).
Exact semantics preserved:

* rendered RGB (B,H,W,3) -> bilinear resize to 512^2 -> VAE posterior sample
  * 0.18215 -> (B,64,64,4) latents (guidance.py:159-167, 406-414);
* t ~ U[min_step, max_step] per view (guidance.py:416-423), where min/max =
  round(T * pct) and the (0.02, 0.55) anneal kicks in after step 500
  (GaussianDreamer.py:233-234);
* eps-prediction on [noisy]x2 with (cond ++ uncond) embeddings, classifier-free
  guidance at scale 100 (guidance.py:234-252);
* w(t) = 1 - alphas_cumprod[t] ("sds" weighting), grad = w (eps_hat - eps),
  nan_to_num + clamp to the scheduled grad_clip value (guidance.py:254-276,
  425-427, 581-591);
* loss = 0.5 * ||latents - stop_grad(latents - grad)||^2 / B -- the
  reparameterized SpecifyGradient trick, giving dL/dlatents = grad.

The whole thing is one jitted, differentiable function: the UNet/VAE forwards
run in bf16 on the MXU, all B views in one batch (the reference loops views in
Python and runs fp16 autocast).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from garmentdreamer_tpu.guidance.scheduler import DiffusionSchedule, add_noise, make_schedule

__all__ = ["SDSConfig", "SDSGuidance", "guidance_eval", "perpendicular_component"]


def perpendicular_component(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Component of x perpendicular to y, per batch element
    (reference: threestudio/utils/ops.py:431-442)."""
    axes = tuple(range(1, x.ndim))
    dot = jnp.sum(x * y, axis=axes, keepdims=True)
    yy = jnp.maximum(jnp.sum(y * y, axis=axes, keepdims=True), 1e-6)
    return x - (dot / yy) * y


@dataclass(frozen=True)
class SDSConfig:
    guidance_scale: float = 100.0
    weighting_strategy: str = "sds"
    min_step_percent: float = 0.02
    max_step_percent: float = 0.98
    latent_size: int = 64
    image_size: int = 512
    num_train_timesteps: int = 1000
    # Score Jacobian Chaining alternative (stable_diffusion_guidance.py:38-39,
    # 278-372): sigma-space noising + score-based grad instead of eps-SDS
    use_sjc: bool = False
    var_red: bool = True


class SDSGuidance:
    """Callable bundle: UNet + VAE apply functions with their params.

    ``unet_apply(params, latents_nhwc, t, encoder_hidden_states)`` and
    ``vae_encode(params, images_nhwc_minus1_1, rng)`` -> scaled latents.
    """

    def __init__(
        self,
        cfg: SDSConfig,
        unet_apply: Callable,
        unet_params: Any,
        vae_encode: Callable,
        vae_params: Any,
    ):
        self.cfg = cfg
        self.schedule: DiffusionSchedule = make_schedule(cfg.num_train_timesteps)
        self.unet_apply = unet_apply
        self.unet_params = unet_params
        self.vae_encode = vae_encode
        self.vae_params = vae_params

    def min_max_step(self, min_pct: float, max_pct: float):
        T = self.cfg.num_train_timesteps
        return int(T * min_pct), int(T * max_pct)

    def __call__(
        self,
        rgb: jnp.ndarray,  # (B, H, W, 3) in [0,1]
        text_embeddings: jnp.ndarray,  # (2B, L, D) cond ++ uncond
        rng: jax.Array,
        min_step_percent: Optional[float] = None,
        max_step_percent: Optional[float] = None,
        grad_clip_val: Optional[jnp.ndarray] = None,
        rgb_as_latents: bool = False,
        neg_guidance_weights: Optional[jnp.ndarray] = None,  # (B, 2) => perp-neg
        params: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, jnp.ndarray]:
        """With ``neg_guidance_weights`` given, ``text_embeddings`` must be the
        (4B, L, D) perp-neg layout from
        :func:`garmentdreamer_tpu.guidance.prompt.get_text_embeddings_perp_neg`
        and the 4-way-batch perp-neg guidance is used (reference:
        stable_diffusion_guidance.py:185-232); otherwise the plain (2B, L, D)
        cond ++ uncond CFG path runs.

        ``params`` ({"unet": ..., "vae": ...}) overrides the stored weights --
        REQUIRED at SD-2.1 scale so the ~3.5 GB of parameters enter the jitted
        train step as arguments instead of captured constants (closure capture
        bakes them into the HLO: slow lowering, and the remote-compile service
        rejects multi-GB programs)."""
        cfg = self.cfg
        unet_params = self.unet_params if params is None else params["unet"]
        vae_params = self.vae_params if params is None else params["vae"]
        B = rgb.shape[0]
        rng_vae, rng_t, rng_noise = jax.random.split(rng, 3)

        if rgb_as_latents:
            latents = jax.image.resize(
                rgb, (B, cfg.latent_size, cfg.latent_size, rgb.shape[-1]), "bilinear"
            )
        else:
            if rgb.shape[1:3] != (cfg.image_size, cfg.image_size):
                rgb512 = jax.image.resize(
                    rgb, (B, cfg.image_size, cfg.image_size, 3), "bilinear"
                )
            else:
                # identity resize is NOT free under autodiff (bilinear
                # gather + its VJP); skip it when the render is already at
                # guidance resolution
                rgb512 = rgb
            latents = self.vae_encode(vae_params, rgb512 * 2.0 - 1.0, rng_vae)

        min_step, max_step = self.min_max_step(
            cfg.min_step_percent if min_step_percent is None else min_step_percent,
            cfg.max_step_percent if max_step_percent is None else max_step_percent,
        )
        t = jax.random.randint(rng_t, (B,), min_step, max_step + 1)

        noise = jax.random.normal(rng_noise, latents.shape, latents.dtype)
        lat_sg = jax.lax.stop_gradient(latents)
        if cfg.use_sjc:
            # SJC noising: zs = y + sigma*eps with sigma = sqrt((1-a)/a);
            # the UNet sees zs / sqrt(1 + sigma^2)
            # (stable_diffusion_guidance.py:133,300-345)
            acp_sjc = self.schedule.alphas_cumprod[t].reshape(B, 1, 1, 1)
            sigma = jnp.sqrt((1.0 - acp_sjc) / acp_sjc)
            zs = lat_sg + sigma * noise
            latents_noisy = zs / jnp.sqrt(1.0 + sigma**2)
        else:
            latents_noisy = add_noise(self.schedule, lat_sg, noise, t)

        if neg_guidance_weights is not None:
            # perp-neg: [pos, uncond, neg0, neg1] in one 4B batch
            # (reference: stable_diffusion_guidance.py:196-227)
            latent_in = jnp.concatenate([latents_noisy] * 4, axis=0)
            t_in = jnp.concatenate([t] * 4, axis=0)
            eps_pred = self.unet_apply(unet_params, latent_in, t_in, text_embeddings)
            eps_text = eps_pred[:B]
            eps_uncond = eps_pred[B : 2 * B]
            eps_neg = eps_pred[2 * B :]  # (2B,...) interleaved [v0n0, v0n1, v1n0, ...]
            e_pos = eps_text - eps_uncond
            accum = jnp.zeros_like(e_pos)
            for i in range(2):
                e_i_neg = eps_neg[i::2] - eps_uncond
                accum = accum + neg_guidance_weights[:, i].reshape(
                    B, 1, 1, 1
                ) * perpendicular_component(e_i_neg, e_pos)
            eps_hat = eps_uncond + cfg.guidance_scale * (e_pos + accum)
        else:
            # one batched UNet call for cond+uncond over all views
            latent_in = jnp.concatenate([latents_noisy, latents_noisy], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            eps_pred = self.unet_apply(unet_params, latent_in, t_in, text_embeddings)
            eps_cond, eps_uncond = jnp.split(eps_pred, 2, axis=0)
            eps_hat = eps_cond + cfg.guidance_scale * (eps_cond - eps_uncond)

        if cfg.use_sjc:
            # score grad: Ds = zs - sigma*eps_hat; grad = -(Ds - y)/sigma
            # (var_red) or -(Ds - zs)/sigma (guidance.py:358-362)
            Ds = zs - sigma * eps_hat
            if cfg.var_red:
                grad = -(Ds - lat_sg) / sigma
            else:
                grad = -(Ds - zs) / sigma
        else:
            acp_t = self.schedule.alphas_cumprod[t].reshape(B, 1, 1, 1)
            if cfg.weighting_strategy == "sds":
                w = 1.0 - acp_t
            elif cfg.weighting_strategy == "uniform":
                w = jnp.ones_like(acp_t)
            elif cfg.weighting_strategy == "fantasia3d":
                w = jnp.sqrt(acp_t) * (1.0 - acp_t)
            else:
                raise ValueError(cfg.weighting_strategy)

            grad = w * (eps_hat - noise)
        grad = jnp.nan_to_num(grad)
        if grad_clip_val is not None:
            grad = jnp.clip(grad, -grad_clip_val, grad_clip_val)
        grad = jax.lax.stop_gradient(grad)

        target = jax.lax.stop_gradient(latents - grad)
        loss_sds = 0.5 * jnp.sum((latents - target) ** 2) / B

        return {
            "loss_sds": loss_sds,
            "grad_norm": jnp.linalg.norm(grad),
            "latents": latents,
            "t": t,
        }


def guidance_eval(
    guidance: SDSGuidance,
    vae_decode: Callable,
    vae_decode_params: Any,
    rgb: jnp.ndarray,  # (B, H, W, 3)
    text_embeddings: jnp.ndarray,  # (2B, L, D)
    rng: jax.Array,
    num_steps: int = 25,
) -> Dict[str, jnp.ndarray]:
    """Denoising previews of the SDS target (reference QA harness,
    stable_diffusion_guidance.py:503-579): for a random t, return the noisy
    latents decoded, the 1-step x0 estimate, and the fully DDIM-denoised
    image -- the images a practitioner inspects to see what the guidance is
    pulling toward.

    ``vae_decode(params, latents) -> images in [-1, 1]``.
    """
    from garmentdreamer_tpu.guidance.scheduler import add_noise, ddim_step

    cfg = guidance.cfg
    B = rgb.shape[0]
    rng_vae, rng_t, rng_noise = jax.random.split(rng, 3)
    rgb512 = jax.image.resize(rgb, (B, cfg.image_size, cfg.image_size, 3), "bilinear")
    latents = guidance.vae_encode(guidance.vae_params, rgb512 * 2.0 - 1.0, rng_vae)

    min_step, max_step = guidance.min_max_step(
        cfg.min_step_percent, cfg.max_step_percent
    )
    t = jax.random.randint(rng_t, (B,), min_step, max_step + 1)
    noise = jax.random.normal(rng_noise, latents.shape, latents.dtype)
    noisy = add_noise(guidance.schedule, latents, noise, t)

    def cfg_eps(lat, tt):
        lat_in = jnp.concatenate([lat, lat], axis=0)
        t_in = jnp.concatenate([tt, tt], axis=0)
        eps = guidance.unet_apply(guidance.unet_params, lat_in, t_in, text_embeddings)
        e_c, e_u = jnp.split(eps, 2, axis=0)
        return e_c + cfg.guidance_scale * (e_c - e_u)

    eps0 = cfg_eps(noisy, t)
    acp = guidance.schedule.alphas_cumprod[t].reshape(B, 1, 1, 1)
    x0_1step = (noisy - jnp.sqrt(1 - acp) * eps0) / jnp.sqrt(acp)

    # full DDIM from each sample's t down to 0 on a shared coarse schedule
    ts_all = jnp.linspace(cfg.num_train_timesteps - 1, 0, num_steps).astype(jnp.int32)

    def body(lat, i):
        tt = ts_all[i]
        t_prev = jnp.where(i + 1 < num_steps, ts_all[i + 1], -1)
        # only steps at/below each sample's own t apply
        active = (tt <= t)[:, None, None, None]
        eps = cfg_eps(lat, jnp.full((B,), tt))
        stepped = ddim_step(
            guidance.schedule, lat, eps, jnp.full((B,), tt), jnp.full((B,), t_prev)
        )
        return jnp.where(active, stepped, lat), None

    denoised, _ = jax.lax.scan(body, noisy, jnp.arange(num_steps))

    def dec(z):
        img = vae_decode(vae_decode_params, z)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    return {
        "t": t,
        "img_noisy": dec(noisy),
        "img_1step": dec(x0_1step),
        "img_final": dec(denoised),
    }

"""Diffusion noise schedules: tables + add_noise + DDIM stepping.

Matches the diffusers schedulers the reference relies on exactly
(reference: stable_diffusion_guidance.py:110-131 -- DDIM/DDPM with
``beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
num_train_timesteps=1000`` for SD 2.1): betas are linear in sqrt-space,
``alphas_cumprod`` is the product table indexed by integer timesteps.

Pure jnp arrays -- schedules are tiny constants baked into the jitted graph.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["DiffusionSchedule", "make_schedule", "add_noise", "ddim_step", "velocity_from_eps", "eps_from_velocity"]


class DiffusionSchedule(NamedTuple):
    betas: jnp.ndarray  # (T,)
    alphas_cumprod: jnp.ndarray  # (T,)
    num_train_timesteps: int

    def sqrt_acp(self, t):
        return jnp.sqrt(self.alphas_cumprod[t])

    def sqrt_1m_acp(self, t):
        return jnp.sqrt(1.0 - self.alphas_cumprod[t])


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
) -> DiffusionSchedule:
    if beta_schedule == "scaled_linear":
        betas = jnp.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32) ** 2
    elif beta_schedule == "linear":
        betas = jnp.linspace(beta_start, beta_end, num_train_timesteps)
    else:
        raise ValueError(beta_schedule)
    alphas = 1.0 - betas
    acp = jnp.cumprod(alphas)
    return DiffusionSchedule(
        betas=betas.astype(jnp.float32),
        alphas_cumprod=acp.astype(jnp.float32),
        num_train_timesteps=num_train_timesteps,
    )


def _bcast(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def add_noise(
    sched: DiffusionSchedule, sample: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """x_t = sqrt(acp_t) x_0 + sqrt(1-acp_t) eps (diffusers add_noise)."""
    sa = _bcast(sched.sqrt_acp(t), sample.ndim)
    s1 = _bcast(sched.sqrt_1m_acp(t), sample.ndim)
    return sa * sample + s1 * noise


def velocity_from_eps(
    sched: DiffusionSchedule, sample: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """v = sqrt(acp) eps - sqrt(1-acp) x_0 (diffusers get_velocity, used by the
    LoRA v-prediction objective, reference: netf/trainer.py:240-248)."""
    sa = _bcast(sched.sqrt_acp(t), sample.ndim)
    s1 = _bcast(sched.sqrt_1m_acp(t), sample.ndim)
    return sa * noise - s1 * sample


def eps_from_velocity(
    sched: DiffusionSchedule, x_t: jnp.ndarray, v: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Convert a v-prediction back to an eps-prediction at x_t
    (reference: sd_vsd_utils.py:192-214 lora v-pred -> eps)."""
    sa = _bcast(sched.sqrt_acp(t), x_t.ndim)
    s1 = _bcast(sched.sqrt_1m_acp(t), x_t.ndim)
    return sa * v + s1 * x_t


def ddim_step(
    sched: DiffusionSchedule,
    x_t: jnp.ndarray,
    eps: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    eta: float = 0.0,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One deterministic (eta=0) DDIM update t -> t_prev."""
    acp_t = _bcast(sched.alphas_cumprod[t], x_t.ndim)
    acp_prev = _bcast(
        jnp.where(t_prev >= 0, sched.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0), x_t.ndim
    )
    x0 = (x_t - jnp.sqrt(1 - acp_t) * eps) / jnp.sqrt(acp_t)
    sigma = eta * jnp.sqrt((1 - acp_prev) / (1 - acp_t)) * jnp.sqrt(1 - acp_t / acp_prev)
    dir_xt = jnp.sqrt(jnp.maximum(1 - acp_prev - sigma**2, 0.0)) * eps
    x_prev = jnp.sqrt(acp_prev) * x0 + dir_xt
    if eta > 0:
        assert noise is not None
        x_prev = x_prev + sigma * noise
    return x_prev

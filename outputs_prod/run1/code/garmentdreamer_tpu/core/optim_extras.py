"""Adan optimizer + LR-schedule factory (optax).

Rebuild of the reference's optimizer utilities (reference:
threestudio/systems/optimizers.py:23-255 -- the Adan implementation
registered for ``parse_optimizer``, threestudio/systems/utils.py:33-86 --
optimizer/scheduler parsing; and diffusers'
``get_cosine_schedule_with_warmup`` used by the offline trainers,
Garment_Diffusion/run_df_textconditioned.py:200-203).

Adan update (optimizers.py:200-255 single-tensor math):
    diff_t = g_t - g_{t-1}            (0 at the first step)
    m_t = b1 m + (1-b1) g_t
    d_t = b2 d + (1-b2) diff_t
    n_t = b3 n + (1-b3) (g_t + b2 diff_t)^2
    denom = sqrt(n_t)/sqrt(bc3) + eps
    p  -=  lr/bc1 * m_t/denom + lr*b2/bc2 * d_t/denom
    weight decay: proximal p /= (1 + lr*wd)  (or decoupled when no_prox)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["adan", "ScaleByAdanState", "parse_scheduler"]


class ScaleByAdanState(NamedTuple):
    count: jnp.ndarray
    exp_avg: Any
    exp_avg_sq: Any
    exp_avg_diff: Any
    prev_grad: Any


def adan(
    learning_rate: float | Callable = 1e-3,
    betas: Tuple[float, float, float] = (0.98, 0.92, 0.99),
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    no_prox: bool = False,
) -> optax.GradientTransformation:
    b1, b2, b3 = betas

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return ScaleByAdanState(
            count=jnp.zeros([], jnp.int32),
            exp_avg=z,
            exp_avg_sq=jax.tree.map(jnp.zeros_like, params),
            exp_avg_diff=jax.tree.map(jnp.zeros_like, params),
            prev_grad=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        if params is None and weight_decay:
            raise ValueError("adan with weight_decay requires params")
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        bc3 = 1.0 - b3 ** count.astype(jnp.float32)

        is_first = count == 1
        diff = jax.tree.map(
            lambda g, pg: jnp.where(is_first, 0.0, g - pg), grads, state.prev_grad
        )
        m = jax.tree.map(lambda m_, g: b1 * m_ + (1 - b1) * g, state.exp_avg, grads)
        d = jax.tree.map(lambda d_, df: b2 * d_ + (1 - b2) * df,
                         state.exp_avg_diff, diff)
        n = jax.tree.map(
            lambda n_, g, df: b3 * n_ + (1 - b3) * (g + b2 * df) ** 2,
            state.exp_avg_sq, grads, diff,
        )

        def upd(m_, d_, n_, p):
            denom = jnp.sqrt(n_) / jnp.sqrt(bc3) + eps
            u = -(lr / bc1) * m_ / denom - (lr * b2 / bc2) * d_ / denom
            if weight_decay:
                if no_prox:
                    u = u - p * (lr * weight_decay)
                else:
                    u = (p + u) / (1.0 + lr * weight_decay) - p
            return u

        if weight_decay:
            updates = jax.tree.map(upd, m, d, n, params)
        else:
            updates = jax.tree.map(lambda m_, d_, n_: upd(m_, d_, n_, None), m, d, n)
        return updates, ScaleByAdanState(count, m, n, d, grads)

    return optax.GradientTransformation(init, update)


def parse_scheduler(config: Dict[str, Any]) -> optax.Schedule:
    """name + args -> optax schedule fn (threestudio parse_scheduler's role;
    ``sequential`` composes sub-schedules at milestones like SequentialLR).

    Supported names: constant, linear, exponential, multistep,
    cosine_warmup, sequential.
    """
    name = config["name"]
    args = config.get("args", {})
    if name == "constant":
        return optax.constant_schedule(args.get("value", 1.0))
    if name == "linear":
        return optax.linear_schedule(
            args["init_value"], args["end_value"], args["transition_steps"]
        )
    if name == "exponential":
        return optax.exponential_decay(
            args["init_value"], args["transition_steps"], args["decay_rate"]
        )
    if name == "multistep":
        # torch MultiStepLR: multiply by gamma at each milestone
        gamma = args.get("gamma", 0.1)
        init = args.get("init_value", 1.0)
        milestones = sorted(args["milestones"])

        def sched(step):
            step = jnp.asarray(step)
            k = sum(jnp.asarray(step >= m, jnp.float32) for m in milestones)
            return init * gamma**k

        return sched
    if name == "cosine_warmup":
        # diffusers get_cosine_schedule_with_warmup
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=args.get("peak_value", 1.0),
            warmup_steps=args["warmup_steps"],
            decay_steps=args["total_steps"],
            end_value=args.get("end_value", 0.0),
        )
    if name == "sequential":
        scheds = [parse_scheduler(c) for c in config["schedulers"]]
        return optax.join_schedules(scheds, config["milestones"])
    raise ValueError(f"unknown scheduler {name!r}")

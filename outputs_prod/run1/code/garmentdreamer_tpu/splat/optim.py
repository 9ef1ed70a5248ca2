"""Per-parameter-group Adam for the Gaussian cloud, with moment surgery hooks.

Reproduces the reference's optimizer setup (reference:
gaussiansplatting/scene/gaussian_model.py:149-177 and
gaussiansplatting/arguments/__init__.py OptimizationParams):

* Adam(beta1=0.9, beta2=0.999, eps=1e-15);
* group learning rates: xyz = exponential log-lerp schedule
  (position_lr_init*spatial_lr_scale -> position_lr_final*spatial_lr_scale over
  position_lr_max_steps, utils/general_utils.py get_expon_lr_func), features_dc
  = feature_lr, features_rest = feature_lr/20, opacity/scaling/rotation fixed;
* densification's optimizer-state surgery (gaussian_model.py:268-340) becomes
  :func:`reset_moments_rows` -- zero the Adam moments of rewritten rows at
  fixed shape.

Built on raw optax ``scale_by_adam`` so the (mu, nu) pytrees mirror
``GaussianParams`` exactly and can be masked per-row.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from garmentdreamer_tpu.splat.state import GaussianParams

__all__ = ["GaussianOptimConfig", "xyz_lr_schedule", "make_optimizer", "reset_moments_rows"]


class GaussianOptimConfig(NamedTuple):
    position_lr_init: float = 0.00005
    position_lr_final: float = 0.000025
    position_lr_delay_steps: int = 0
    position_lr_delay_mult: float = 0.5
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0125
    opacity_lr: float = 0.01
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    spatial_lr_scale: float = 4.0  # = cameras_extent (GaussianDreamer.py:426)
    percent_dense: float = 0.01
    densify_grad_threshold: float = 0.0002


def xyz_lr_schedule(cfg: GaussianOptimConfig):
    """Log-linear interpolated decay (reference: general_utils.py:29-60)."""
    lr_init = cfg.position_lr_init * cfg.spatial_lr_scale
    lr_final = cfg.position_lr_final * cfg.spatial_lr_scale

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if cfg.position_lr_delay_steps > 0:
            delay = cfg.position_lr_delay_mult + (1 - cfg.position_lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / cfg.position_lr_delay_steps, 0, 1)
            )
        else:
            delay = 1.0
        t = jnp.clip(step / cfg.position_lr_max_steps, 0.0, 1.0)
        return delay * jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)

    return schedule


def make_optimizer(cfg: GaussianOptimConfig) -> optax.GradientTransformation:
    """Adam with per-group LRs; xyz LR follows the exponential schedule."""
    sched = xyz_lr_schedule(cfg)

    def group_lrs(step):
        return GaussianParams(
            xyz=sched(step),
            features_dc=cfg.feature_lr,
            features_rest=cfg.feature_lr / 20.0,
            scaling=cfg.scaling_lr,
            rotation=cfg.rotation_lr,
            opacity=cfg.opacity_lr,
        )

    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15)

    def init(params):
        return adam.init(params)

    def update(grads, state, params=None):
        updates, state = adam.update(grads, state, params)
        lrs = group_lrs(state.count - 1)  # count already incremented by adam
        updates = jax.tree.map(
            lambda u, lr: -lr * u, updates, lrs, is_leaf=lambda x: x is None
        )
        return updates, state

    return optax.GradientTransformation(init, update)


def reset_moments_rows(opt_state, row_mask: jnp.ndarray):
    """Zero Adam first/second moments for rows where ``row_mask`` is True.

    The fixed-shape analog of the reference's exp_avg cat/prune surgery
    (gaussian_model.py:283-340): freshly written (cloned/split) and pruned rows
    restart with clean moments.
    """

    def zero_rows(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0 or leaf.shape[0] != row_mask.shape[0]:
            return leaf
        m = row_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, 0.0, leaf)

    def fix(entry):
        if isinstance(entry, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=entry.count,
                mu=jax.tree.map(zero_rows, entry.mu),
                nu=jax.tree.map(zero_rows, entry.nu),
            )
        return entry

    if isinstance(opt_state, optax.ScaleByAdamState):
        return fix(opt_state)
    return tuple(fix(e) for e in opt_state) if isinstance(opt_state, tuple) else fix(opt_state)

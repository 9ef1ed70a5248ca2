"""Standalone photometric 3DGS training: fit Gaussians to posed images.

Reference parity: the vanilla gaussiansplatting/train.py:31-130 loop
((1-l)L1 + l(1-SSIM) photo loss, densify/prune schedule, per-group Adam with
the exponential xyz lr decay) -- the subtree the reference ships "runnable
separately" (SURVEY.md section 2.2). This is also the validation harness SURVEY
section 7 step 2 prescribes for the splat backward pass before SDS enters.

TPU-shaped: one jitted step renders a batch of views (vmap) and takes the
photometric loss against the targets; densification runs at the reference
cadence between jitted steps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from garmentdreamer_tpu.splat import state as state_mod
from garmentdreamer_tpu.splat.metrics import photometric_loss, psnr
from garmentdreamer_tpu.splat.optim import GaussianOptimConfig, make_optimizer, reset_moments_rows
from garmentdreamer_tpu.splat.render import render_batch

__all__ = ["PhotometricConfig", "fit_photometric"]


@dataclasses.dataclass
class PhotometricConfig:
    iterations: int = 7000
    lambda_dssim: float = 0.2
    batch_size: int = 4
    densify_from: int = 500
    densify_until: int = 15000
    densify_interval: int = 100
    densify_grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    max_tiles_per_gaussian: int = 16
    max_per_tile: int = 256
    seed: int = 0


def fit_photometric(
    st: state_mod.GaussianState,
    cams: Dict[str, np.ndarray],  # stacked camera arrays (N, ...)
    targets: np.ndarray,  # (N, H, W, 3) in [0, 1]
    cfg: Optional[PhotometricConfig] = None,
    optim_cfg: Optional[GaussianOptimConfig] = None,
    callback: Optional[Callable] = None,
    viewer=None,
):
    """Returns (state, metrics dict with final train PSNR).

    ``viewer``: an optional :class:`garmentdreamer_tpu.splat.viewer.NetworkGUI`
    polled each iteration, exactly like the reference vanilla train loop
    polls network_gui (gaussiansplatting/train.py:52-66)."""
    cfg = cfg or PhotometricConfig()
    H, W = targets.shape[1:3]
    optimizer = make_optimizer(optim_cfg or GaussianOptimConfig())
    opt_state = optimizer.init(st.params)
    bg = jnp.zeros(3, jnp.float32)
    rs = np.random.RandomState(cfg.seed)

    @jax.jit
    def step(params, stats, opt_state, cam_batch, tgt):
        def loss_fn(p, so):
            s = state_mod.GaussianState(
                params=p, stats=stats, active_sh_degree=st.active_sh_degree,
                max_sh_degree=st.max_sh_degree,
            )
            out = render_batch(
                s, cam_batch, bg, H, W,
                screen_offsets=so,
                max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
                max_per_tile=cfg.max_per_tile,
            )
            losses = jax.vmap(
                lambda a, b: photometric_loss(a, b, cfg.lambda_dssim)
            )(out["render"], tgt)
            return jnp.mean(losses), out["render"]

        so = jnp.zeros((cfg.batch_size, st.capacity, 2))
        (loss, render), grads = jax.value_and_grad(loss_fn, (0, 1), has_aux=True)(
            params, so
        )
        g_params, g_screen = grads
        updates, opt_state = optimizer.update(g_params, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        # densification stats: mean2D grad norms (reference add_densification_stats)
        gnorm = jnp.linalg.norm(g_screen, axis=-1).max(axis=0)  # (C,)
        p = jnp.mean(psnr(render[0], tgt[0]))
        return params, opt_state, loss, gnorm, p

    from garmentdreamer_tpu.splat import densify as dmod

    n_views = targets.shape[0]
    last_psnr = 0.0
    rng = jax.random.PRNGKey(cfg.seed)
    for it in range(cfg.iterations):
        if viewer is not None:
            viewer.handle(st, it, cfg.iterations)
        idx = rs.choice(n_views, cfg.batch_size, replace=n_views < cfg.batch_size)
        cam_batch = {k: jnp.asarray(v[idx]) for k, v in cams.items()}
        tgt = jnp.asarray(targets[idx])
        params, opt_state, loss, gnorm, p = step(
            st.params, st.stats, opt_state, cam_batch, tgt
        )
        st = st.replace(params=params)
        st = st.replace(
            stats=st.stats.replace(
                xyz_grad_accum=st.stats.xyz_grad_accum + gnorm,
                denom=st.stats.denom + (gnorm > 0),
            )
        )
        last_psnr = float(p)
        if (
            cfg.densify_from < it <= cfg.densify_until
            and it % cfg.densify_interval == 0
        ):
            rng, sub = jax.random.split(rng)
            res = dmod.densify_and_prune(
                st,
                max_grad=cfg.densify_grad_threshold,
                min_opacity=cfg.min_opacity,
                extent=1.0,
                size_threshold=None,
                percent_dense=0.01,
                rng=sub,
            )
            st = res.state
            opt_state = reset_moments_rows(opt_state, res.rewritten_rows)
        if callback is not None:
            callback(it, st, {"loss": float(loss), "psnr": last_psnr})
    return st, {"psnr": last_psnr}

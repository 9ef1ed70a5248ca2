"""Adaptive density control at fixed capacity: clone / split / prune as masked writes.

Re-design of the reference's densification (reference:
gaussiansplatting/scene/gaussian_model.py:268-419 densify_and_clone /
densify_and_split / densify_and_prune / add_densification_stats). The reference
reallocates every parameter tensor and performs torch optimizer-state surgery;
under XLA that means a recompile per densify step. Here the cloud lives in
fixed-capacity arrays with an ``active`` mask, and one jitted
:func:`densify_and_prune` call does everything with static shapes:

* candidate pool = [clones (C rows) ; split children (2C rows)], each with a
  validity mask;
* valid candidates are scattered into inactive rows (rank-matched via argsort
  of the active mask); overflow beyond free capacity is counted and dropped;
* prune = deactivate rows (opacity / screen-size / world-size tests);
* Adam moments of every rewritten or pruned row are zeroed via
  :func:`garmentdreamer_tpu.splat.optim.reset_moments_rows`.

Semantics parity notes:
* clone condition: grad >= thr and max(scale) <= percent_dense*extent;
* split condition: grad >= thr and max(scale) > percent_dense*extent; children
  sampled from N(0, scale) rotated into world, scale/(0.8*N), N=2; parent dies;
* prune condition: opacity < min_opacity, or (when size_threshold given)
  max_radii2d > size_threshold or max(scale) > 0.1*extent;
* the reference's same-pass prune of just-added rows is reproduced by applying
  the opacity/world-size test to candidates before scattering;
* stats (grad accum, denom, max radii) reset to zero afterwards.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from garmentdreamer_tpu.splat.project import build_rotation
from garmentdreamer_tpu.splat.state import GaussianParams, GaussianState, GaussianStats

__all__ = ["DensifyResult", "add_densification_stats", "densify_and_prune"]


class DensifyResult(NamedTuple):
    state: GaussianState
    rewritten_rows: jnp.ndarray  # (C,) bool: rows whose Adam moments must reset
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_overflow: jnp.ndarray  # candidates dropped for lack of free rows


def add_densification_stats(
    state: GaussianState,
    viewspace_grad: jnp.ndarray,  # (C,2) dL/d mean2D summed over views
    visibility: jnp.ndarray,  # (C,) bool (radii > 0 in any view)
    radii_max: jnp.ndarray,  # (C,) int32 max radii over the view batch
) -> GaussianState:
    """Accumulate per-gaussian screen-space gradient norms and max radii
    (reference: gaussian_model.py:415-419 + GaussianDreamer.py:270-277)."""
    stats = state.stats
    gnorm = jnp.linalg.norm(viewspace_grad[:, :2], axis=-1)
    vis = visibility & stats.active
    return state.replace(
        stats=stats.replace(
            xyz_grad_accum=stats.xyz_grad_accum + jnp.where(vis, gnorm, 0.0),
            denom=stats.denom + vis.astype(jnp.float32),
            max_radii2d=jnp.where(
                vis, jnp.maximum(stats.max_radii2d, radii_max.astype(jnp.float32)), stats.max_radii2d
            ),
        )
    )


def _scatter_candidates(
    params: GaussianParams,
    active: jnp.ndarray,
    cand: GaussianParams,
    cand_valid: jnp.ndarray,
) -> Tuple[GaussianParams, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scatter valid candidate rows into inactive rows. Returns
    (params, new_active, written_mask, n_overflow)."""
    C = active.shape[0]
    n_free = jnp.sum(~active)
    # inactive row indices first (stable ascending)
    free_slots = jnp.argsort(active)  # False < True
    rank = jnp.cumsum(cand_valid.astype(jnp.int32)) - 1  # (3C,) rank among valid
    fits = cand_valid & (rank < n_free)
    target = jnp.where(fits, free_slots[jnp.clip(rank, 0, C - 1)], C)  # C = drop

    def scatter(leaf, cand_leaf):
        return leaf.at[target].set(cand_leaf, mode="drop")

    new_params = jax.tree.map(scatter, params, cand)
    written = jnp.zeros((C,), bool).at[target].set(fits, mode="drop")
    new_active = active | written
    n_overflow = jnp.sum(cand_valid) - jnp.sum(fits)
    return new_params, new_active, written, n_overflow


@partial(jax.jit, static_argnames=("n_split",))
def densify_and_prune(
    state: GaussianState,
    max_grad: float,
    min_opacity: float,
    extent: float,
    size_threshold: Optional[float],
    percent_dense: float,
    rng: jax.Array,
    n_split: int = 2,
) -> DensifyResult:
    params, stats = state.params, state.stats
    C = state.capacity
    active = stats.active

    grads = jnp.where(stats.denom > 0, stats.xyz_grad_accum / jnp.maximum(stats.denom, 1.0), 0.0)
    grads = jnp.nan_to_num(grads)
    scale = jnp.exp(params.scaling)
    max_scale = jnp.max(scale, axis=-1)
    opacity = jax.nn.sigmoid(params.opacity[:, 0])

    hot = active & (grads >= max_grad)
    small = max_scale <= percent_dense * extent
    clone_mask = hot & small
    split_mask = hot & ~small

    # --- prune existing rows (original + split parents) ---------------------
    prune = opacity < min_opacity
    if size_threshold is not None:
        prune = prune | (stats.max_radii2d > size_threshold) | (max_scale > 0.1 * extent)
    prune = (prune | split_mask) & active
    survivors = active & ~prune

    # --- candidate pool: C clones + n_split*C split children ----------------
    clone_cand = params
    clone_valid = clone_mask

    # split children: x' = R @ eps*scale + x, scale' = log(scale / (0.8*N))
    eps = jax.random.normal(rng, (n_split, C, 3), params.xyz.dtype) * scale[None]
    R = build_rotation(params.rotation)  # (C,3,3)
    offsets = jnp.einsum("cij,ncj->nci", R, eps)
    split_xyz = params.xyz[None] + offsets  # (n_split, C, 3)
    split_scaling = jnp.broadcast_to(params.scaling - jnp.log(0.8 * n_split), (n_split, C, 3))

    def rep(leaf):
        return jnp.broadcast_to(leaf[None], (n_split,) + leaf.shape).reshape(
            (n_split * C,) + leaf.shape[1:]
        )

    split_cand = GaussianParams(
        xyz=split_xyz.reshape(n_split * C, 3),
        features_dc=rep(params.features_dc),
        features_rest=rep(params.features_rest),
        scaling=split_scaling.reshape(n_split * C, 3),
        rotation=rep(params.rotation),
        opacity=rep(params.opacity),
    )
    split_valid = jnp.tile(split_mask, n_split)

    cand = jax.tree.map(
        lambda a, b: jnp.concatenate([a, b], axis=0), clone_cand, split_cand
    )
    cand_valid = jnp.concatenate([clone_valid, split_valid], axis=0)

    # same-pass prune of new rows (reference prunes after appending):
    cand_opacity = jax.nn.sigmoid(cand.opacity[:, 0])
    cand_max_scale = jnp.max(jnp.exp(cand.scaling), axis=-1)
    cand_ok = cand_opacity >= min_opacity
    if size_threshold is not None:
        cand_ok = cand_ok & (cand_max_scale <= 0.1 * extent)
    cand_valid = cand_valid & cand_ok

    new_params, new_active, written, n_overflow = _scatter_candidates(
        params, survivors, cand, cand_valid
    )

    # deactivated rows keep params but are masked everywhere; their opacity row
    # is reset so a later write starts clean even if never rewritten
    new_stats = GaussianStats(
        active=new_active,
        max_radii2d=jnp.zeros_like(stats.max_radii2d),
        xyz_grad_accum=jnp.zeros_like(stats.xyz_grad_accum),
        denom=jnp.zeros_like(stats.denom),
    )
    rewritten = written | prune
    return DensifyResult(
        state=state.replace(params=new_params, stats=new_stats),
        rewritten_rows=rewritten,
        n_cloned=jnp.sum(clone_valid & cand_valid[:C]),
        n_split=jnp.sum(split_mask),
        n_pruned=jnp.sum(prune & ~split_mask),
        n_overflow=n_overflow,
    )

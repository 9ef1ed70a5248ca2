"""Fixed-capacity Gaussian cloud state (SoA pytree with an active mask).

TPU-native redesign of the reference ``GaussianModel``
(reference: gaussiansplatting/scene/gaussian_model.py:24-419). The reference
reallocates parameter tensors and performs optimizer-state surgery on every
densify/prune; under XLA that would recompile the training step each time.
Here every array has a static capacity ``C`` and a boolean ``active`` row mask:

* rendering treats inactive rows as opacity 0 (zero contribution, zero grad);
* densify/clone/split/prune are masked scatter writes at fixed shape
  (see :mod:`garmentdreamer_tpu.splat.densify`);
* the optimizer state surgery becomes masked optax moment resets.

Raw (pre-activation) parameterization matches the reference exactly: log scale,
unnormalized quaternion (wxyz), pre-sigmoid opacity, SH features split into DC
(C,1,3) and rest (C,M,3).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from garmentdreamer_tpu.splat import knn as knn_mod
from garmentdreamer_tpu.splat.sh import rgb_to_sh

__all__ = ["GaussianParams", "GaussianStats", "GaussianState", "create_from_pcd", "inverse_sigmoid"]


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


@struct.dataclass
class GaussianParams:
    """The trainable leaves (everything optax sees)."""

    xyz: jnp.ndarray  # (C, 3)
    features_dc: jnp.ndarray  # (C, 1, 3)
    features_rest: jnp.ndarray  # (C, M, 3), M = (deg+1)^2 - 1
    scaling: jnp.ndarray  # (C, 3) log-scale
    rotation: jnp.ndarray  # (C, 4) quaternion wxyz (unnormalized)
    opacity: jnp.ndarray  # (C, 1) pre-sigmoid


@struct.dataclass
class GaussianStats:
    """Densification bookkeeping (reference: gaussian_model.py:415-419)."""

    active: jnp.ndarray  # (C,) bool
    max_radii2d: jnp.ndarray  # (C,) float32, pixels
    xyz_grad_accum: jnp.ndarray  # (C,) float32, sum of |dL/dmean2d| norms
    denom: jnp.ndarray  # (C,) float32, number of visible updates


@struct.dataclass
class GaussianState:
    params: GaussianParams
    stats: GaussianStats
    active_sh_degree: int = struct.field(pytree_node=False, default=0)
    max_sh_degree: int = struct.field(pytree_node=False, default=0)

    # -- activated views -----------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    def n_active(self) -> jnp.ndarray:
        return jnp.sum(self.stats.active.astype(jnp.int32))

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.params.scaling)

    def get_rotation(self) -> jnp.ndarray:
        q = self.params.rotation
        return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)

    def get_opacity(self) -> jnp.ndarray:
        """(C,) sigmoid opacity, with inactive rows forced to 0."""
        op = jax.nn.sigmoid(self.params.opacity[:, 0])
        return jnp.where(self.stats.active, op, 0.0)

    def get_features(self) -> jnp.ndarray:
        """(C, (deg+1)^2, 3) full SH stack (DC first)."""
        return jnp.concatenate([self.params.features_dc, self.params.features_rest], axis=1)

    def one_up_sh_degree(self) -> "GaussianState":
        if self.active_sh_degree < self.max_sh_degree:
            return self.replace(active_sh_degree=self.active_sh_degree + 1)
        return self

    # -- persistence ----------------------------------------------------------
    def to_numpy_active(self) -> Dict[str, np.ndarray]:
        """Host-side compaction to the active rows for PLY export."""
        mask = np.asarray(self.stats.active)
        return {
            "xyz": np.asarray(self.params.xyz)[mask],
            "features_dc": np.asarray(self.params.features_dc)[mask],
            "features_rest": np.asarray(self.params.features_rest)[mask],
            "opacity": np.asarray(self.params.opacity)[mask],
            "scaling": np.asarray(self.params.scaling)[mask],
            "rotation": np.asarray(self.params.rotation)[mask],
        }


def _empty_params(capacity: int, max_sh_degree: int) -> GaussianParams:
    m = (max_sh_degree + 1) ** 2 - 1
    return GaussianParams(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        features_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        features_rest=jnp.zeros((capacity, m, 3), jnp.float32),
        scaling=jnp.full((capacity, 3), -10.0, jnp.float32),  # tiny inactive splats
        rotation=jnp.concatenate(
            [jnp.ones((capacity, 1), jnp.float32), jnp.zeros((capacity, 3), jnp.float32)], axis=1
        ),
        opacity=jnp.full((capacity, 1), -10.0, jnp.float32),
    )


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    capacity: Optional[int] = None,
    max_sh_degree: int = 0,
) -> GaussianState:
    """Initialize from a point cloud (reference: gaussian_model.py:124-147).

    Scales = log(sqrt(mean squared distance to 3 NN)) per axis, opacity =
    inverse_sigmoid(0.1), identity rotations, colors -> DC SH.
    """
    n = points.shape[0]
    capacity = capacity or n
    if capacity < n:
        raise ValueError(f"capacity {capacity} < initial points {n}")

    params = _empty_params(capacity, max_sh_degree)
    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.clip(knn_mod.mean_dist2_knn3(pts), 1e-7, None)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    params = params.replace(
        xyz=params.xyz.at[:n].set(pts),
        features_dc=params.features_dc.at[:n].set(
            rgb_to_sh(jnp.asarray(colors, jnp.float32))[:, None, :]
        ),
        scaling=params.scaling.at[:n].set(scales),
        opacity=params.opacity.at[:n].set(inverse_sigmoid(0.1 * jnp.ones((n, 1)))),
    )
    stats = GaussianStats(
        active=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )
    return GaussianState(params=params, stats=stats, active_sh_degree=0, max_sh_degree=max_sh_degree)

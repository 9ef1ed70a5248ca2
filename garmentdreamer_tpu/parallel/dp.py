"""Data-parallel sharding helpers: the TPU mapping of the reference's only
real parallelism (SURVEY.md section 2.6 -- NCCL DDP in Metric3D, HF Accelerate in
the offline trainers, a per-view python loop in stage 1).

One ``Mesh`` with a single ``data`` axis; parameters replicated, batch axes
sharded. Gradients all-reduce automatically through jit's SPMD partitioner --
no explicit collectives needed at this pipeline's scale (the reference's
``gather``/``all_reduce`` calls, trainers/encdec.py:166,190, dissolve into
the partitioner). Used by ``__graft_entry__.dryrun_multichip``, the
test-suite mesh tests, and the autoencoder trainer's ``mesh`` argument.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "data_parallel_mesh",
    "replicate",
    "shard_batch",
    "shard_view_batch",
]


def data_parallel_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """An (n,)-device mesh with one ``data`` axis."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("data",))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate every array leaf on all mesh devices (non-arrays pass through)."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, s) if hasattr(x, "shape") else x, tree
    )


def shard_batch(tree: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every leaf's LEADING dimension over ``axis``."""
    s = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def shard_view_batch(
    cams: Dict[str, Any], elevation, azimuth, mesh: Mesh
):
    """Stage-1 layout: the (B, ...) camera stack and per-view angles sharded
    over 'data' -- one view per device at B == mesh size (the reference's
    4-camera python loop, GaussianDreamer.py:189-207, as SPMD)."""
    import jax.numpy as jnp

    s = NamedSharding(mesh, P("data"))
    cams_sh = {k: jax.device_put(jnp.asarray(v), s) for k, v in cams.items()}
    return (
        cams_sh,
        jax.device_put(jnp.asarray(elevation), s),
        jax.device_put(jnp.asarray(azimuth), s),
    )

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
    "shard_map_nocheck",
    "strip_cameras",
    "unstrip_images",
    "strip_cotangents",
]


def shard_map_nocheck(f, mesh, in_specs, out_specs):
    """``jax.shard_map`` with replication checking off, across the jax API
    rename (<=0.7 ``check_rep``, >=0.8 ``check_vma``). Our shard_map bodies
    produce replicated outputs by explicit ``psum`` of gradients followed by
    identical updates on every device; the static replication checker cannot
    always prove that (e.g. through ``axis_index``-dependent renders), so it
    stays off and tests pin the parity instead."""
    import inspect

    params = inspect.signature(jax.shard_map).parameters
    kw = {}
    if "check_rep" in params:
        kw["check_rep"] = False
    elif "check_vma" in params:
        kw["check_vma"] = False
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, **kw)


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


def strip_cameras(cams, n_strips: int, height: int):
    """Split each camera of a (B, ...) stack into ``n_strips`` horizontal
    strip cameras -> a (B * n_strips, ...) stack rendering (H/n_strips, W)
    images that tile the originals exactly.

    This is the devices>views answer for the production B=4-views-on-8-chips
    case (VERDICT r2 missing-5): the reference python-loops views on one GPU
    (GaussianDreamer.py:189-207); here every chip owns one (view, strip)
    cell. A strip camera is the same view with an affine remap of the
    projection's NDC y-row (pixel rows [k*hs, (k+1)*hs) -> [0, hs)) and a
    proportionally scaled tanfovy so the EWA focal stays the FULL image's;
    the frustum clamp is pinned via ``lim_xy`` for bit-identical covariances
    (splat/project.py).
    """
    import jax.numpy as jnp

    assert height % n_strips == 0, (height, n_strips)
    hs = height // n_strips
    fp = jnp.asarray(cams["full_proj"])  # (B, 4, 4)
    tan = jnp.asarray(cams["tanfov"])  # (B, 2)
    B = fp.shape[0]

    a = height / hs

    def strip_fp(k):
        b = (height - 2.0 * (k * hs)) / hs - 1.0
        row1 = a * fp[:, 1, :] + b * fp[:, 3, :]
        return fp.at[:, 1, :].set(row1)

    fps = jnp.stack([strip_fp(k) for k in range(n_strips)], axis=1)  # (B,S,4,4)
    tan_s = jnp.stack(
        [tan[:, 0], tan[:, 1] * (hs / height)], axis=-1
    )  # (B, 2) strip tanfov (focal-preserving)
    lim = 1.3 * tan  # FULL-image clamp, identical across strips

    def rep(x):  # (B, ...) -> (B*S, ...)
        return jnp.broadcast_to(
            x[:, None], (B, n_strips) + x.shape[1:]
        ).reshape((B * n_strips,) + x.shape[1:])

    out = {
        "world_view": rep(jnp.asarray(cams["world_view"])),
        "full_proj": fps.reshape((B * n_strips, 4, 4)),
        "camera_center": rep(jnp.asarray(cams["camera_center"])),
        "tanfov": rep(tan_s),
        "lim_xy": rep(lim),
    }
    return out


def unstrip_images(x, n_strips: int):
    """(B*S, hs, W, ...) strip outputs -> (B, S*hs, W, ...) full images."""
    bs = x.shape[0]
    B = bs // n_strips
    return x.reshape((B, n_strips * x.shape[1]) + x.shape[2:])


def strip_cotangents(ct, n_strips: int):
    """(B, H, W, ...) image cotangents -> (B*S, H/S, W, ...) strip shards."""
    B, H = ct.shape[0], ct.shape[1]
    hs = H // n_strips
    return ct.reshape((B * n_strips, hs) + ct.shape[2:])


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

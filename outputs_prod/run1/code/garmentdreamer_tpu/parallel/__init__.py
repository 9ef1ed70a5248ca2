"""Multi-device parallelism: mesh construction + data-parallel sharding."""

from garmentdreamer_tpu.parallel.dp import (
    data_parallel_mesh,
    replicate,
    shard_batch,
    shard_view_batch,
)

__all__ = [
    "data_parallel_mesh",
    "replicate",
    "shard_batch",
    "shard_view_batch",
]

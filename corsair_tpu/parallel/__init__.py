from corsair_tpu.parallel.mesh import (
    make_mesh,
    shard_params,
    shard_batched_clouds,
    batched_extract,
)

__all__ = [
    "make_mesh",
    "shard_params",
    "shard_batched_clouds",
    "batched_extract",
]

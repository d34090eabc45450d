"""Parallelism: device mesh, shardings, distributed helpers."""
from score_sde_pytorch_tpu.parallel.mesh import (
    create_mesh,
    data_sharding,
    replicated,
    shard_batch,
    make_sharded_step,
    spatial_sharding,
    to_local,
)

__all__ = ["create_mesh", "data_sharding", "replicated", "shard_batch",
           "make_sharded_step", "spatial_sharding", "to_local"]

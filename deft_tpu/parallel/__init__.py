from deft_tpu.parallel.mesh import make_mesh
from deft_tpu.parallel.sharding import (
    batch_shardings,
    param_shardings,
    pool_sharding,
    shard_decode_args,
)

__all__ = [
    "make_mesh",
    "param_shardings",
    "pool_sharding",
    "batch_shardings",
    "shard_decode_args",
]

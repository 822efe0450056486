from deft_tpu.parallel.engine import (
    make_sharded_prefill_attn,
    make_sharded_tree_attn,
    replicate,
)
from deft_tpu.parallel.mesh import make_mesh
from deft_tpu.parallel.multihost import init_runtime, is_primary, make_pod_mesh
from deft_tpu.parallel.sharding import (
    batch_shardings,
    param_shardings,
    pool_sharding,
    shard_decode_args,
    shard_params,
)

__all__ = [
    "init_runtime",
    "is_primary",
    "make_mesh",
    "make_pod_mesh",
    "make_sharded_prefill_attn",
    "make_sharded_tree_attn",
    "param_shardings",
    "pool_sharding",
    "batch_shardings",
    "replicate",
    "shard_decode_args",
    "shard_params",
]

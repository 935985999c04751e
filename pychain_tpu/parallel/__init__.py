from .data_parallel import (
    make_mesh,
    shard_batch,
    pjit_chain_function,
    ShardedChainLoss,
)
from .multihost import (
    initialize,
    global_dp_mesh,
    host_local_batch_to_global,
    replicate_to_global,
    save_sharded,
    restore_sharded,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "pjit_chain_function",
    "ShardedChainLoss",
    "initialize",
    "global_dp_mesh",
    "host_local_batch_to_global",
    "replicate_to_global",
    "save_sharded",
    "restore_sharded",
]

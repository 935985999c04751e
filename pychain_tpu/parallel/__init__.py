from .data_parallel import (
    make_mesh,
    shard_batch,
    pjit_chain_function,
    ShardedChainLoss,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "pjit_chain_function",
    "ShardedChainLoss",
]

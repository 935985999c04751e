"""pychain_tpu — TPU-native LF-MMI ("chain") training objective.

A from-scratch JAX/XLA/Pallas re-design with the capability surface of
PyChain (YiwenShaoStephen/pychain): FST graph compilation and batched
HMM forward-backward (probability domain + leaky HMM for the
denominator; log domain for numerators), exposed as a differentiable
loss, plus data-parallel sharding over TPU meshes.

Public surface mirrors the reference package (__init__.py:1-2 re-exports
loss + graph):
"""

from .graph import ChainGraph, ChainGraphBatch
from .loss import (
    ChainFunction,
    ChainLoss,
    chain_function,
    chain_function_with_aux,
    chain_loss,
    chain_loss_xent,
)
from .graphs.fst import FST
from .ops.viterbi import ViterbiResult, viterbi_align
from .utils.diagnostics import (
    check_result,
    get_verbose_level,
    set_verbose_level,
)

__version__ = "0.1.0"

__all__ = [
    "ChainGraph",
    "ChainGraphBatch",
    "ChainFunction",
    "ChainLoss",
    "chain_function",
    "chain_function_with_aux",
    "chain_loss",
    "chain_loss_xent",
    "FST",
    "ViterbiResult",
    "viterbi_align",
    "check_result",
    "set_verbose_level",
    "get_verbose_level",
]

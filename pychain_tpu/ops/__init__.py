from .fwdbwd import (
    GraphArrays,
    FwdBwdResult,
    forward_backward_prob,
    forward_backward_log,
)
from .viterbi import ViterbiResult, viterbi_align

__all__ = [
    "GraphArrays",
    "FwdBwdResult",
    "forward_backward_prob",
    "forward_backward_log",
    "ViterbiResult",
    "viterbi_align",
]

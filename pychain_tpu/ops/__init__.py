from .fwdbwd import (
    GraphArrays,
    FwdBwdResult,
    forward_backward_prob,
    forward_backward_log,
)

__all__ = [
    "GraphArrays",
    "FwdBwdResult",
    "forward_backward_prob",
    "forward_backward_log",
]

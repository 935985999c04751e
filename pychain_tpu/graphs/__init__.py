from .fst import FST, read_ark_sequential, write_ark
from .compiler import CompiledGraph, compile_fst, leaky_probs

__all__ = [
    "FST",
    "read_ark_sequential",
    "write_ark",
    "CompiledGraph",
    "compile_fst",
    "leaky_probs",
]

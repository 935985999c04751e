"""Torch-compatible API shims: the reference's exact PyTorch surface,
backed by this package's JAX/TPU engines.

The reference exposes LF-MMI to consumers as a ``torch.autograd
.Function`` plus an ``nn.Module`` (reference pychain/loss.py:27-87 and
90-105); its consumers (Espresso, pychain_example) are torch training
loops.  This module lets those loops switch to pychain_tpu WITHOUT
rewriting: ``from pychain_tpu.torch_compat import ChainFunction,
ChainLoss`` is the drop-in import, with the same call signatures, the
same semantics (clamp to [-30, 30], fused fwd-bwd caching the
occupation posterior, ``-(num - den) / sum(lengths)``), and graphs
loaded through this package's :class:`~pychain_tpu.ChainGraph` /
:class:`~pychain_tpu.ChainGraphBatch` (whose constructors mirror the
reference's pychain/graph.py).

How it works: ``ChainFunction.forward`` converts the torch input to a
JAX array, runs the jitted fused forward-backward on the default JAX
backend (TPU when available), and caches the posterior gamma as a torch
tensor for the autograd backward — exactly the reference's
"compute gamma in forward, multiply in backward" contract
(reference loss.py:79-87).  Like the reference's backward, the clamp is
applied in the primal only; its derivative is deliberately not applied
to the cotangent.

This shim pays one host<->device round trip per call, so it is the
MIGRATION path, not the speed path: ports should move the training
step to :func:`pychain_tpu.chain_loss` under ``jax.jit`` to reach the
benchmarked throughput.  Unlike the reference, the batch does NOT need
to be sorted by decreasing length (masks replace packed sequences).

torch is imported lazily here and is NOT a dependency of the rest of
the package.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import torch

from .graph import ChainGraph, ChainGraphBatch
from .loss import _chain_objf, _check_shapes, dispatch_arrays

__all__ = ["ChainFunction", "ChainLoss"]


@jax.jit
def _objf_and_gamma(x, lengths, g, leaky_coefficient):
    """Scalar objf + d objf / d x (the occupation posterior gamma) in
    one fused pass through the package's custom_vjp core."""
    return jax.value_and_grad(_chain_objf)(x, lengths, g,
                                           leaky_coefficient)


def _to_jax(t: "torch.Tensor", dtype) -> jax.Array:
    return jnp.asarray(np.ascontiguousarray(t.detach().cpu().numpy()),
                       dtype=dtype)


class ChainFunction(torch.autograd.Function):
    """Drop-in for the reference ``ChainFunction`` (loss.py:27-87).

    ``objf = ChainFunction.apply(input, input_lengths, graphs
    [, leaky_coefficient])`` with a torch ``input`` (B, T, P) and a
    :class:`ChainGraphBatch` — prob-domain (denominator, leaky-HMM) or
    log-domain (numerator) exactly as in the reference.
    """

    @staticmethod
    def forward(ctx, input, input_lengths, graphs,
                leaky_coefficient=1e-5):
        if input.dim() != 3:
            raise ValueError(
                f"input must be (B, T, P), got shape {tuple(input.shape)}")
        g = dispatch_arrays(graphs)
        x = _to_jax(input, jnp.float32)
        _check_shapes(x, graphs, None)
        lengths_np = np.asarray(input_lengths.detach().cpu().numpy()
                                if torch.is_tensor(input_lengths)
                                else input_lengths)
        if lengths_np.size and int(lengths_np.max()) > x.shape[1]:
            raise ValueError(
                f"input_lengths (max {int(lengths_np.max())}) exceed "
                f"the padded frame axis T={x.shape[1]}")
        lengths = jnp.asarray(lengths_np).astype(jnp.int32)
        objf, gamma = _objf_and_gamma(
            x, lengths, g, jnp.asarray(leaky_coefficient, jnp.float32))
        # np.array (not asarray): jax exports read-only buffers, which
        # torch.from_numpy rejects as non-writable
        input_grad = torch.from_numpy(np.array(gamma)).to(
            device=input.device, dtype=input.dtype)
        ctx.save_for_backward(input_grad)
        return torch.tensor(float(objf), dtype=input.dtype,
                            device=input.device)

    @staticmethod
    def backward(ctx, objf_grad):
        # gamma * cotangent — the reference's backward (loss.py:82-87)
        (input_grad,) = ctx.saved_tensors
        return input_grad * objf_grad, None, None, None


class ChainLoss(torch.nn.Module):
    """Drop-in for the reference ``ChainLoss`` (loss.py:90-105):
    ``loss = ChainLoss(den_graph)(x, x_lengths, num_graphs)`` with
    ``objf = -(num_objf - den_objf) [/ sum(x_lengths)]``.

    ``den_graph`` is a prob-domain :class:`ChainGraph`; the denominator
    batch is broadcast (and cached) per batch size, as the reference
    does via ``ChainGraphBatch(den_graph, B)`` (loss.py:99).
    """

    def __init__(self, den_graph: ChainGraph, leaky_coefficient=1e-5,
                 avg=True):
        super().__init__()
        self.den_graph = den_graph
        self.leaky_coefficient = leaky_coefficient
        self.avg = avg
        self._den_batches = {}  # batch_size -> ChainGraphBatch

    def forward(self, x, x_lengths, num_graphs):
        B = x.shape[0]
        if B not in self._den_batches:
            self._den_batches[B] = ChainGraphBatch(self.den_graph, B)
        den_objf = ChainFunction.apply(x, x_lengths, self._den_batches[B],
                                       self.leaky_coefficient)
        num_objf = ChainFunction.apply(x, x_lengths, num_graphs)
        objf = -(num_objf - den_objf)
        if self.avg:
            lens = (x_lengths if torch.is_tensor(x_lengths)
                    else torch.as_tensor(np.asarray(x_lengths)))
            objf = objf / lens.sum()
        return objf

"""Distributed execution over TPU meshes.

The reference is a single-device library (SURVEY.md §2: no
torch.distributed / NCCL / MPI anywhere); multi-GPU was delegated to the
host trainer.  Here distribution is a first-class capability, done the
TPU way: ``jax.sharding.Mesh`` + ``shard_map``/``pjit`` with XLA
collectives over ICI.

Design:

* **Data parallelism** — the natural axis for LF-MMI: shard the batch
  (and per-utterance numerator graphs) over ``dp``; the shared
  denominator graph is replicated.  The scalar objective is ``psum``'d.
* **Model parallelism** — acoustic-model matmuls can additionally shard
  their feature dimension over an ``mp`` axis (see
  ``pychain_tpu.models``); the chain loss itself is batch-parallel.

Everything composes with jit: the loss is a pure function of pytrees, so
``pjit`` with input shardings is enough — no special communication code
in the numerics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..loss import chain_function, graph_arrays
from ..ops.fwdbwd import GraphArrays


def make_mesh(n_dp: int | None = None, n_mp: int = 1,
              devices=None) -> Mesh:
    """A (dp, mp) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_dp is None:
        n_dp = len(devices) // n_mp
    import numpy as np
    dev = np.asarray(devices[: n_dp * n_mp]).reshape(n_dp, n_mp)
    return Mesh(dev, axis_names=("dp", "mp"))


def shard_batch(mesh: Mesh, tree):
    """Place a pytree with leading batch dims onto the dp axis."""
    spec = P("dp")
    return jax.device_put(
        tree, NamedSharding(mesh, spec))


def _graph_pspec(g: GraphArrays):
    """PartitionSpecs for graph arrays: replicated when shared, batch-
    sharded when per-sequence."""
    if g.shared:
        rep = P()
        return GraphArrays(
            fwd_src=rep, fwd_dst=rep, fwd_pdf=rep, fwd_prob=rep,
            bwd_src=rep, bwd_dst=rep, bwd_pdf=rep, bwd_prob=rep,
            initial=rep, final=rep, leaky=None if g.leaky is None else rep,
            shared=True)
    b = P("dp")
    return GraphArrays(
        fwd_src=b, fwd_dst=b, fwd_pdf=b, fwd_prob=b,
        bwd_src=b, bwd_dst=b, bwd_pdf=b, bwd_prob=b,
        initial=b, final=b, leaky=None if g.leaky is None else b,
        shared=False)


def pjit_chain_function(mesh: Mesh, graphs, leaky_coefficient=1e-5):
    """Compile chain_function data-parallel over ``mesh``'s dp axis.

    Returns ``fn(x, lengths) -> objf`` where x (B, T, P) and lengths (B,)
    are sharded over dp and objf is the fully-reduced scalar.  B must be
    divisible by the dp axis size.
    """
    g = graphs if isinstance(graphs, GraphArrays) else graph_arrays(graphs)
    gspec = _graph_pspec(g)

    @partial(jax.jit,
             in_shardings=(NamedSharding(mesh, P("dp")),
                           NamedSharding(mesh, P("dp")),
                           jax.tree.map(lambda s: NamedSharding(mesh, s),
                                        gspec,
                                        is_leaf=lambda v: isinstance(v, P))),
             out_shardings=NamedSharding(mesh, P()))
    def fn(x, lengths, g):
        return chain_function(x, lengths, g, leaky_coefficient)

    return partial(fn, g=g)


class ShardedChainLoss:
    """Data-parallel ChainLoss: same objective as
    :class:`pychain_tpu.ChainLoss`, computed over a device mesh.

    Numerator graph batches must be constructed per-call (they differ per
    minibatch); the denominator broadcast is replicated once.
    """

    def __init__(self, mesh: Mesh, den_graph, leaky_coefficient=1e-5,
                 avg=True):
        from ..graph import ChainGraphBatch
        self.mesh = mesh
        self.den_graph = den_graph
        self.leaky_coefficient = leaky_coefficient
        self.avg = avg
        self._den_cache = {}
        self._ChainGraphBatch = ChainGraphBatch

    def __call__(self, x, x_lengths, num_graphs):
        B = x.shape[0]
        if B not in self._den_cache:
            self._den_cache[B] = self._ChainGraphBatch(self.den_graph, B)
        den = graph_arrays(self._den_cache[B])
        num = (num_graphs if isinstance(num_graphs, GraphArrays)
               else graph_arrays(num_graphs))

        mesh = self.mesh

        @partial(jax.jit, static_argnames=())
        def loss_fn(x, lengths, den_g, num_g):
            den_objf = chain_function(x, lengths, den_g,
                                      self.leaky_coefficient)
            num_objf = chain_function(x, lengths, num_g)
            objf = -(num_objf - den_objf)
            if self.avg:
                objf = objf / lengths.sum()
            return objf

        with mesh:
            x = jax.device_put(x, NamedSharding(mesh, P("dp")))
            lengths = jax.device_put(jnp.asarray(x_lengths),
                                     NamedSharding(mesh, P("dp")))
            return loss_fn(x, lengths, den, num)

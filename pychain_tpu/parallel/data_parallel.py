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
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..loss import chain_function, dispatch_arrays
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


def engine_pspec(g) -> P:
    """PartitionSpec (tree prefix) for dispatched engine arrays.

    Shared graphs (the factorized/Pallas denominator, or a broadcast
    GraphArrays) replicate; every per-sequence engine — gather-form
    GraphArrays with ``shared=False``, and the Linear / Leveled /
    Semiring numerator engines, whose leaves are ALL batch-leading —
    shards its leading (batch) dim over dp."""
    from ..ops.factorized import FactorizedArrays
    if isinstance(g, FactorizedArrays):
        return P()
    if isinstance(g, GraphArrays):
        return P() if g.shared else P("dp")
    return P("dp")


def pjit_chain_function(mesh: Mesh, graphs, leaky_coefficient=1e-5,
                        impl: str = "auto"):
    """Compile chain_function data-parallel over ``mesh``'s dp axis.

    Returns ``fn(x, lengths) -> objf`` where x (B, T, P) and lengths (B,)
    are sharded over dp and objf is the fully-reduced scalar.  B must be
    divisible by the dp axis size.

    Each device runs the full single-device engine (selected by
    ``impl`` via :func:`pychain_tpu.loss.dispatch_arrays` — factorized /
    Pallas for a shared denominator) on its local batch shard via
    ``shard_map``; only the scalar objective crosses ICI (one psum).
    """
    g = dispatch_arrays(graphs, impl)
    gspec = engine_pspec(g)

    def local_fn(x, lengths, g):
        objf = chain_function(x, lengths, g, leaky_coefficient)
        return jax.lax.psum(objf, "dp")

    # check_vma off: the engines seed scan carries from the replicated
    # graph arrays, which the varying-axis checker flags when combined
    # with dp-sharded activations; the math is shard-local by design.
    fn = jax.jit(shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("dp"), P("dp"), gspec),
        out_specs=P(), check_vma=False))
    return lambda x, lengths: fn(x, lengths, g)


class ShardedChainLoss:
    """Data-parallel ChainLoss: same objective as
    :class:`pychain_tpu.ChainLoss`, computed over a device mesh.

    Numerator graph batches must be constructed per-call (they differ per
    minibatch); the denominator broadcast is replicated once and is
    dispatched through the fast engines (``impl`` as in
    :func:`pychain_tpu.loss.dispatch_arrays`: factorized MXU by default,
    ``"pallas"`` for the fused-kernel fast mode).

    The loss runs as one jitted ``shard_map`` over the mesh's dp axis:
    every device executes the single-device engines on its local batch
    shard and the scalar objective is ``psum``'d over ICI.  The mapped
    function is built ONCE (per numerator engine structure); repeated
    steps with the same bucket shapes hit the jit cache.
    """

    def __init__(self, mesh: Mesh, den_graph, leaky_coefficient=1e-5,
                 avg=True, impl: str = "auto", tile_dtype=None,
                 xent_regularize=0.0, l2_regularize=0.0):
        from ..graph import ChainGraphBatch
        self.mesh = mesh
        self.den_graph = den_graph
        self.leaky_coefficient = leaky_coefficient
        self.avg = avg
        self.impl = impl
        # recipe regularizers (see loss.chain_loss_xent): when
        # xent_regularize > 0, __call__ takes the xent head's output
        self.xent_regularize = float(xent_regularize)
        self.l2_regularize = float(l2_regularize)
        # tile_dtype="bfloat16" + impl="pallas": the per-chip fast mode
        # (see ChainLoss) — without it the sharded path silently runs
        # the f32 parity kernels at roughly half the throughput.
        self.tile_dtype = tile_dtype
        self._den_cache = {}
        self._ChainGraphBatch = ChainGraphBatch
        # jitted shard_map per numerator spec (a shared numerator batch
        # replicates; per-sequence engines shard over dp): one entry per
        # distinct spec, so repeated steps still hit the jit cache
        self._fn_cache = {}

    def _build(self, num_spec):
        leaky_coefficient = self.leaky_coefficient
        avg = self.avg
        xent_reg = self.xent_regularize
        l2_reg = self.l2_regularize

        def _terms(x, lengths, den_g, num_g, xent_out):
            from ..loss import chain_function_with_aux
            den_objf = chain_function(x, lengths, den_g,
                                      leaky_coefficient)
            if xent_reg > 0.0:
                num_objf, aux = chain_function_with_aux(x, lengths, num_g)
                gamma = jax.lax.stop_gradient(aux.gamma)
                logp = jax.nn.log_softmax(xent_out, axis=-1)
                extra = -xent_reg * jnp.sum(gamma * logp)
            else:
                num_objf = chain_function(x, lengths, num_g)
                extra = jnp.zeros((), x.dtype)
            if l2_reg > 0.0:
                T = x.shape[1]
                mask = jnp.arange(T)[None, :] < lengths[:, None]
                extra += l2_reg * 0.5 * jnp.sum(
                    jnp.square(x) * mask[:, :, None])
            objf = jax.lax.psum(-(num_objf - den_objf) + extra, "dp")
            if avg:
                objf = objf / jax.lax.psum(lengths.sum(), "dp")
            return objf

        if xent_reg > 0.0:
            def local_loss(x, lengths, den_g, num_g, xent_out):
                return _terms(x, lengths, den_g, num_g, xent_out)
            in_specs = (P("dp"), P("dp"), P(), num_spec, P("dp"))
        else:
            def local_loss(x, lengths, den_g, num_g):
                return _terms(x, lengths, den_g, num_g, None)
            in_specs = (P("dp"), P("dp"), P(), num_spec)

        # check_vma off: see pjit_chain_function.
        return jax.jit(shard_map(
            local_loss, mesh=self.mesh,
            in_specs=in_specs, out_specs=P(), check_vma=False))

    def den_arrays(self, batch_size: int):
        """Engine arrays for the denominator broadcast to the PER-DEVICE
        batch size (the graph is shared, so the device-local batch is
        what the engine sees under shard_map)."""
        if batch_size not in self._den_cache:
            # Built from host constants and cached: must never capture
            # tracers if the first call happens under a caller's jit
            # (same hazard as ChainLoss.den_batch).
            with jax.ensure_compile_time_eval():
                self._den_cache[batch_size] = dispatch_arrays(
                    self._ChainGraphBatch(self.den_graph, batch_size,
                                          tile_dtype=self.tile_dtype),
                    self.impl)
        return self._den_cache[batch_size]

    def __call__(self, x, x_lengths, num_graphs, xent_out=None):
        B = x.shape[0]
        n_dp = self.mesh.shape["dp"]
        if B % n_dp != 0:
            raise ValueError(
                f"batch size {B} not divisible by dp axis size {n_dp}")
        if (xent_out is None) == (self.xent_regularize > 0.0):
            raise ValueError(
                "pass xent_out exactly when xent_regularize > 0 "
                f"(xent_regularize={self.xent_regularize}, "
                f"xent_out={'set' if xent_out is not None else 'None'})")
        den = self.den_arrays(B // n_dp)
        num = dispatch_arrays(num_graphs, "auto")
        num_spec = engine_pspec(num)
        if num_spec not in self._fn_cache:
            self._fn_cache[num_spec] = self._build(num_spec)
        fn = self._fn_cache[num_spec]
        if xent_out is None:
            return fn(x, jnp.asarray(x_lengths), den, num)
        return fn(x, jnp.asarray(x_lengths), den, num, xent_out)

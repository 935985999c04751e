"""One-hot semiring engine (arbitrary log-domain graphs) vs gather.

The semiring engine (ops/semiring.py) must reproduce the generic
gather engine exactly (same recurrences, f32/HIGHEST contraction) on
any cyclic / self-loop / DAG supervision — the graph class the linear
and leveled engines reject.  Mirrors the reference's capability of
running arbitrary graphs through its log-domain CUDA kernels
(chain-log-domain-kernels.cu:86-235).
"""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.graphs.fst import FST
from pychain_tpu.loss import chain_function, chain_function_with_aux, \
    dispatch_arrays
from pychain_tpu.ops.semiring import SemiringArrays
from pychain_tpu.utils.testgraphs import random_fst


def _cyclic_batch(B=4, P=6, seed=0):
    graphs = [ChainGraph(random_fst(num_states=5 + b, num_pdfs=P,
                                    seed=seed * 100 + b), log_domain=True)
              for b in range(B)]
    return ChainGraphBatch(
        graphs, max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))


def _selfloop_fst(P=4):
    """Two states with self-loops — the classic HMM topology the
    leveled engine cannot represent."""
    arcs = [(0, 0, 1, 1, 0.7), (0, 1, 2, 2, 0.7),
            (1, 1, 3, 3, 0.4), (1, 0, 4, 4, 1.2)]
    return FST.from_arcs(2, 0, arcs, {1: 0.2, 0: 1.0})


def test_semiring_auto_dispatch_for_cyclic_batches():
    batch = _cyclic_batch()
    assert batch._semiring is not None
    assert isinstance(dispatch_arrays(batch, "auto"), SemiringArrays)
    assert isinstance(dispatch_arrays(batch, "semiring"), SemiringArrays)


def test_semiring_matches_gather_cyclic():
    rng = np.random.RandomState(0)
    B, T, P = 4, 11, 6
    batch = _cyclic_batch(B, P)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([11, 8, 5, 2], np.int32)

    _, rg = chain_function_with_aux(x, lengths, batch, impl="gather")
    _, rs = chain_function_with_aux(x, lengths, batch, impl="semiring")
    np.testing.assert_allclose(np.asarray(rs.objf), np.asarray(rg.objf),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rs.gamma), np.asarray(rg.gamma),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rs.alpha_beta)[:, :2],
                               np.asarray(rg.alpha_beta)[:, :2],
                               rtol=1e-4)
    assert np.all(np.asarray(rs.ok))


def test_semiring_matches_gather_selfloops():
    rng = np.random.RandomState(1)
    B, T, P = 3, 9, 4
    graphs = [ChainGraph(_selfloop_fst(P), log_domain=True)
              for _ in range(B)]
    batch = ChainGraphBatch(graphs, max_num_transitions=4,
                            max_num_states=2)
    assert batch._linear is None and batch._leveled is None
    assert batch._semiring is not None
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([9, 6, 1], np.int32)
    _, rg = chain_function_with_aux(x, lengths, batch, impl="gather")
    _, rs = chain_function_with_aux(x, lengths, batch, impl="semiring")
    np.testing.assert_allclose(np.asarray(rs.objf), np.asarray(rg.objf),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rs.gamma), np.asarray(rg.gamma),
                               rtol=1e-4, atol=1e-6)


def test_semiring_gradient_matches_gather():
    rng = np.random.RandomState(2)
    B, T, P = 4, 8, 6
    batch = _cyclic_batch(B, P, seed=2)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = jnp.array([8, 7, 4, 2], jnp.int32)
    g_g = jax.grad(lambda xx: chain_function(xx, lengths, batch,
                                             impl="gather"))(x)
    g_s = jax.grad(lambda xx: chain_function(xx, lengths, batch,
                                             impl="semiring"))(x)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_g),
                               rtol=1e-4, atol=1e-6)


def test_semiring_pallas_matches_xla():
    """The fused-kernel variant (interpret mode on CPU) reproduces the
    XLA scan to f32 noise, including masking and invariants."""
    rng = np.random.RandomState(4)
    B, T, P = 4, 10, 6
    batch = _cyclic_batch(B, P, seed=4)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([10, 7, 4, 1], np.int32)
    _, rs = chain_function_with_aux(x, lengths, batch, impl="semiring")
    _, rp = chain_function_with_aux(x, lengths, batch,
                                    impl="semiring_pallas")
    np.testing.assert_allclose(np.asarray(rp.objf), np.asarray(rs.objf),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rp.gamma), np.asarray(rs.gamma),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rp.alpha_beta),
                               np.asarray(rs.alpha_beta),
                               rtol=1e-4, atol=1e-6)
    g_s = jax.grad(lambda xx: chain_function(xx, lengths, batch,
                                             impl="semiring"))(x)
    g_p = jax.grad(lambda xx: chain_function(xx, lengths, batch,
                                             impl="semiring_pallas"))(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_s),
                               rtol=1e-4, atol=1e-6)


def test_semiring_budget_fallback(monkeypatch):
    """Batches beyond the one-hot budget fall back to gather silently."""
    import pychain_tpu.ops.semiring as sr
    monkeypatch.setattr(sr, "ONEHOT_BUDGET", 8)  # force over budget
    batch = _cyclic_batch()
    assert batch._semiring is None
    from pychain_tpu.ops.fwdbwd import GraphArrays
    assert isinstance(dispatch_arrays(batch, "auto"), GraphArrays)
    with pytest.raises(ValueError, match="semiring"):
        dispatch_arrays(batch, "semiring")


_TPU_SNIPPET = r"""
import sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() not in ("cpu",), jax.default_backend()
from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.loss import chain_function_with_aux, dispatch_arrays
from pychain_tpu.ops.semiring import SemiringArrays
from pychain_tpu.utils.testgraphs import random_fst

rng = np.random.RandomState(0)
B, T, P = 16, 40, 8
graphs = [ChainGraph(random_fst(num_states=10 + b % 5, num_pdfs=P,
                                seed=b), log_domain=True)
          for b in range(B)]
batch = ChainGraphBatch(
    graphs, max_num_transitions=max(g.num_transitions for g in graphs),
    max_num_states=max(g.num_states for g in graphs))
x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
lengths = np.linspace(T, T // 3, B).astype(np.int32)

# on a TPU backend "auto" must resolve to the fused kernels
g_auto = dispatch_arrays(batch, "auto")
assert isinstance(g_auto, SemiringArrays) and g_auto.engine == "pallas", \
    (type(g_auto), getattr(g_auto, "engine", None))

_, ref = chain_function_with_aux(x, lengths, batch, impl="semiring")
_, got = chain_function_with_aux(x, lengths, batch,
                                 impl="semiring_pallas")
# budget: the two engines compute the same reals along different f32
# routes (sum-normalised vs max-shifted scales, per-step kernel
# exp/log vs XLA logsumexp); measured divergence at T=40 is ~3e-4
# absolute on objf, ~6e-4 on gamma — budget 5x headroom
np.testing.assert_allclose(np.asarray(got.objf), np.asarray(ref.objf),
                           rtol=1e-4, atol=2e-3)
np.testing.assert_allclose(np.asarray(got.gamma), np.asarray(ref.gamma),
                           rtol=1e-2, atol=3e-3)
assert np.all(np.asarray(got.ok))

# the kernels must also compose with shard_map (ShardedChainLoss
# dispatches numerators via "auto", which selects them on TPU)
from pychain_tpu.parallel import ShardedChainLoss, make_mesh
from pychain_tpu.utils.testgraphs import denominator_fst
den_fst, dP = denominator_fst(num_phones=4, states_per_phone=2, seed=1)
assert dP <= P
den = ChainGraph(den_fst, log_domain=False)
sharded = ShardedChainLoss(make_mesh(1, 1), den)
loss = sharded(x, jnp.asarray(lengths), batch)
assert np.isfinite(float(loss)), loss
print("TPU-SEMIRING-PARITY-OK")
"""


@pytest.mark.skipif("PALLAS_AXON_POOL_IPS" not in os.environ,
                    reason="needs the real TPU tunnel")
def test_semiring_pallas_on_tpu_hardware():
    """Compile the real (non-interpreted) select-free kernels on the
    chip and check parity vs the XLA scan, plus the auto-dispatch
    preference for the kernels on a TPU backend."""
    from _tunnel import tpu_tunnel_alive
    if not tpu_tunnel_alive():
        pytest.skip("TPU tunnel env is set but the backend is unreachable")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", _TPU_SNIPPET.format(repo=repo)],
        capture_output=True, text=True, timeout=1500, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "TPU-SEMIRING-PARITY-OK" in proc.stdout


def test_semiring_infeasible_length():
    """A graph with no path of the requested length: objf=-inf, ok=False
    (matching the gather engine)."""
    rng = np.random.RandomState(3)
    P = 4
    # pure 3-arc chain, no cycles: only length 3 is feasible; add a
    # dead-end branch so the graph is not linear/leveled
    arcs = [(0, 1, 1, 1, 0.5), (1, 2, 2, 2, 0.5), (2, 3, 3, 3, 0.5),
            (1, 3, 4, 4, 0.5)]
    g = ChainGraph(FST.from_arcs(4, 0, arcs, {3: 0.0}), log_domain=True)
    batch = ChainGraphBatch([g, g], max_num_transitions=4,
                            max_num_states=4)
    assert batch._semiring is not None
    x = jnp.asarray(rng.randn(2, 5, P).astype(np.float32))
    lengths = np.array([3, 5], np.int32)
    _, rs = chain_function_with_aux(x, lengths, batch, impl="semiring")
    _, rg = chain_function_with_aux(x, lengths, batch, impl="gather")
    assert np.isfinite(rs.objf[0]) and np.isneginf(rs.objf[1])
    np.testing.assert_allclose(np.asarray(rs.objf)[0],
                               np.asarray(rg.objf)[0], rtol=1e-5)
    assert bool(rs.ok[0]) and not bool(rs.ok[1])

"""Factorized-log path: shared log-domain graphs on the factorized /
Pallas engines in normalized-linear form (round 4).

A SHARED cyclic log-domain graph (broadcast ChainGraphBatch) is the
same transition matrix with log weights: exp'd (exact for hard zeros)
it runs through the flagship factorized machinery with
``log_semantics`` — leaky forced to 0 (graph.py:54-59 — no leaky HMM
in log domain, ref graph.py:54-59) and infeasible sequences guarded
back to the log-engine contract (objf=-inf, gamma=0, ok=False).
Measured on chip: 1913 utts/s = 27.3x over the gather engine at
B=32 T=150 S=3000 K=50k, objf rel diff 2.3e-06 (the class the
reference serves with per-arc CUDA threads,
chain-log-domain-kernels.cu:86-235).  The dense streamed-XL masks
measured 0.2x gather on the same config: O(S*K) dense work is the
wrong algorithm for a shared graph, so auto prefers this path.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.loss import (chain_function, chain_function_with_aux,
                              dispatch_arrays)
from pychain_tpu.ops.factorized import FactorizedArrays
from pychain_tpu.utils.testgraphs import linear_fst, random_fst


def _shared_batch(B=3, S=9, P=6, seed=5):
    g = ChainGraph(random_fst(num_states=S, num_pdfs=P, seed=seed),
                   log_domain=True)
    return ChainGraphBatch(g, B)


def test_broadcast_log_builds_fact():
    batch = _shared_batch()
    assert isinstance(batch._fact, FactorizedArrays)
    assert batch._fact.log_semantics


def test_factorized_log_matches_gather():
    rng = np.random.RandomState(0)
    B, T, P = 3, 8, 6
    batch = _shared_batch(B, P=P)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([8, 5, 3], np.int32)
    _, rg = chain_function_with_aux(x, lengths, batch, impl="gather")
    _, rf = chain_function_with_aux(x, lengths, batch, impl="factorized")
    np.testing.assert_allclose(np.asarray(rf.objf), np.asarray(rg.objf),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rf.gamma), np.asarray(rg.gamma),
                               rtol=1e-4, atol=1e-6)
    assert np.all(np.asarray(rf.ok))
    gg = jax.grad(lambda v: chain_function(v, lengths, batch,
                                           impl="gather"))(x)
    gf = jax.grad(lambda v: chain_function(v, lengths, batch,
                                           impl="factorized"))(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gg),
                               rtol=1e-4, atol=1e-6)


def test_factorized_log_pallas_tiers_match(monkeypatch):
    """The resident- and stream-Pallas tiers (interpret mode on CPU)
    agree with the XLA factorized engine on a shared log-domain
    batch."""
    from pychain_tpu.utils.testgraphs import denominator_fst
    rng = np.random.RandomState(1)
    B, T = 2, 6
    fst, P = denominator_fst(num_phones=6, states_per_phone=2, seed=1)
    batch = ChainGraphBatch(ChainGraph(fst, log_domain=True), B)
    fa = batch._fact
    from pychain_tpu.ops.pallas_fact import supports
    assert supports(fa), "denominator topology must fully factorize"
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([6, 4], np.int32)
    _, ref = chain_function_with_aux(x, lengths, batch, impl="factorized")
    for engine in ("pallas", "stream"):
        if engine == "stream" and int(fa.w1.tiles.shape[0]) == 0:
            continue            # nothing to stream at this size
        ge = dataclasses.replace(fa, engine=engine)
        _, got = chain_function_with_aux(x, lengths, ge)
        np.testing.assert_allclose(np.asarray(got.objf),
                                   np.asarray(ref.objf),
                                   rtol=1e-5, atol=1e-6, err_msg=engine)
        np.testing.assert_allclose(np.asarray(got.gamma),
                                   np.asarray(ref.gamma),
                                   rtol=1e-4, atol=1e-6, err_msg=engine)


def test_leaky_is_forced_to_zero():
    """chain_function(leaky_coefficient=big) must not change log-domain
    results — the gather log engine ignores leaky, and the factorized
    path must too (log_semantics forces 0)."""
    rng = np.random.RandomState(2)
    B, T, P = 2, 6, 6
    batch = _shared_batch(B, P=P, seed=9)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([6, 6], np.int32)
    a = chain_function(x, lengths, batch, leaky_coefficient=0.3,
                       impl="factorized")
    b = chain_function(x, lengths, batch, leaky_coefficient=1e-5,
                       impl="factorized")
    g = chain_function(x, lengths, batch, leaky_coefficient=0.3,
                       impl="gather")
    np.testing.assert_allclose(float(a), float(b), rtol=1e-7)
    np.testing.assert_allclose(float(a), float(g), rtol=1e-5)


def test_infeasible_contract():
    """Dead sequences come back as objf=-inf, gamma=0, ok=False with
    finite gradients — matching forward_backward_log, not the
    NaN/inf of a raw prob-domain division by tot_prob=0."""
    rng = np.random.RandomState(3)
    P = 5
    lin = ChainGraph(linear_fst([1, 2, 3, 4, 0, 2]), log_domain=True)
    batch = ChainGraphBatch(lin, 2)
    x = jnp.asarray(rng.randn(2, 8, P).astype(np.float32))
    lengths = np.array([6, 4], np.int32)          # row 1 infeasible
    _, rf = chain_function_with_aux(x, lengths, batch, impl="factorized")
    _, rg = chain_function_with_aux(x, lengths, batch, impl="gather")
    assert np.asarray(rf.objf)[1] == -np.inf
    assert not np.asarray(rf.ok)[1] and np.asarray(rf.ok)[0]
    assert float(jnp.max(jnp.abs(rf.gamma[1]))) == 0.0
    np.testing.assert_allclose(np.asarray(rf.objf)[0],
                               np.asarray(rg.objf)[0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rf.gamma[0]),
                               np.asarray(rg.gamma[0]),
                               rtol=1e-4, atol=1e-6)
    gf = jax.grad(lambda v: chain_function(v, lengths, batch,
                                           impl="factorized"))(x)
    assert bool(jnp.all(jnp.isfinite(gf)))


def test_auto_dispatch_prefers_fact_beyond_dense(monkeypatch):
    """Beyond the dense one-hot budget, auto serves a shared log-domain
    batch through the factorized engines (XLA off-TPU; the Pallas tiers
    on a TPU backend) instead of the XL/gather ladder."""
    import pychain_tpu.loss as loss_mod
    import pychain_tpu.ops.semiring as sr
    monkeypatch.setattr(sr, "ONEHOT_BUDGET", 1)
    batch = _shared_batch()
    g = dispatch_arrays(batch, "auto")
    assert isinstance(g, FactorizedArrays) and g.log_semantics
    assert g.engine == "xla"
    monkeypatch.setattr(loss_mod.jax, "default_backend", lambda: "tpu")
    from pychain_tpu.ops.pallas_fact import supports
    if supports(batch._fact):
        g = dispatch_arrays(batch, "auto")
        assert g.engine in ("pallas", "stream")
        assert g.log_semantics


def test_factorized_log_preferred_for_broadcast():
    """Shared (broadcast) cyclic log-domain batches dispatch to the
    factorized-log engine at every size — the dense one-hot semiring
    arrays are not even built for them (round 5, ADVICE r4: they were
    B duplicated copies of one graph, and the factorized path is the
    measured fast engine for shared graphs).  List batches keep the
    semiring engine (test_semiring.py)."""
    batch = _shared_batch()
    assert batch._semiring is None
    g = dispatch_arrays(batch, "auto")
    assert isinstance(g, FactorizedArrays) and g.log_semantics


def test_semiring_pallas_supports_prices_lane_padding():
    """Regression for the round-4 OOM: the one-hot (K, S, bt) blocks
    pad the minor batch dim to 128 lanes, so a SMALL batch on a large
    graph must be rejected by supports() (B=4 K=1320 S=80 compiled to
    154 MB of VMEM against the 48 MB plan before this fix)."""
    from pychain_tpu.ops.pallas_semiring import supports

    class _G:
        src_oh = np.zeros((4, 1320, 80), np.float32)
    assert not supports(_G())

    class _G2:
        src_oh = np.zeros((128, 150, 48), np.float32)
    assert supports(_G2())

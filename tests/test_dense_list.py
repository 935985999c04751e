"""Dense-batched prob-domain LIST engine (ops/dense_list.py).

Parity oracle is the gather spec engine (ops/fwdbwd.forward_backward_prob,
the reference recurrences chain-computation.h:109-155) on the same
per-sequence graph batches — the reference capability being matched is
batched per-sequence prob-domain kernels (chain-kernels.cu:112-169).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.loss import (chain_function, chain_function_with_aux,
                              dispatch_arrays)
from pychain_tpu.ops.dense_list import (DenseListArrays,
                                        dense_list_arrays,
                                        fits_dense_list)
from pychain_tpu.utils.testgraphs import denominator_fst, random_fst


def _list_batch(B=3, phones=6, seed=0):
    """Per-sequence denominator-style graphs with DIFFERENT topologies
    (phone counts vary per row) — unequal S and K across the batch."""
    graphs = []
    for i in range(B):
        fst, p = denominator_fst(num_phones=phones + i,
                                 states_per_phone=2, seed=seed + i)
        graphs.append(ChainGraph(fst, log_domain=False))
    max_k = max(g.num_transitions for g in graphs)
    max_s = max(g.num_states for g in graphs)
    P = max(g.num_pdfs for g in graphs)
    return ChainGraphBatch(graphs, max_num_transitions=max_k,
                           max_num_states=max_s), P


def _assert_parity(x, lengths, batch, rtol=1e-4):
    _, res_d = chain_function_with_aux(x, lengths, batch,
                                       impl="dense_list")
    _, res_g = chain_function_with_aux(x, lengths, batch, impl="gather")
    np.testing.assert_allclose(np.asarray(res_d.objf),
                               np.asarray(res_g.objf), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res_d.gamma),
                               np.asarray(res_g.gamma), rtol=rtol,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_d.gamma_sum),
                               np.asarray(res_g.gamma_sum), rtol=rtol,
                               atol=1e-6)
    assert np.all(np.asarray(res_d.ok))


def test_dense_list_matches_gather():
    rng = np.random.RandomState(0)
    batch, P = _list_batch(B=3, phones=6, seed=0)
    T = 12
    lengths = np.array([12, 9, 4], np.int32)
    x = jnp.asarray(rng.randn(3, T, P).astype(np.float32))
    _assert_parity(x, lengths, batch)


def test_dense_list_residual_arcs():
    """Random ergodic graphs don't fully pdf-attach; the batched
    residual gather/scatter path must pick up the leftovers."""
    rng = np.random.RandomState(2)
    P = 6
    graphs = [ChainGraph(random_fst(num_states=7 + i, num_pdfs=P,
                                    max_arcs_per_state=4, seed=3 + i),
                         log_domain=False)
              for i in range(3)]
    da = dense_list_arrays(graphs)
    assert da.res_prob.shape[1] > 0  # the batch genuinely has residuals
    batch = ChainGraphBatch(
        graphs,
        max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))
    T = 8
    lengths = np.array([8, 6, 3], np.int32)
    x = jnp.asarray(rng.randn(3, T, P).astype(np.float32))
    _assert_parity(x, lengths, batch)


def test_dense_list_gradient_matches_gather():
    rng = np.random.RandomState(1)
    batch, P = _list_batch(B=2, phones=5, seed=4)
    T = 10
    lengths = np.array([10, 7], np.int32)
    x = jnp.asarray(rng.randn(2, T, P).astype(np.float32))
    import jax
    gd = jax.grad(lambda v: chain_function(v, lengths, batch,
                                           impl="dense_list").sum())(x)
    gg = jax.grad(lambda v: chain_function(v, lengths, batch,
                                           impl="gather").sum())(x)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(gg),
                               rtol=1e-4, atol=1e-6)


def test_dense_list_dispatch_and_cache():
    batch, P = _list_batch(B=2, phones=4, seed=7)
    assert batch._dense_list is None  # lazy: not built at construction
    arrs = dispatch_arrays(batch, "dense_list")
    assert isinstance(arrs, DenseListArrays)
    assert batch._dense_list is arrs  # cached for repeat dispatches
    # on CPU, auto keeps the gather scan (dense O(S^2) loses there);
    # the cached engine is still returned when already built
    arrs2 = dispatch_arrays(batch, "auto")
    assert arrs2 is arrs


def test_dense_list_budget_gate():
    assert fits_dense_list(8, 2000)
    assert not fits_dense_list(128, 20000)
    # forced impl on an over-budget batch must raise, not OOM
    batch, P = _list_batch(B=2, phones=4, seed=9)
    import os
    os.environ["PYCHAIN_DENSE_LIST_BUDGET"] = "1024"
    try:
        with pytest.raises(ValueError, match="dense_list"):
            dispatch_arrays(
                ChainGraphBatch(batch._graphs,
                                max_num_transitions=batch.num_transitions,
                                max_num_states=batch.num_states),
                "dense_list")
    finally:
        del os.environ["PYCHAIN_DENSE_LIST_BUDGET"]


def test_dense_list_reorder_keeps_pairing():
    rng = np.random.RandomState(3)
    batch, P = _list_batch(B=3, phones=5, seed=11)
    T = 9
    lengths = np.array([9, 6, 5], np.int32)
    x = jnp.asarray(rng.randn(3, T, P).astype(np.float32))
    dispatch_arrays(batch, "dense_list")  # build + cache pre-reorder
    order = [2, 0, 1]
    batch.reorder(order)
    loss_r = chain_function(x, lengths, batch, impl="dense_list")
    # oracle: a fresh batch built in the permuted order
    fresh = ChainGraphBatch([batch._graphs[i] for i in range(3)],
                            max_num_transitions=batch.num_transitions,
                            max_num_states=batch.num_states)
    loss_f = chain_function(x, lengths, fresh, impl="dense_list")
    np.testing.assert_allclose(np.asarray(loss_r), np.asarray(loss_f),
                               rtol=1e-5)

"""Closed-form linear numerator path vs the generic log-domain engine."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.loss import chain_function, chain_function_with_aux
from pychain_tpu.ops.linear import is_linear_graph
from pychain_tpu.utils.testgraphs import linear_fst, random_fst


def _batch(graphs, max_k=None, max_s=None):
    max_k = max_k or max(g.num_transitions for g in graphs)
    max_s = max_s or max(g.num_states for g in graphs)
    return ChainGraphBatch(graphs, max_num_transitions=max_k,
                           max_num_states=max_s)


def test_linear_detection():
    g = ChainGraph(linear_fst([0, 1, 2]), log_domain=True)
    assert is_linear_graph(g)
    r = ChainGraph(random_fst(num_states=5, num_pdfs=4, seed=0),
                   log_domain=True)
    assert not is_linear_graph(r)
    batch = _batch([g, g])
    assert batch._linear is not None
    mixed = _batch([g, r])
    assert mixed._linear is None  # falls back to the generic engine


def test_linear_matches_generic():
    rng = np.random.RandomState(0)
    B, T, P = 4, 9, 6
    # different chain lengths; sequence lengths match the chains
    chains = [9, 7, 5, 9]
    graphs = [ChainGraph(linear_fst(rng.randint(0, P, size=n)),
                         log_domain=True) for n in chains]
    lengths = np.array(chains, np.int32)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    batch = _batch(graphs)
    assert batch._linear is not None

    _, lin = chain_function_with_aux(x, lengths, batch, impl="linear")
    _, gen = chain_function_with_aux(x, lengths, batch, impl="gather")
    np.testing.assert_allclose(np.asarray(lin.objf), np.asarray(gen.objf),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lin.gamma),
                               np.asarray(gen.gamma), rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(lin.ok))


def test_linear_infeasible_length():
    """A linear chain only accepts sequences of its exact length."""
    rng = np.random.RandomState(1)
    P = 5
    g = ChainGraph(linear_fst(rng.randint(0, P, size=6)), log_domain=True)
    batch = _batch([g, g])
    x = jnp.asarray(rng.randn(2, 8, P).astype(np.float32))
    lengths = np.array([6, 8], np.int32)  # second one infeasible
    _, res = chain_function_with_aux(x, lengths, batch, impl="linear")
    assert np.isfinite(res.objf[0])
    assert np.isneginf(res.objf[1])
    assert not bool(res.ok[1]) and bool(res.ok[0])
    assert np.all(np.asarray(res.gamma)[1] == 0.0)


def test_linear_gradient():
    rng = np.random.RandomState(2)
    P = 4
    g = ChainGraph(linear_fst(rng.randint(0, P, size=5)), log_domain=True)
    batch = _batch([g])
    x = jnp.asarray(rng.randn(1, 5, P).astype(np.float32))
    lengths = jnp.array([5], jnp.int32)
    grad = jax.grad(lambda xx: chain_function(xx, lengths, batch,
                                              impl="linear"))(x)
    grad_gen = jax.grad(lambda xx: chain_function(xx, lengths, batch,
                                                  impl="gather"))(x)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(grad_gen),
                               rtol=1e-5, atol=1e-6)

"""Leveled (time-synchronous sausage) engine vs the generic engine."""

import numpy as np
import jax
import jax.numpy as jnp

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.loss import chain_function, chain_function_with_aux
from pychain_tpu.ops.leveled import is_leveled_graph
from pychain_tpu.utils import oracle
from pychain_tpu.utils.testgraphs import linear_fst, random_fst, sausage_fst


def _batch(graphs):
    return ChainGraphBatch(
        graphs, max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))


def _sausage(rng, T, P, max_w=3, seed=0):
    alts = [list(rng.choice(P, size=rng.randint(1, max_w + 1),
                            replace=False)) for _ in range(T)]
    return ChainGraph(sausage_fst(alts, seed=seed), log_domain=True)


def test_leveled_detection():
    rng = np.random.RandomState(0)
    g = _sausage(rng, 6, 8)
    assert is_leveled_graph(g)
    r = ChainGraph(random_fst(num_states=5, num_pdfs=4, seed=0),
                   log_domain=True)
    assert not is_leveled_graph(r)  # has self-loops / cycles
    batch = _batch([g, g])
    assert batch._leveled is not None and batch._linear is None


def test_leveled_matches_generic_and_oracle():
    rng = np.random.RandomState(1)
    B, T, P = 4, 8, 6
    graphs = [_sausage(rng, n, P, seed=10 + i)
              for i, n in enumerate([8, 6, 8, 5])]
    lengths = np.array([8, 6, 8, 5], np.int32)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    batch = _batch(graphs)
    assert batch._leveled is not None

    _, lev = chain_function_with_aux(x, lengths, batch, impl="leveled")
    _, gen = chain_function_with_aux(x, lengths, batch, impl="gather")
    np.testing.assert_allclose(np.asarray(lev.objf), np.asarray(gen.objf),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lev.gamma),
                               np.asarray(gen.gamma), rtol=1e-3, atol=1e-5)
    assert np.all(np.asarray(lev.ok))
    # per-frame posterior mass == 1 on active frames
    gs = np.asarray(lev.gamma_sum)
    for b in range(B):
        for t in range(int(lengths[b])):
            assert abs(gs[b, t] - 1.0) < 1e-3
    ref_objf, ref_gamma = oracle.oracle_objf_log(np.asarray(x), lengths,
                                                 graphs)
    np.testing.assert_allclose(np.asarray(lev.objf), ref_objf, rtol=2e-4,
                               atol=1e-4)


def test_leveled_infeasible_length():
    rng = np.random.RandomState(2)
    P = 5
    g = _sausage(rng, 6, P, seed=3)
    batch = _batch([g, g])
    x = jnp.asarray(rng.randn(2, 8, P).astype(np.float32))
    lengths = np.array([6, 8], np.int32)
    _, res = chain_function_with_aux(x, lengths, batch, impl="leveled")
    assert np.isfinite(res.objf[0]) and np.isneginf(res.objf[1])
    assert bool(res.ok[0]) and not bool(res.ok[1])


def test_leveled_gradient_matches():
    rng = np.random.RandomState(3)
    P = 4
    g = _sausage(rng, 5, P, seed=4)
    batch = _batch([g])
    x = jnp.asarray(rng.randn(1, 5, P).astype(np.float32))
    lengths = jnp.array([5], jnp.int32)
    g_lev = jax.grad(lambda xx: chain_function(xx, lengths, batch,
                                               impl="leveled"))(x)
    g_gen = jax.grad(lambda xx: chain_function(xx, lengths, batch,
                                               impl="gather"))(x)
    np.testing.assert_allclose(np.asarray(g_lev), np.asarray(g_gen),
                               rtol=1e-3, atol=1e-5)

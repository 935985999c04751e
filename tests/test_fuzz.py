"""Cross-engine property fuzz: every engine that accepts a graph
family must agree with the gather engine on objf/gamma/ok, and the
invariants must hold, across randomized graphs, weights, emissions, and
length patterns.  Shapes are fixed across seeds so the compiled
programs are reused (one compile per family)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.loss import chain_function_with_aux
from pychain_tpu.utils.testgraphs import (denominator_fst, linear_fst,
                                          random_fst, sausage_fst)

B, T, P = 3, 8, 6
SEEDS = range(4)


def _x(seed):
    rng = np.random.RandomState(100 + seed)
    return jnp.asarray(rng.randn(B, T, P).astype(np.float32) * 1.5)


def _agree(batch, x, lengths, impls, rtol=2e-4):
    results = {}
    for impl in impls:
        _, aux = chain_function_with_aux(x, lengths, batch, impl=impl)
        results[impl] = aux
    base = results[impls[0]]
    for impl in impls[1:]:
        np.testing.assert_allclose(
            np.asarray(results[impl].objf), np.asarray(base.objf),
            rtol=rtol, atol=1e-4, err_msg=impl)
        np.testing.assert_allclose(
            np.asarray(results[impl].gamma), np.asarray(base.gamma),
            rtol=5e-3, atol=1e-4, err_msg=impl)
    return base


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_linear_chains(seed):
    rng = np.random.RandomState(seed)
    lengths = np.array([T, T - 2, T - 3], np.int32)
    graphs = [ChainGraph(linear_fst(rng.randint(0, P, size=int(n))),
                         log_domain=True) for n in lengths]
    batch = ChainGraphBatch(graphs, max_num_transitions=T,
                            max_num_states=T + 1)
    base = _agree(batch, _x(seed), lengths,
                  ["gather", "linear", "leveled", "semiring"])
    assert np.all(np.asarray(base.ok))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_sausages(seed):
    rng = np.random.RandomState(10 + seed)
    lengths = np.full(B, 4, np.int32)
    graphs = [ChainGraph(
        sausage_fst([list(rng.choice(P, size=rng.randint(1, 4),
                                     replace=False)) for _ in range(4)],
                    seed=seed * 7 + b), log_domain=True)
        for b in range(B)]
    mk = max(g.num_transitions for g in graphs)
    ms = max(g.num_states for g in graphs)
    batch = ChainGraphBatch(graphs, max_num_transitions=mk,
                            max_num_states=ms)
    base = _agree(batch, _x(seed)[:, :4], lengths,
                  ["gather", "leveled", "semiring"])
    assert np.all(np.asarray(base.ok))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_cyclic_graphs(seed):
    rng = np.random.RandomState(20 + seed)
    lengths = np.array([T, T - 1, T - 4], np.int32)
    graphs = [ChainGraph(random_fst(num_states=5, num_pdfs=P,
                                    max_arcs_per_state=3,
                                    seed=seed * 11 + b),
                         log_domain=True) for b in range(B)]
    mk = max(g.num_transitions for g in graphs)
    ms = max(g.num_states for g in graphs)
    batch = ChainGraphBatch(graphs, max_num_transitions=mk,
                            max_num_states=ms)
    base = _agree(batch, _x(seed), lengths, ["gather", "semiring"])
    # ergodic all-final random graphs accept every length
    assert np.all(np.asarray(base.ok))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_denominator_engines(seed):
    den_fst, P_den = denominator_fst(num_phones=6, states_per_phone=2,
                                     seed=seed)
    den = ChainGraph(den_fst, log_domain=False)
    batch = ChainGraphBatch(den, B)
    rng = np.random.RandomState(200 + seed)
    x = jnp.asarray(rng.randn(B, T, P_den).astype(np.float32))
    lengths = np.array([T, T - 2, T - 5], np.int32)
    base = _agree(batch, x, lengths, ["gather", "factorized"])
    assert np.all(np.asarray(base.ok))
    # the invariants the reference checks natively (alpha*beta, gamma)
    ab = np.asarray(base.alpha_beta)
    mask = np.arange(T)[None, :] < lengths[:, None]
    np.testing.assert_allclose(ab[mask & (ab != 1.0)],
                               1.0, rtol=0.05)

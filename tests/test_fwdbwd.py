"""Forward-backward correctness vs an independent dense float64 oracle.

Oracle: dense torch-autograd recurrence (pychain_tpu/utils/oracle.py) —
different sparsity, precision, and differentiation path than the JAX
implementation under test.  Also: exact path enumeration on tiny graphs,
and the runtime invariants the reference checks natively
(chain-computation.cc:345-391).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pychain_tpu import ChainGraph, ChainGraphBatch, chain_function
from pychain_tpu.loss import chain_function_with_aux, graph_arrays
from pychain_tpu.utils import oracle
from pychain_tpu.utils.testgraphs import linear_fst, random_fst


def make_batch(graphs):
    max_k = max(g.num_transitions for g in graphs)
    max_s = max(g.num_states for g in graphs)
    return ChainGraphBatch(graphs, max_num_transitions=max_k,
                           max_num_states=max_s)


def rand_x(rng, B, T, P, scale=1.0):
    return (rng.randn(B, T, P) * scale).astype(np.float32)


# ----------------------------------------------------------------------
# Log domain (numerator path)
# ----------------------------------------------------------------------

def test_log_domain_linear_vs_oracle():
    rng = np.random.RandomState(0)
    pdfs = [[0, 2, 1, 3], [1, 1, 2, 0], [3, 0, 1, 2]]
    graphs = [ChainGraph(linear_fst(p), log_domain=True) for p in pdfs]
    B, T, P = 3, 6, 4
    lengths = np.array([6, 5, 4], np.int32)
    x = rand_x(rng, B, T, P)
    # linear graph of length 4 can only emit exactly 4 frames... use
    # lengths = num arcs for a linear FST:
    lengths = np.array([4, 4, 4], np.int32)

    batch = make_batch(graphs)
    objf, res = chain_function_with_aux(jnp.asarray(x), lengths, batch)
    ref_objf, ref_gamma = oracle.oracle_objf_log(x, lengths, graphs)

    np.testing.assert_allclose(np.asarray(res.objf), ref_objf, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(res.gamma), ref_gamma,
                               rtol=2e-3, atol=2e-6)
    assert np.all(np.asarray(res.ok))


def test_log_domain_unequal_lengths_random_graphs():
    rng = np.random.RandomState(1)
    B, T, P = 5, 9, 6
    graphs = [ChainGraph(random_fst(num_states=4 + b, num_pdfs=P, seed=b),
                         log_domain=True) for b in range(B)]
    lengths = np.array([9, 7, 5, 3, 1], np.int32)
    x = rand_x(rng, B, T, P)
    batch = make_batch(graphs)
    objf, res = chain_function_with_aux(jnp.asarray(x), lengths, batch)
    ref_objf, ref_gamma = oracle.oracle_objf_log(x, lengths, graphs)
    np.testing.assert_allclose(np.asarray(res.objf), ref_objf, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(res.gamma), ref_gamma,
                               rtol=2e-3, atol=2e-6)
    # gamma must be exactly zero beyond each sequence's length
    gam = np.asarray(res.gamma)
    for b in range(B):
        assert np.all(gam[b, lengths[b]:] == 0.0)


def test_log_domain_brute_force_tiny():
    rng = np.random.RandomState(2)
    g = ChainGraph(random_fst(num_states=3, num_pdfs=3, seed=5),
                   log_domain=True)
    T, P = 4, 3
    x = rand_x(rng, 1, T, P)
    lengths = np.array([4], np.int32)
    batch = make_batch([g])
    _, res = chain_function_with_aux(jnp.asarray(x), lengths, batch)
    ref = oracle.brute_force_objf_log(x[0].astype(np.float64), 4, g)
    np.testing.assert_allclose(float(res.objf[0]), ref, rtol=2e-4)


def test_log_domain_unsorted_batch():
    """The reference requires length-sorted batches; we must not."""
    rng = np.random.RandomState(3)
    B, T, P = 4, 8, 5
    graphs = [ChainGraph(random_fst(num_states=5, num_pdfs=P, seed=10 + b),
                         log_domain=True) for b in range(B)]
    lengths = np.array([3, 8, 5, 6], np.int32)  # deliberately unsorted
    x = rand_x(rng, B, T, P)
    batch = make_batch(graphs)
    _, res = chain_function_with_aux(jnp.asarray(x), lengths, batch)
    ref_objf, ref_gamma = oracle.oracle_objf_log(x, lengths, graphs)
    np.testing.assert_allclose(np.asarray(res.objf), ref_objf, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(res.gamma), ref_gamma,
                               rtol=2e-3, atol=2e-6)


# ----------------------------------------------------------------------
# Probability domain with leaky HMM (denominator path)
# ----------------------------------------------------------------------

def test_prob_domain_vs_oracle():
    rng = np.random.RandomState(4)
    B, T, P = 3, 7, 6
    den = ChainGraph(random_fst(num_states=6, num_pdfs=P, seed=21),
                     log_domain=False)
    lengths = np.array([7, 5, 2], np.int32)
    x = rand_x(rng, B, T, P)
    batch = ChainGraphBatch(den, B)  # broadcast (shared fast path)
    leaky = 1e-5
    objf, res = chain_function_with_aux(jnp.asarray(x), lengths, batch,
                                        leaky_coefficient=leaky)
    ref_objf, ref_gamma = oracle.oracle_objf_prob(
        x, lengths, [den] * B, leaky)
    np.testing.assert_allclose(np.asarray(res.objf), ref_objf, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.gamma), ref_gamma,
                               rtol=1e-3, atol=1e-6)
    assert np.all(np.asarray(res.ok))


def test_prob_domain_batched_list_matches_shared():
    """Same graph via broadcast vs via list-padding must agree exactly."""
    rng = np.random.RandomState(5)
    B, T, P = 4, 6, 5
    den = ChainGraph(random_fst(num_states=5, num_pdfs=P, seed=31),
                     log_domain=False)
    lengths = np.array([6, 6, 4, 3], np.int32)
    x = jnp.asarray(rand_x(rng, B, T, P))
    shared = ChainGraphBatch(den, B)
    listed = make_batch([den] * B)
    assert shared.shared and not listed.shared
    # pin impl=gather: broadcast-vs-list equivalence should be exact; the
    # factorized cross-implementation comparison lives in test_factorized
    _, res_a = chain_function_with_aux(x, lengths, shared, impl="gather")
    _, res_b = chain_function_with_aux(x, lengths, listed, impl="gather")
    np.testing.assert_allclose(np.asarray(res_a.objf),
                               np.asarray(res_b.objf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res_a.gamma),
                               np.asarray(res_b.gamma), rtol=1e-5,
                               atol=1e-7)


def test_prob_domain_leaky_modes():
    rng = np.random.RandomState(6)
    P = 5
    fst = random_fst(num_states=6, num_pdfs=P, seed=41)
    for initial_mode in ("fst", "leaky"):
        for final_mode in ("fst", "ones"):
            den = ChainGraph(fst, initial_mode=initial_mode,
                             final_mode=final_mode, log_domain=False)
            x = rand_x(rng, 2, 5, P)
            lengths = np.array([5, 4], np.int32)
            batch = ChainGraphBatch(den, 2)
            _, res = chain_function_with_aux(jnp.asarray(x), lengths, batch)
            ref_objf, ref_gamma = oracle.oracle_objf_prob(
                x, lengths, [den, den], 1e-5)
            np.testing.assert_allclose(np.asarray(res.objf), ref_objf,
                                       rtol=1e-4, atol=2e-4)
            np.testing.assert_allclose(np.asarray(res.gamma), ref_gamma,
                                       rtol=1e-3, atol=1e-6)


# ----------------------------------------------------------------------
# Invariants (the reference's native runtime checks, as a test suite)
# ----------------------------------------------------------------------

def test_alpha_beta_invariants_every_frame():
    rng = np.random.RandomState(7)
    B, T, P = 3, 10, 6
    den = ChainGraph(random_fst(num_states=7, num_pdfs=P, seed=51))
    lengths = np.array([10, 6, 3], np.int32)
    x = jnp.asarray(rand_x(rng, B, T, P))
    batch = ChainGraphBatch(den, B)
    _, res = chain_function_with_aux(x, lengths, batch)
    ab = np.asarray(res.alpha_beta)
    gs = np.asarray(res.gamma_sum)
    for b in range(B):
        for t in range(int(lengths[b])):
            # sum_i alpha'(t,i) beta^(t,i) == 1 (cc:363-367, per sequence)
            assert abs(ab[b, t] - 1.0) < 1e-3, (b, t, ab[b, t])
            # sum_n gamma(t,n) == 1 (cc:381)
            assert abs(gs[b, t] - 1.0) < 1e-3, (b, t, gs[b, t])


def test_gradient_is_gamma_and_scales():
    rng = np.random.RandomState(8)
    B, T, P = 2, 5, 4
    den = ChainGraph(random_fst(num_states=5, num_pdfs=P, seed=61))
    lengths = np.array([5, 3], np.int32)
    x = jnp.asarray(rand_x(rng, B, T, P))
    batch = ChainGraphBatch(den, B)

    grad = jax.grad(
        lambda xx: chain_function(xx, lengths, batch))(x)
    _, res = chain_function_with_aux(x, lengths, batch)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(res.gamma),
                               rtol=1e-6)
    # cotangent scaling (reference loss.py:83-87)
    grad2 = jax.grad(
        lambda xx: 2.5 * chain_function(xx, lengths, batch))(x)
    np.testing.assert_allclose(np.asarray(grad2),
                               2.5 * np.asarray(res.gamma), rtol=2e-4)


def test_finite_difference_gradient():
    rng = np.random.RandomState(9)
    B, T, P = 1, 4, 3
    den = ChainGraph(random_fst(num_states=4, num_pdfs=P, seed=71))
    lengths = np.array([4], np.int32)
    x = rand_x(rng, B, T, P)
    batch = ChainGraphBatch(den, B)

    f = lambda xx: float(chain_function(jnp.asarray(xx), lengths, batch))
    g = np.asarray(jax.grad(
        lambda xx: chain_function(xx, lengths, batch))(jnp.asarray(x)))
    eps = 1e-3
    for (b, t, p) in [(0, 0, 0), (0, 2, 1), (0, 3, 2)]:
        xp = x.copy(); xp[b, t, p] += eps
        xm = x.copy(); xm[b, t, p] -= eps
        fd = (f(xp) - f(xm)) / (2 * eps)
        assert abs(fd - g[b, t, p]) < 5e-3, (b, t, p, fd, g[b, t, p])


def test_jit_and_vmap_compatible():
    rng = np.random.RandomState(10)
    B, T, P = 2, 5, 4
    den = ChainGraph(random_fst(num_states=4, num_pdfs=P, seed=81))
    lengths = jnp.array([5, 4], jnp.int32)
    x = jnp.asarray(rand_x(rng, B, T, P))
    batch = ChainGraphBatch(den, B)
    g = graph_arrays(batch)

    jitted = jax.jit(lambda xx, ll, gg: chain_function(xx, ll, gg))
    a = jitted(x, lengths, g)
    b = chain_function(x, lengths, g)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


@pytest.mark.parametrize("impl", ["gather", "factorized"])
def test_saturated_logits_stay_finite(impl):
    """Value and gradient must be finite at the clamp extremes — the
    regime an overfit acoustic model drives the engines into (round-3
    soak: the NaNs there were optimization dynamics, and this pins
    that the engines themselves are not the cause).  Probes: random
    sign +-30 saturation, and one-hot saturation (one pdf at +30, the
    rest at -30 per frame)."""
    from pychain_tpu.loss import dispatch_arrays
    from pychain_tpu.utils.testgraphs import denominator_fst

    rng = np.random.RandomState(0)
    den_fst, P = denominator_fst(num_phones=12, states_per_phone=2,
                                 seed=0)
    den = ChainGraph(den_fst)
    B, T = 3, 20
    lengths = jnp.array([20, 15, 9], jnp.int32)
    g = dispatch_arrays(ChainGraphBatch(den, B), impl)

    sat = np.sign(rng.randn(B, T, P)).astype(np.float32) * 30.0
    onehot = np.full((B, T, P), -30.0, np.float32)
    for b in range(B):
        onehot[b, np.arange(T), rng.randint(0, P, size=T)] = 30.0
    for x in (sat, onehot):
        o, gr = jax.value_and_grad(chain_function)(jnp.asarray(x),
                                                   lengths, g)
        assert np.isfinite(float(o))
        assert bool(jnp.isfinite(gr).all())

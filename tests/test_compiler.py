"""Graph compiler: fst_to_tensor / set_leaky_probs parity semantics."""

import numpy as np
import pytest

from pychain_tpu.graphs.compiler import compile_fst, leaky_probs
from pychain_tpu.graphs.fst import FST
from pychain_tpu.utils.testgraphs import random_fst


def test_linear_fst_compilation_log_domain():
    fst = FST.linear([0, 2, 1], weights=[0.5, 0.25, 0.125])
    g = compile_fst(fst, log_domain=True)
    assert g.num_states == 4
    assert g.num_transitions == 3
    # [src, dst, pdf] with pdf = ilabel - 1
    np.testing.assert_array_equal(
        g.forward_transitions, [[0, 1, 0], [1, 2, 2], [2, 3, 1]])
    # log probs are negated tropical weights
    np.testing.assert_allclose(
        g.forward_transition_probs, [-0.5, -0.25, -0.125])
    # final log-probs: -inf except last state (weight 0 -> log-prob 0)
    assert g.final_probs[3] == 0.0
    assert np.all(np.isneginf(g.final_probs[:3]))
    # CSR indices: state 3 has no out-arcs -> empty range
    np.testing.assert_array_equal(
        g.forward_transition_indices, [[0, 1], [1, 2], [2, 3], [3, 3]])


def test_prob_domain_exponentiates():
    fst = FST.linear([0, 1], weights=[1.0, 2.0], final_weight=0.5)
    g = compile_fst(fst, log_domain=False)
    np.testing.assert_allclose(
        g.forward_transition_probs, np.exp([-1.0, -2.0]), rtol=1e-6)
    np.testing.assert_allclose(g.final_probs[2], np.exp(-0.5), rtol=1e-6)
    assert g.final_probs[0] == 0.0  # exp(-inf)


def test_backward_sorted_by_destination():
    fst = random_fst(num_states=11, num_pdfs=6, seed=5)
    g = compile_fst(fst, log_domain=True)
    dst = g.backward_transitions[:, 1]
    assert np.all(np.diff(dst) >= 0), "backward arcs must be dst-sorted"
    # same multiset of arcs in both orderings
    fwd = set(map(tuple, g.forward_transitions))
    bwd = set(map(tuple, g.backward_transitions))
    assert fwd == bwd
    # CSR ranges cover each state's in-arcs
    for s in range(g.num_states):
        lo, hi = g.backward_transition_indices[s]
        assert np.all(g.backward_transitions[lo:hi, 1] == s)


def test_forward_csr_ranges():
    fst = random_fst(num_states=7, num_pdfs=4, seed=1)
    g = compile_fst(fst, log_domain=False)
    for s in range(g.num_states):
        lo, hi = g.forward_transition_indices[s]
        assert np.all(g.forward_transitions[lo:hi, 0] == s)


def test_epsilon_rejected():
    fst = FST.from_arcs(2, 0, [(0, 1, 0, 0, 0.0)], {1: 0.0})
    with pytest.raises(ValueError, match="epsilon"):
        compile_fst(fst)


def test_leaky_probs_properties():
    fst = random_fst(num_states=10, num_pdfs=5, seed=11)
    lp = leaky_probs(fst)
    assert lp.shape == (10,)
    assert lp.dtype == np.float32
    assert np.all(lp >= 0)
    # averaged occupancies of a normalised chain sum to ~1
    assert abs(lp.sum() - 1.0) < 1e-4
    # start state holds the full initial mass contribution (iter 0 = 1/100)
    assert lp[fst.start] >= 1.0 / 100 - 1e-6


def test_leaky_probs_two_state_analytic():
    # start -> {stay, go}; uniform weights; final only on state 1.
    # Hand-check the first two iterations of the power method.
    fst = FST.from_arcs(
        2, 0,
        [(0, 0, 1, 1, 0.0), (0, 1, 1, 1, 0.0), (1, 1, 2, 2, 0.0)],
        {1: 0.0})
    lp = leaky_probs(fst, num_iters=2)
    # iter0: cur=[1,0], avg += [1,0]/2
    # nf = [1/2, 1/2] (state0: two arcs e^0; state1: arc + final)
    # flow: next=[1*0.5, 1*0.5] -> renorm [0.5, 0.5]
    # iter1: avg += [0.25, 0.25]
    np.testing.assert_allclose(lp, [0.75, 0.25], rtol=1e-6)


def test_leaky_probs_three_state_analytic():
    """3-state fixture, hand-computed (fstext.cc:120-171 semantics):
    normalisers include arc AND final mass; occupancies renormalise
    every iteration and average over iterations."""
    import numpy as np
    from pychain_tpu.graphs.fst import FST
    from pychain_tpu.graphs.compiler import leaky_probs
    # s0: 0->1 (w=0, p=1)                      tot=1,  nf=1
    # s1: 1->1 (w=0), 1->2 (w=0)               tot=2,  nf=1/2
    # s2: 2->0 (w=0), final (w=0, p=1)         tot=2,  nf=1/2
    fst = FST.from_arcs(
        3, 0,
        [(0, 1, 1, 1, 0.0), (1, 1, 1, 1, 0.0), (1, 2, 2, 2, 0.0),
         (2, 0, 3, 3, 0.0)],
        {2: 0.0})
    lp = leaky_probs(fst, num_iters=3)
    # it0: cur=[1,0,0]      avg=[1/3,0,0]
    #      flow 0->1 : 1    nxt=[0,1,0]        cur=[0,1,0]
    # it1: avg=[1/3,1/3,0]
    #      flow 1->{1,2}: .5/.5                cur=[0,.5,.5]
    # it2: avg=[1/3,1/2,1/6]
    np.testing.assert_allclose(lp, [1 / 3, 1 / 2, 1 / 6], rtol=1e-6)


def test_leaky_probs_renormalisation_with_final_mass():
    """Mass lost to a final state must be renormalised away each
    iteration (nxt / nxt.sum(), fstext.cc:162-166)."""
    import numpy as np
    from pychain_tpu.graphs.fst import FST
    from pychain_tpu.graphs.compiler import leaky_probs
    # s1 splits its unit mass: 1/3 onward, 2/3 to final.
    w_arc = float(np.log(3.0))       # p = 1/3
    w_fin = float(np.log(1.5))       # p = 2/3
    fst = FST.from_arcs(
        3, 0,
        [(0, 1, 1, 1, 0.0), (1, 2, 2, 2, w_arc), (2, 0, 3, 3, 0.0)],
        {1: w_fin})
    lp = leaky_probs(fst, num_iters=3)
    # it0: cur=[1,0,0]; it1: cur=[0,1,0];
    # it2: flow 1->2 = 1/3, renormalised to 1  -> cur=[0,0,1]
    np.testing.assert_allclose(lp, [1 / 3, 1 / 3, 1 / 3], rtol=1e-6)

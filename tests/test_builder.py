"""Graph construction from transcripts (graphs/builder.py) — the
native replacement for Kaldi's chain-est-phone-lm / chain-make-den-fst /
supervision pipeline the reference depends on but never ships."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.graphs import FST
from pychain_tpu.graphs.builder import (EOS, ChainTopology, PhoneLM,
                                        alignment_to_pdf_sequence,
                                        estimate_phone_lm,
                                        make_denominator_fst,
                                        make_numerator_fst)
from pychain_tpu.loss import chain_function
from pychain_tpu.ops.linear import is_linear_graph


def _random_transcripts(n=30, num_phones=8, seed=0, min_len=5, max_len=15):
    rng = np.random.RandomState(seed)
    # markov transcripts so bigram/trigram structure is learnable
    trans = rng.dirichlet(np.ones(num_phones) * 0.5, size=num_phones)
    out = []
    for _ in range(n):
        L = rng.randint(min_len, max_len + 1)
        t = [rng.randint(num_phones)]
        for _ in range(L - 1):
            t.append(rng.choice(num_phones, p=trans[t[-1]]))
        out.append([int(p) for p in t])
    return out


# ----------------------------------------------------------------------
# Topology
# ----------------------------------------------------------------------

def test_topology_pdf_mapping():
    topo = ChainTopology(num_phones=5)
    assert topo.num_pdfs == 10
    assert topo.fwd_pdf(3) == 6 and topo.self_pdf(3) == 7
    shared = ChainTopology(num_phones=5, shared_pdfs=True)
    assert shared.num_pdfs == 5
    assert shared.fwd_pdf(2) == shared.self_pdf(2) == 2
    with pytest.raises(ValueError):
        topo.fwd_pdf(5)
    with pytest.raises(ValueError):
        ChainTopology(num_phones=5, self_loop_prob=1.0)


# ----------------------------------------------------------------------
# Phone LM
# ----------------------------------------------------------------------

def test_bigram_probs_hand_checked():
    # corpus: [0 1 1], [0 1] ; order 2, interp 1.0
    lm = estimate_phone_lm([[0, 1, 1], [0, 1]], num_phones=2, order=2)
    # base case (add-one over phones+EOS): events = 0,1,1,EOS, 0,1,EOS
    n = 7
    p0 = (2 + 1) / (n + 3)
    p1 = (3 + 1) / (n + 3)
    pe = (2 + 1) / (n + 3)
    # P(0 | BOS) = (c(BOS,0) + P0(0)) / (c(BOS) + 1) = (2 + p0) / 3
    s = lm.start
    np.testing.assert_allclose(lm.probs[s, 0], (2 + p0) / 3, rtol=1e-12)
    np.testing.assert_allclose(lm.probs[s, 1], (0 + p1) / 3, rtol=1e-12)
    np.testing.assert_allclose(lm.final[s], (0 + pe) / 3, rtol=1e-12)
    # P(1 | 1) = (c(1,1) + P0(1)) / (c(1) + 1) = (1 + p1) / 4
    s1 = lm.state_index[(1,)]
    np.testing.assert_allclose(lm.probs[s1, 1], (1 + p1) / 4, rtol=1e-12)
    # every row + final is a distribution
    rows = lm.probs.sum(axis=1) + lm.final
    np.testing.assert_allclose(rows, 1.0, rtol=1e-12)


def test_trigram_state_budget_and_closure():
    ts = _random_transcripts(n=40, num_phones=6, seed=1)
    lm = estimate_phone_lm(ts, order=3, max_states=20)
    assert lm.num_states <= 20 + 8  # budget + suffix-closure slack
    # suffix closure: every history's suffixes are states
    for h in lm.histories:
        assert h[1:] in lm.state_index
    # next_state always valid, rows normalized
    assert lm.next_state.min() >= 0
    assert lm.next_state.max() < lm.num_states
    np.testing.assert_allclose(lm.probs.sum(axis=1) + lm.final, 1.0,
                               rtol=1e-10)


def test_lm_score_accumulates_rows():
    ts = _random_transcripts(n=10, num_phones=4, seed=2)
    lm = estimate_phone_lm(ts, order=2)
    t = ts[0]
    s, lp = lm.start, 0.0
    for p in t:
        lp += np.log(lm.probs[s, p])
        s = int(lm.next_state[s, p])
    lp += np.log(lm.final[s])
    np.testing.assert_allclose(lm.score(t), lp, rtol=1e-12)


# ----------------------------------------------------------------------
# Denominator graph
# ----------------------------------------------------------------------

def test_denominator_is_stochastic():
    ts = _random_transcripts(num_phones=6, seed=3)
    lm = estimate_phone_lm(ts, order=2)
    topo = ChainTopology(num_phones=6, self_loop_prob=0.4)
    den = make_denominator_fst(lm, topo)
    den.validate()
    for s in range(den.num_states):
        _, _, w, _ = den.state_arcs(s)
        tot = np.exp(-w.astype(np.float64)).sum()
        if np.isfinite(den.final[s]):
            tot += np.exp(-float(den.final[s]))
        np.testing.assert_allclose(tot, 1.0, rtol=1e-6)
    # state 0 (initial) has no self-loop; every phone state has exactly
    # one TOPOLOGY self-loop (even ilabel = self_pdf + 1).  A repeated
    # phone also yields a structural loop labelled with its fwd pdf
    # (odd ilabel) — e.g. bigram state (p,) emitting p again — which is
    # legitimate graph structure, not the HMM self-loop.
    for s in range(den.num_states):
        il, _, _, ns = den.state_arcs(s)
        topo_loops = int(((ns == s) & (il % 2 == 0)).sum())
        assert topo_loops == (0 if s == 0 else 1)


def test_denominator_pruning_renormalizes():
    ts = _random_transcripts(num_phones=8, seed=4)
    lm = estimate_phone_lm(ts, order=2)
    topo = ChainTopology(num_phones=8)
    dense = make_denominator_fst(lm, topo)
    pruned = make_denominator_fst(lm, topo, prune_prob=0.05)
    assert pruned.num_arcs < dense.num_arcs
    for s in range(pruned.num_states):
        _, _, w, _ = pruned.state_arcs(s)
        tot = np.exp(-w.astype(np.float64)).sum()
        if np.isfinite(pruned.final[s]):
            tot += np.exp(-float(pruned.final[s]))
        np.testing.assert_allclose(tot, 1.0, rtol=1e-6)


def test_denominator_roundtrip():
    ts = _random_transcripts(num_phones=5, seed=5)
    lm = estimate_phone_lm(ts, order=2)
    den = make_denominator_fst(lm, ChainTopology(num_phones=5))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "den.fst")
        den.write(path)
        back = FST.read(path)
    np.testing.assert_array_equal(back.ilabels, den.ilabels)
    np.testing.assert_array_equal(back.nextstates, den.nextstates)
    np.testing.assert_allclose(back.weights, den.weights, rtol=1e-7)
    np.testing.assert_allclose(back.final, den.final)


# ----------------------------------------------------------------------
# Numerator supervision vs the denominator (the MMI containment law)
# ----------------------------------------------------------------------

def test_num_paths_are_den_paths():
    """With LM-scored numerators, every numerator path is an exact
    denominator path, so num objf <= den objf for ANY emissions."""
    num_phones = 6
    ts = _random_transcripts(n=25, num_phones=num_phones, seed=6)
    lm = estimate_phone_lm(ts, order=2)
    topo = ChainTopology(num_phones=num_phones)
    den = ChainGraph(make_denominator_fst(lm, topo), log_domain=False)

    rng = np.random.RandomState(0)
    B, T = 3, 24
    x = jnp.asarray(rng.randn(B, T, topo.num_pdfs).astype(np.float32))
    lengths = np.full(B, T, np.int32)

    den_objf = chain_function(x, lengths, ChainGraphBatch(den, B))

    nums = [ChainGraph(make_numerator_fst(ts[i], topo, lm=lm),
                       log_domain=True) for i in range(B)]
    mk = max(g.num_transitions for g in nums)
    ms = max(g.num_states for g in nums)
    num_batch = ChainGraphBatch(nums, max_num_transitions=mk,
                                max_num_states=ms)
    num_objf = chain_function(x, lengths, num_batch)
    assert float(num_objf) <= float(den_objf) + 1e-3


def test_flat_start_numerator_engines_agree():
    topo = ChainTopology(num_phones=5)
    rng = np.random.RandomState(1)
    B, T = 3, 18
    ts = _random_transcripts(n=B, num_phones=5, seed=7, min_len=4,
                             max_len=8)
    nums = [ChainGraph(make_numerator_fst(t, topo), log_domain=True)
            for t in ts]
    assert not any(is_linear_graph(g) for g in nums)  # self-loops
    mk = max(g.num_transitions for g in nums)
    ms = max(g.num_states for g in nums)
    batch = ChainGraphBatch(nums, max_num_transitions=mk,
                            max_num_states=ms)
    x = jnp.asarray(rng.randn(B, T, topo.num_pdfs).astype(np.float32))
    lengths = np.full(B, T, np.int32)
    auto = chain_function(x, lengths, batch, impl="auto")
    gather = chain_function(x, lengths, batch, impl="gather")
    assert np.isfinite(float(auto))
    np.testing.assert_allclose(float(auto), float(gather), rtol=1e-4)


def test_aligned_numerator_closed_form():
    """alignment -> pdf sequence -> linear graph: the objf is exactly
    the emission log-likelihood along the alignment."""
    topo = ChainTopology(num_phones=4)
    phones = [2, 0, 3, 1]
    durs = [3, 1, 4, 2]
    seq = alignment_to_pdf_sequence(phones, durs, topo)
    assert len(seq) == sum(durs)
    assert seq[0] == topo.fwd_pdf(2) and seq[1] == topo.self_pdf(2)
    g = ChainGraph(FST.linear(seq), log_domain=True)
    assert is_linear_graph(g)
    rng = np.random.RandomState(2)
    T = len(seq)
    x = rng.randn(1, T, topo.num_pdfs).astype(np.float32)
    objf = chain_function(jnp.asarray(x), np.array([T], np.int32),
                          ChainGraphBatch([g], max_num_transitions=T,
                                          max_num_states=T + 1))
    expect = sum(x[0, t, seq[t]] for t in range(T))
    np.testing.assert_allclose(float(objf), expect, rtol=1e-5, atol=1e-5)


def test_aligned_path_bounded_by_flat_start():
    """The aligned pdf sequence is one path of the flat-start graph
    (all weights 0), so its score is <= the flat-start total."""
    topo = ChainTopology(num_phones=4)
    phones = [1, 3, 0]
    durs = [2, 3, 2]
    T = sum(durs)
    seq = alignment_to_pdf_sequence(phones, durs, topo)
    lin = ChainGraph(FST.linear(seq), log_domain=True)
    flat = ChainGraph(make_numerator_fst(phones, topo), log_domain=True)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, T, topo.num_pdfs).astype(np.float32))
    lengths = np.array([T], np.int32)
    o_lin = chain_function(x, lengths,
                           ChainGraphBatch([lin], max_num_transitions=T,
                                           max_num_states=T + 1))
    o_flat = chain_function(
        x, lengths,
        ChainGraphBatch([flat],
                        max_num_transitions=flat.num_transitions,
                        max_num_states=flat.num_states))
    assert float(o_lin) <= float(o_flat) + 1e-4


def test_constrained_numerator_tolerance_zero_is_aligned():
    """tolerance=0 admits exactly the aligned path: objf equals the
    linear closed form, and the graph is width-1 time-synchronous."""
    from pychain_tpu.graphs.builder import make_constrained_numerator
    from pychain_tpu.ops.leveled import is_leveled_graph
    topo = ChainTopology(num_phones=4)
    phones = [2, 0, 3, 0]
    durs = [3, 2, 4, 2]
    T = sum(durs)
    g0 = ChainGraph(make_constrained_numerator(phones, durs, topo,
                                               tolerance=0),
                    log_domain=True)
    seq = alignment_to_pdf_sequence(phones, durs, topo)
    lin = ChainGraph(FST.linear(seq), log_domain=True)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, T, topo.num_pdfs).astype(np.float32))
    lengths = np.array([T], np.int32)

    def objf(g):
        return float(chain_function(
            x, lengths,
            ChainGraphBatch([g], max_num_transitions=g.num_transitions,
                            max_num_states=g.num_states)))

    np.testing.assert_allclose(objf(g0), objf(lin), rtol=1e-5)
    assert is_leveled_graph(g0)


def test_constrained_numerator_tolerance_monotone():
    """More tolerance admits strictly more paths: aligned <= tol=2 <=
    flat-start (all weights 0), and the tol=2 graph runs on the
    leveled engine with gather parity."""
    from pychain_tpu.graphs.builder import make_constrained_numerator
    from pychain_tpu.ops.leveled import is_leveled_graph
    topo = ChainTopology(num_phones=5)
    phones = [1, 4, 2, 0]
    durs = [4, 3, 5, 3]
    T = sum(durs)
    g_tol = ChainGraph(make_constrained_numerator(phones, durs, topo,
                                                  tolerance=2),
                       log_domain=True)
    assert is_leveled_graph(g_tol)
    seq = alignment_to_pdf_sequence(phones, durs, topo)
    lin = ChainGraph(FST.linear(seq), log_domain=True)
    flat = ChainGraph(make_numerator_fst(phones, topo), log_domain=True)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, T, topo.num_pdfs).astype(np.float32))
    lengths = np.array([T], np.int32)

    def objf(g, impl="auto"):
        return float(chain_function(
            x, lengths,
            ChainGraphBatch([g], max_num_transitions=g.num_transitions,
                            max_num_states=g.num_states), impl=impl))

    o_lin, o_tol, o_flat = objf(lin), objf(g_tol), objf(flat)
    assert o_lin <= o_tol + 1e-4 <= o_flat + 2e-4
    assert o_tol > o_lin  # tolerance really adds paths
    np.testing.assert_allclose(o_tol, objf(g_tol, impl="gather"),
                               rtol=1e-4)
    np.testing.assert_allclose(o_tol, objf(g_tol, impl="leveled"),
                               rtol=1e-4)


def test_constrained_numerator_validation():
    from pychain_tpu.graphs.builder import make_constrained_numerator
    topo = ChainTopology(num_phones=3)
    with pytest.raises(ValueError):
        make_constrained_numerator([0, 1], [2], topo)
    with pytest.raises(ValueError):
        make_constrained_numerator([0], [0], topo)
    with pytest.raises(ValueError):
        make_constrained_numerator([0], [3], topo, tolerance=-1)


def test_builder_denominator_on_factorized_engine():
    """A trigram builder denominator (initial state without self-loop,
    repeated-phone structural loops) runs the factorized MXU engine
    with gather parity — the realistic-graph shape of the fast path."""
    ts = _random_transcripts(n=60, num_phones=8, seed=8, min_len=6,
                             max_len=14)
    lm = estimate_phone_lm(ts, order=3, max_states=40)
    topo = ChainTopology(num_phones=8)
    den = ChainGraph(make_denominator_fst(lm, topo), log_domain=False)
    assert den.num_states > 20
    rng = np.random.RandomState(9)
    B, T = 3, 16
    x = jnp.asarray(rng.randn(B, T, topo.num_pdfs).astype(np.float32))
    lengths = np.array([16, 12, 9], np.int32)
    batch = ChainGraphBatch(den, B)
    from pychain_tpu.loss import chain_function_with_aux
    _, fact = chain_function_with_aux(x, lengths, batch,
                                      impl="factorized")
    _, gath = chain_function_with_aux(x, lengths, batch, impl="gather")
    np.testing.assert_allclose(np.asarray(fact.objf),
                               np.asarray(gath.objf), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(fact.gamma),
                               np.asarray(gath.gamma), rtol=1e-3,
                               atol=1e-5)
    assert np.all(np.asarray(fact.ok))


def test_constrained_batch_unequal_lengths():
    """A batch of constrained supervisions with different totals runs
    the leveled engine with per-graph lengths and gather parity."""
    from pychain_tpu.graphs.builder import make_constrained_numerator
    topo = ChainTopology(num_phones=5)
    specs = [([1, 4, 2], [4, 3, 5]), ([0, 3], [6, 4]),
             ([2, 2, 1, 0], [3, 3, 3, 3])]
    graphs = [ChainGraph(make_constrained_numerator(p, d, topo,
                                                    tolerance=2),
                         log_domain=True) for p, d in specs]
    lengths = np.array([sum(d) for _, d in specs], np.int32)
    T = int(lengths.max())
    mk = max(g.num_transitions for g in graphs)
    ms = max(g.num_states for g in graphs)
    batch = ChainGraphBatch(graphs, max_num_transitions=mk,
                            max_num_states=ms)
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(3, T, topo.num_pdfs).astype(np.float32))
    from pychain_tpu.loss import chain_function_with_aux
    _, lev = chain_function_with_aux(x, lengths, batch, impl="leveled")
    _, gath = chain_function_with_aux(x, lengths, batch, impl="gather")
    np.testing.assert_allclose(np.asarray(lev.objf),
                               np.asarray(gath.objf), rtol=1e-4)
    assert np.all(np.asarray(lev.ok))


def test_constrained_wide_tolerance_warns_and_computes():
    """Width beyond the leveled cap: a UserWarning fires and the graph
    still computes correctly on the generic engine via auto."""
    from pychain_tpu.graphs.builder import make_constrained_numerator
    from pychain_tpu.ops.leveled import is_leveled_graph
    topo = ChainTopology(num_phones=3)
    phones = [0, 1, 2] * 7          # 21 short phones
    durs = [2] * 21                 # slack everywhere -> wide levels
    with pytest.warns(UserWarning, match="level width"):
        fst = make_constrained_numerator(phones, durs, topo,
                                         tolerance=16)
    g = ChainGraph(fst, log_domain=True)
    assert not is_leveled_graph(g)
    T = sum(durs)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, T, topo.num_pdfs).astype(np.float32))
    lengths = np.array([T], np.int32)
    batch = ChainGraphBatch([g], max_num_transitions=g.num_transitions,
                            max_num_states=g.num_states)
    auto = chain_function(x, lengths, batch, impl="auto")
    gath = chain_function(x, lengths, batch, impl="gather")
    np.testing.assert_allclose(float(auto), float(gath), rtol=1e-4)
    assert np.isfinite(float(auto))


def test_phone_lm_save_load(tmp_path):
    ts = _random_transcripts(n=20, num_phones=5, seed=12)
    lm = estimate_phone_lm(ts, order=3, max_states=30)
    path = str(tmp_path / "lm.npz")
    lm.save(path)
    back = PhoneLM.load(path)
    assert back.order == lm.order
    assert back.histories == lm.histories
    assert back.start == lm.start
    np.testing.assert_allclose(back.probs, lm.probs)
    np.testing.assert_allclose(back.final, lm.final)
    np.testing.assert_array_equal(back.next_state, lm.next_state)
    np.testing.assert_allclose(back.score(ts[0]), lm.score(ts[0]))


def test_lexicon_and_transcripts(tmp_path):
    from pychain_tpu.graphs.builder import (read_lexicon,
                                            read_transcripts,
                                            words_to_phones)
    lex_file = tmp_path / "lexicon.txt"
    lex_file.write_text("cat 0 1 2\ndog 3 4\ncat 0 5\n\n")
    lex = read_lexicon(str(lex_file))
    assert lex["cat"] == [[0, 1, 2], [0, 5]]  # both prons, first wins
    assert words_to_phones(["dog", "cat"], lex) == [3, 4, 0, 1, 2]
    with pytest.raises(KeyError):
        words_to_phones(["bird"], lex)

    text_file = tmp_path / "text"
    text_file.write_text("utt1 cat dog\nutt2 dog\n")
    trans = read_transcripts(str(text_file), lex)
    assert trans == {"utt1": [0, 1, 2, 3, 4], "utt2": [3, 4]}

    ids_file = tmp_path / "text_ids"
    ids_file.write_text("utt1 0 1 1\nutt2 2\n")
    assert read_transcripts(str(ids_file)) == {"utt1": [0, 1, 1],
                                               "utt2": [2]}
    with pytest.raises(ValueError, match="lexicon"):
        read_transcripts(str(text_file))  # words without a lexicon

    bad_lex = tmp_path / "bad.txt"
    bad_lex.write_text("wordonly\n")
    with pytest.raises(ValueError):
        read_lexicon(str(bad_lex))


def test_builder_input_validation():
    topo = ChainTopology(num_phones=3)
    with pytest.raises(ValueError):
        make_numerator_fst([], topo)
    with pytest.raises(ValueError):
        alignment_to_pdf_sequence([0, 1], [1], topo)
    with pytest.raises(ValueError):
        alignment_to_pdf_sequence([0], [0], topo)
    with pytest.raises(ValueError):
        estimate_phone_lm([[]])
    with pytest.raises(ValueError):
        estimate_phone_lm([[0, 7]], num_phones=4)
    lm = estimate_phone_lm([[0, 1, 2]], num_phones=3)
    with pytest.raises(ValueError):
        make_denominator_fst(lm, ChainTopology(num_phones=5))
    assert EOS not in range(lm.num_phones)

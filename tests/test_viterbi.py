"""Viterbi forced alignment (ops/viterbi.py) — the max-plus
counterpart of chain_function, closing the flat-start -> align ->
constrained-training loop together with graphs/builder.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from pychain_tpu import ChainGraph, ChainGraphBatch, viterbi_align
from pychain_tpu.graphs.builder import (ChainTopology,
                                        alignment_to_pdf_sequence,
                                        durations_from_alignment,
                                        make_numerator_fst)
from pychain_tpu.loss import chain_function
from pychain_tpu.utils.testgraphs import linear_fst, random_fst


def _batch(graphs):
    return ChainGraphBatch(
        graphs,
        max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))


def _brute_force_best(g, x_b):
    """Enumerate every path of length T through a compiled log-domain
    ChainGraph (float64) and return the best total score."""
    T = x_b.shape[0]
    trans = np.asarray(g.forward_transitions)
    probs = np.asarray(g.forward_transition_probs, np.float64)
    final = np.asarray(g.final_probs, np.float64)
    best = [float("-inf")]

    def walk(state, t, score):
        if t == T:
            if np.isfinite(final[state]):
                best[0] = max(best[0], score + final[state])
            return
        for k in range(trans.shape[0]):
            if trans[k, 0] == state:
                walk(int(trans[k, 1]), t + 1,
                     score + probs[k] + float(x_b[t, int(trans[k, 2])]))

    walk(int(g.start_state), 0, 0.0)
    return best[0]


def test_linear_graph_alignment_is_identity():
    rng = np.random.RandomState(0)
    P, T = 6, 9
    seq = rng.randint(0, P, size=T)
    g = ChainGraph(linear_fst(seq), log_domain=True)
    x = jnp.asarray(rng.randn(1, T, P).astype(np.float32))
    res = viterbi_align(x, np.array([T], np.int32), _batch([g]))
    assert bool(res.ok[0])
    np.testing.assert_array_equal(np.asarray(res.pdfs[0]), seq)
    np.testing.assert_array_equal(np.asarray(res.states[0]),
                                  np.arange(1, T + 1))
    expect = sum(np.asarray(x)[0, t, seq[t]] for t in range(T))
    np.testing.assert_allclose(float(res.objf[0]), expect, rtol=1e-5)


def test_matches_brute_force_on_random_graphs():
    rng = np.random.RandomState(1)
    T, P = 5, 4
    for seed in range(4):
        g = ChainGraph(random_fst(num_states=4, num_pdfs=P,
                                  max_arcs_per_state=2, seed=seed),
                       log_domain=True)
        x = rng.randn(1, T, P).astype(np.float32)
        res = viterbi_align(jnp.asarray(x), np.array([T], np.int32),
                            _batch([g]))
        expect = _brute_force_best(g, np.asarray(x[0], np.float64))
        np.testing.assert_allclose(float(res.objf[0]), expect, rtol=1e-5)


def test_viterbi_bounded_by_forward_and_score_consistent():
    """Best path <= logsumexp of all paths, and the returned alignment
    re-scores to exactly the returned objf (flat-start weights are 0)."""
    topo = ChainTopology(num_phones=5)
    rng = np.random.RandomState(2)
    phones = [3, 1, 4, 0]
    T = 14
    g = ChainGraph(make_numerator_fst(phones, topo), log_domain=True)
    x = jnp.asarray(rng.randn(1, T, topo.num_pdfs).astype(np.float32))
    lengths = np.array([T], np.int32)
    batch = _batch([g])
    res = viterbi_align(x, lengths, batch)
    total = float(chain_function(x, lengths, batch))
    assert float(res.objf[0]) <= total + 1e-4
    pdfs = np.asarray(res.pdfs[0])
    rescore = sum(np.asarray(x)[0, t, pdfs[t]] for t in range(T))
    np.testing.assert_allclose(float(res.objf[0]), rescore, rtol=1e-5)


def test_alignment_roundtrip_through_builder():
    """viterbi states -> durations -> pdf sequence reproduces the
    viterbi pdf sequence (the flat-start re-alignment loop)."""
    topo = ChainTopology(num_phones=4)
    rng = np.random.RandomState(3)
    phones = [2, 0, 1, 3, 1]
    T = 17
    g = ChainGraph(make_numerator_fst(phones, topo), log_domain=True)
    x = jnp.asarray(rng.randn(1, T, topo.num_pdfs).astype(np.float32))
    res = viterbi_align(x, np.array([T], np.int32), _batch([g]))
    durs = durations_from_alignment(np.asarray(res.states[0]))
    assert len(durs) == len(phones) and sum(durs) == T
    assert all(d >= 1 for d in durs)
    seq = alignment_to_pdf_sequence(phones, durs, topo)
    np.testing.assert_array_equal(np.asarray(res.pdfs[0]), seq)


def test_batch_unequal_lengths_match_individual():
    topo = ChainTopology(num_phones=4)
    rng = np.random.RandomState(4)
    specs = [([1, 2], 8), ([0, 3, 2], 11), ([2], 5)]
    graphs = [ChainGraph(make_numerator_fst(p, topo), log_domain=True)
              for p, _ in specs]
    lengths = np.array([t for _, t in specs], np.int32)
    T = int(lengths.max())
    x = jnp.asarray(rng.randn(3, T, topo.num_pdfs).astype(np.float32))
    res = viterbi_align(x, lengths, _batch(graphs))
    for b, (p, t) in enumerate(specs):
        solo = viterbi_align(x[b:b + 1, :t], np.array([t], np.int32),
                             _batch([graphs[b]]))
        np.testing.assert_allclose(float(res.objf[b]),
                                   float(solo.objf[0]), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(res.pdfs[b, :t]),
                                      np.asarray(solo.pdfs[0]))
        assert np.all(np.asarray(res.pdfs[b, t:]) == -1)


def test_infeasible_length_reports_not_ok():
    g = ChainGraph(linear_fst([0, 1, 2, 3]), log_domain=True)
    x = jnp.zeros((1, 6, 5), jnp.float32)
    res = viterbi_align(x, np.array([6], np.int32), _batch([g]))
    assert not bool(res.ok[0])
    assert np.isneginf(float(res.objf[0]))
    assert np.all(np.asarray(res.pdfs) == -1)


def test_shared_broadcast_batch():
    topo = ChainTopology(num_phones=3)
    g = ChainGraph(make_numerator_fst([0, 2, 1], topo), log_domain=True)
    rng = np.random.RandomState(5)
    B, T = 3, 9
    x = jnp.asarray(rng.randn(B, T, topo.num_pdfs).astype(np.float32))
    shared = viterbi_align(x, np.full(B, T, np.int32),
                           ChainGraphBatch(g, B))
    listed = viterbi_align(x, np.full(B, T, np.int32), _batch([g] * B))
    np.testing.assert_allclose(np.asarray(shared.objf),
                               np.asarray(listed.objf), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(shared.pdfs),
                                  np.asarray(listed.pdfs))


def test_prob_domain_graph_rejected():
    topo = ChainTopology(num_phones=3)
    from pychain_tpu.utils.testgraphs import denominator_fst
    den_fst, _ = denominator_fst(num_phones=4, states_per_phone=2, seed=0)
    den = ChainGraph(den_fst, log_domain=False)
    x = jnp.zeros((2, 4, 8), jnp.float32)
    with pytest.raises(ValueError, match="log-domain"):
        viterbi_align(x, np.array([4, 4], np.int32),
                      ChainGraphBatch(den, 2))


def test_durations_from_alignment_validation():
    with pytest.raises(ValueError):
        durations_from_alignment(np.array([[1, 1], [1, 2]]))
    with pytest.raises(ValueError):
        durations_from_alignment(np.array([2, 2, 3]))  # starts at 2
    with pytest.raises(ValueError):
        durations_from_alignment(np.array([1, 3]))     # jumps by 2
    assert durations_from_alignment(np.array([1, 1, 2, 3, 3, -1]),
                                    ) == [2, 1, 2]

def test_dense_and_sparse_sweeps_agree():
    """The dense max-plus sweep (broadcast masks) and the scatter
    segment_max sweep are the same recurrence on different hardware
    paths; objf and alignments must match exactly, mixed lengths and
    infeasible sequences included."""
    topo = ChainTopology(num_phones=4)
    rng = np.random.RandomState(7)
    graphs = [ChainGraph(make_numerator_fst([1, 2, 0], topo),
                         log_domain=True),
              ChainGraph(random_fst(num_states=6, num_pdfs=topo.num_pdfs,
                                    max_arcs_per_state=3, seed=3),
                         log_domain=True),
              ChainGraph(linear_fst([0, 1, 2, 3, 1, 0]),
                         log_domain=True)]
    lengths = np.array([11, 7, 6], np.int32)
    T = int(lengths.max())
    x = jnp.asarray(rng.randn(3, T, topo.num_pdfs).astype(np.float32))
    batch = _batch(graphs)
    d = viterbi_align(x, lengths, batch, dense_sweep=True)
    s = viterbi_align(x, lengths, batch, dense_sweep=False)
    np.testing.assert_allclose(np.asarray(d.objf), np.asarray(s.objf),
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(d.pdfs), np.asarray(s.pdfs))
    np.testing.assert_array_equal(np.asarray(d.states),
                                  np.asarray(s.states))
    np.testing.assert_array_equal(np.asarray(d.ok), np.asarray(s.ok))


def test_blockwise_dense_sweep_exact_parity(monkeypatch):
    """Tiled dense sweep (forced by a tiny TILE_BUDGET) must match the
    single-block dense sweep AND the scatter sweep exactly — scores,
    pdf paths, states, and the tie-break rule (highest arc id)."""
    import pychain_tpu.ops.viterbi as vt
    rng = np.random.RandomState(5)
    B, T, P = 4, 10, 6
    graphs = [ChainGraph(random_fst(num_states=9 + b, num_pdfs=P,
                                    max_arcs_per_state=4, seed=300 + b),
                         log_domain=True) for b in range(B)]
    batch = _batch(graphs)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([10, 8, 5, 2], np.int32)

    full = viterbi_align(x, lengths, batch, dense_sweep=True)
    scat = viterbi_align(x, lengths, batch, dense_sweep=False)
    monkeypatch.setattr(vt, "TILE_BUDGET", 1)   # force (8, 8) tiles
    tiled = viterbi_align(x, lengths, batch, dense_sweep=True)

    for res in (tiled,):
        np.testing.assert_allclose(np.asarray(res.objf),
                                   np.asarray(full.objf), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(res.pdfs),
                                      np.asarray(full.pdfs))
        np.testing.assert_array_equal(np.asarray(res.states),
                                      np.asarray(full.states))
    # and against the scatter sweep (identical tie-break by design)
    np.testing.assert_allclose(np.asarray(tiled.objf),
                               np.asarray(scat.objf), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(tiled.pdfs),
                                  np.asarray(scat.pdfs))
    np.testing.assert_array_equal(np.asarray(tiled.states),
                                  np.asarray(scat.states))


def test_pallas_sweep_exact_parity():
    """The Pallas max-plus sweep (per-graph VMEM-resident masks,
    interpret mode on CPU) must match the scatter sweep EXACTLY —
    objf to the ulp (same addition association), pdf paths, states,
    tie-break, and ok flags, with mixed lengths, per-utterance graphs,
    and an infeasible sequence in the batch."""
    rng = np.random.RandomState(17)
    B, T, P = 4, 9, 6
    graphs = [ChainGraph(random_fst(num_states=7 + b, num_pdfs=P,
                                    max_arcs_per_state=3, seed=70 + b),
                         log_domain=True) for b in range(B - 1)]
    graphs.append(ChainGraph(linear_fst([1, 2, 3]), log_domain=True))
    batch = _batch(graphs)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    # the linear graph only accepts length 3: last length 5 -> ok=False
    lengths = np.array([9, 7, 4, 5], np.int32)

    s = viterbi_align(x, lengths, batch, sweep="scatter")
    p = viterbi_align(x, lengths, batch, sweep="pallas")
    np.testing.assert_array_equal(np.asarray(s.objf), np.asarray(p.objf))
    np.testing.assert_array_equal(np.asarray(s.pdfs), np.asarray(p.pdfs))
    np.testing.assert_array_equal(np.asarray(s.states),
                                  np.asarray(p.states))
    np.testing.assert_array_equal(np.asarray(s.ok), np.asarray(p.ok))
    assert not bool(np.asarray(p.ok)[3])


def test_pallas_sweep_shared_batch_and_feasible_linear():
    """Shared broadcast batches and exactly-feasible linear graphs go
    through the Pallas sweep unchanged."""
    rng = np.random.RandomState(23)
    B, T, P = 3, 6, 5
    g = ChainGraph(linear_fst([0, 1, 2, 3, 4, 0]), log_domain=True)
    batch = ChainGraphBatch(g, B)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.full((B,), T, np.int32)
    s = viterbi_align(x, lengths, batch, sweep="scatter")
    p = viterbi_align(x, lengths, batch, sweep="pallas")
    np.testing.assert_array_equal(np.asarray(s.objf), np.asarray(p.objf))
    np.testing.assert_array_equal(np.asarray(s.pdfs), np.asarray(p.pdfs))
    assert np.all(np.asarray(p.ok))
    # identity alignment on a linear graph
    np.testing.assert_array_equal(np.asarray(p.pdfs),
                                  np.tile([0, 1, 2, 3, 4, 0], (B, 1)))


def test_sweep_auto_dispatch_policy(monkeypatch):
    """auto picks: single-block dense within TILE_BUDGET, pallas
    beyond it while the masks fit VMEM AND the backend is TPU,
    blockwise dense past the pallas budget, scatter past DENSE_MAX."""
    import pychain_tpu.ops.viterbi as vt
    calls = []
    real = vt._pallas_sweep
    monkeypatch.setattr(vt, "_pallas_sweep",
                        lambda *a, **k: (calls.append("pallas")
                                         or real(*a, **k)))
    monkeypatch.setattr(vt, "_tpu_backend", lambda: True)
    rng = np.random.RandomState(3)
    B, T, P = 2, 5, 4
    graphs = [ChainGraph(random_fst(num_states=6, num_pdfs=P,
                                    max_arcs_per_state=3, seed=9 + b),
                         log_domain=True) for b in range(B)]
    batch = _batch(graphs)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.full((B,), T, np.int32)

    viterbi_align(x, lengths, batch)            # tiny: dense, no pallas
    assert calls == []
    monkeypatch.setattr(vt, "TILE_BUDGET", 1)   # force past dense
    viterbi_align(x, lengths, batch)
    assert calls == ["pallas"]
    monkeypatch.setattr(vt, "_tpu_backend", lambda: False)
    viterbi_align(x, lengths, batch)            # off-TPU: never the
    assert calls == ["pallas"]                  # interpreted kernel
    monkeypatch.setattr(vt, "_tpu_backend", lambda: True)
    monkeypatch.setattr(vt, "fits_pallas_sweep", lambda s, k: False)
    monkeypatch.setattr(vt, "DENSE_MAX", 1)     # force past blockwise
    r = viterbi_align(x, lengths, batch)        # scatter fallback
    assert calls == ["pallas"] and np.all(np.asarray(r.ok))
    # forced pallas past the budget: clean error, never Mosaic
    with pytest.raises(ValueError, match="VMEM budget"):
        viterbi_align(x, lengths, batch, sweep="pallas")


def test_viterbi_rejects_out_of_range_lengths():
    rng = np.random.RandomState(5)
    B, T, P = 2, 6, 4
    graphs = [ChainGraph(random_fst(num_states=5, num_pdfs=P,
                                    max_arcs_per_state=3, seed=b),
                         log_domain=True) for b in range(B)]
    batch = _batch(graphs)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    with pytest.raises(ValueError, match="exceed the padded"):
        viterbi_align(x, np.array([6, 7], np.int32), batch)


def test_semiring_xl_rejects_out_of_range_lengths():
    from pychain_tpu.ops.semiring_xl import (forward_backward_semiring_xl,
                                             semiring_xl_arrays)
    rng = np.random.RandomState(5)
    B, T, P = 2, 6, 4
    graphs = [ChainGraph(random_fst(num_states=5, num_pdfs=P,
                                    max_arcs_per_state=3, seed=b),
                         log_domain=True) for b in range(B)]
    g = semiring_xl_arrays(_batch(graphs))
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    with pytest.raises(ValueError, match="exceed the padded"):
        forward_backward_semiring_xl(x, jnp.array([6, 7], jnp.int32), g)

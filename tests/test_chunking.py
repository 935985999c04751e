"""Fixed-width chunked chain supervision (data/chunking.py).

The key law: with exact (tolerance 0) supervision, the chunks'
objectives SUM to the whole utterance's aligned objective — the
aligned path's log-probability factorizes exactly across any frame
partition (all arc weights are 0, emissions are per-frame)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.data import ChunkPlan, chunk_alignment, chunk_supervision
from pychain_tpu.graphs import FST
from pychain_tpu.graphs.builder import (ChainTopology,
                                        alignment_to_pdf_sequence)
from pychain_tpu.loss import chain_function
from pychain_tpu.ops.leveled import is_leveled_graph
from pychain_tpu.ops.linear import is_linear_graph


def _objf(g, x, T):
    batch = ChainGraphBatch([g], max_num_transitions=g.num_transitions,
                            max_num_states=g.num_states)
    return float(chain_function(jnp.asarray(x),
                                np.array([T], np.int32), batch))


def test_chunk_plans_tile_the_utterance():
    phones = [3, 1, 4, 1, 5, 2]
    durs = [7, 3, 12, 4, 6, 8]       # T = 40
    plans = chunk_alignment(phones, durs, chunk_frames=15)
    assert [p.start_frame for p in plans] == [0, 15, 30]
    assert [p.num_frames for p in plans] == [15, 15, 10]
    assert sum(sum(p.durations) for p in plans) == 40
    for p in plans:
        assert sum(p.durations) == p.num_frames
        assert all(d >= 1 for d in p.durations)
    # chunk 1 starts at frame 15, inside phone 4 (frames 10..22)
    assert plans[1].first_is_continuation
    assert plans[1].phones[0] == 4
    assert not plans[0].first_is_continuation


def test_exact_chunks_sum_to_whole():
    rng = np.random.RandomState(0)
    topo = ChainTopology(num_phones=6)
    phones = [2, 0, 5, 1, 3]
    durs = [5, 9, 4, 11, 7]          # T = 36
    T = sum(durs)
    x = rng.randn(1, T, topo.num_pdfs).astype(np.float32)

    seq = alignment_to_pdf_sequence(phones, durs, topo)
    whole = _objf(ChainGraph(FST.linear(seq), log_domain=True), x, T)

    total = 0.0
    for plan in chunk_alignment(phones, durs, chunk_frames=10):
        g = ChainGraph(chunk_supervision(plan, topo, tolerance=0),
                       log_domain=True)
        assert is_linear_graph(g)
        xc = x[:, plan.start_frame:plan.start_frame + plan.num_frames]
        total += _objf(g, xc, plan.num_frames)
    np.testing.assert_allclose(total, whole, rtol=1e-5, atol=1e-4)


def test_tolerant_chunks_bound_exact():
    """tolerance > 0 admits strictly more paths per chunk, so each
    chunk objf >= the exact chunk objf; interior boundaries stay
    time-synchronous (leveled engine)."""
    rng = np.random.RandomState(1)
    topo = ChainTopology(num_phones=5)
    phones = [1, 4, 0, 2]
    durs = [6, 8, 7, 9]              # T = 30
    x = rng.randn(1, sum(durs), topo.num_pdfs).astype(np.float32)
    for plan in chunk_alignment(phones, durs, chunk_frames=12):
        xc = x[:, plan.start_frame:plan.start_frame + plan.num_frames]
        g0 = ChainGraph(chunk_supervision(plan, topo, tolerance=0),
                        log_domain=True)
        g2 = ChainGraph(chunk_supervision(plan, topo, tolerance=2),
                        log_domain=True)
        assert is_leveled_graph(g2)
        o0 = _objf(g0, xc, plan.num_frames)
        o2 = _objf(g2, xc, plan.num_frames)
        assert o0 <= o2 + 1e-4


def test_continuation_first_frame_emits_self_loop_pdf():
    topo = ChainTopology(num_phones=3)
    plan = ChunkPlan(start_frame=5, num_frames=4, phones=(2, 1),
                     durations=(2, 2), first_is_continuation=True)
    fst = chunk_supervision(plan, topo, tolerance=0)
    # frame 0: self-loop pdf of phone 2; frame 2: fwd pdf of phone 1
    assert fst.ilabels[0] - 1 == topo.self_pdf(2)
    seq = alignment_to_pdf_sequence(plan.phones, plan.durations, topo,
                                    first_is_continuation=True)
    assert seq[0] == topo.self_pdf(2)
    assert seq[2] == topo.fwd_pdf(1)


def test_min_tail_drops_short_remainder():
    plans = chunk_alignment([0, 1], [10, 3], chunk_frames=10, min_tail=5)
    assert len(plans) == 1 and plans[0].num_frames == 10
    plans = chunk_alignment([0, 1], [10, 7], chunk_frames=10, min_tail=5)
    assert len(plans) == 2 and plans[1].num_frames == 7


def test_chunking_validation():
    with pytest.raises(ValueError):
        chunk_alignment([0], [1, 2], 10)
    with pytest.raises(ValueError):
        chunk_alignment([0], [0], 10)
    with pytest.raises(ValueError):
        chunk_alignment([0], [5], 0)

"""XL one-hot semiring engine (cyclic log-domain graphs beyond the
dense one-hot budget) vs the gather engine.

The XL kernels (ops/semiring_xl.py) must reproduce the generic gather
engine on arbitrary cyclic / self-loop batches — the capability the
reference's log-domain CUDA kernels provide for any graph size
(chain-log-domain-kernels.cu:86-235).  Off-TPU the kernels run in the
Pallas interpreter, so tests use small graphs; the shapes still
exercise the padding (S to 8, K to 128), per-sequence lengths,
injection, and the chunked emission/posterior contractions.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pychain_tpu.loss as loss_mod
from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.graphs.fst import FST
from pychain_tpu.loss import chain_function, chain_function_with_aux, \
    dispatch_arrays
from pychain_tpu.ops import semiring_xl
from pychain_tpu.ops.fwdbwd import GraphArrays
from pychain_tpu.ops.semiring_xl import (
    SemiringXLArrays,
    emissions_chunked,
    fits_xl_budget,
    gamma_chunked,
)
from pychain_tpu.utils.testgraphs import random_fst


def _cyclic_batch(B=4, P=6, seed=0, ns=7):
    graphs = [ChainGraph(random_fst(num_states=ns + b, num_pdfs=P,
                                    seed=seed * 100 + b), log_domain=True)
              for b in range(B)]
    return ChainGraphBatch(
        graphs, max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))


def test_fits_xl_budget():
    assert fits_xl_budget(3100, 1000)          # the target class
    assert fits_xl_budget(48000, 128)
    assert not fits_xl_budget(48000, 3000)     # denominator-scale: no
    # bf16 masks double the eligible graph size vs f32 (S=2000, K=6000
    # fits at itemsize 2 and would not at 4)
    assert fits_xl_budget(6000, 2000)
    assert not fits_xl_budget(6000, 2000, itemsize=4)


def test_mask_dtype_tiers():
    """f32 masks while they fit (fastest, measured), bf16 beyond."""
    import jax.numpy as jnp
    from pychain_tpu.ops.semiring_xl import _mask_dtype
    assert _mask_dtype(1000, 3200) == jnp.float32    # the measured class
    assert _mask_dtype(2000, 6016) == jnp.bfloat16   # only fits at bf16


def test_forced_xl_matches_gather():
    rng = np.random.RandomState(0)
    B, T, P = 4, 11, 6
    batch = _cyclic_batch(B, P)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([11, 8, 5, 2], np.int32)

    _, rg = chain_function_with_aux(x, lengths, batch, impl="gather")
    _, rx = chain_function_with_aux(x, lengths, batch, impl="semiring_xl")
    assert isinstance(dispatch_arrays(batch, "semiring_xl"),
                      SemiringXLArrays)
    np.testing.assert_allclose(np.asarray(rx.objf), np.asarray(rg.objf),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rx.gamma), np.asarray(rg.gamma),
                               rtol=1e-4, atol=1e-6)
    # alpha*beta == sum(gamma) per frame in this engine (exactly the
    # same quantity); both must match the gather engine's gamma_sum
    np.testing.assert_allclose(np.asarray(rx.gamma_sum),
                               np.asarray(rg.gamma_sum),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rx.alpha_beta),
                               np.asarray(rx.gamma_sum), rtol=1e-5)
    assert np.all(np.asarray(rx.ok))


def test_xl_gradient_matches_gather():
    rng = np.random.RandomState(1)
    B, T, P = 3, 9, 5
    batch = _cyclic_batch(B, P, seed=7)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([9, 6, 3], np.int32)

    gg = jax.grad(lambda v: chain_function(v, lengths, batch,
                                           impl="gather"))(x)
    gx = jax.grad(lambda v: chain_function(v, lengths, batch,
                                           impl="semiring_xl"))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gg),
                               rtol=1e-4, atol=1e-6)


def test_xl_infeasible_sequence():
    """A graph whose only final state is unreachable within the given
    length must yield objf=-inf, zero posteriors, ok=False — matching
    the gather engine."""
    arcs = [(0, 1, 1, 1, 0.5), (1, 2, 2, 2, 0.5), (2, 3, 3, 3, 0.5)]
    fst = FST.from_arcs(4, 0, arcs, {3: 0.0})  # needs exactly 3 frames
    g = ChainGraph(fst, log_domain=True)
    batch = ChainGraphBatch([g, g], max_num_transitions=3,
                            max_num_states=4)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 5, 4).astype(np.float32))
    lengths = np.array([3, 2], np.int32)   # seq 1 cannot reach final

    _, rg = chain_function_with_aux(x, lengths, batch, impl="gather")
    _, rx = chain_function_with_aux(x, lengths, batch, impl="semiring_xl")
    assert np.isfinite(np.asarray(rx.objf)[0])
    assert np.asarray(rx.objf)[1] == -np.inf
    np.testing.assert_allclose(np.asarray(rx.objf)[0],
                               np.asarray(rg.objf)[0], rtol=1e-5)
    assert np.all(np.asarray(rx.gamma)[1] == 0.0)
    assert not np.asarray(rx.ok)[1]


def test_auto_fallback_warns_once(monkeypatch):
    """When a cyclic log-domain batch exceeds every fast-engine budget
    at impl='auto', the gather fallback must warn exactly once
    (VERDICT r2: the ~200x cliff was silent at verbose=0)."""
    import pychain_tpu.ops.semiring as sr
    monkeypatch.setattr(sr, "ONEHOT_BUDGET", 1)         # kill dense
    monkeypatch.setattr(semiring_xl, "XL_VMEM_BUDGET", 1)  # kill XL
    monkeypatch.setattr(semiring_xl, "XL_STREAM_MAX_S", 0)  # + stream
    monkeypatch.setattr(loss_mod, "_gather_fallback_warned", False)
    batch = _cyclic_batch()
    assert batch._semiring is None
    with pytest.warns(RuntimeWarning, match="gather engine"):
        g = dispatch_arrays(batch, "auto")
    assert isinstance(g, GraphArrays)
    # second dispatch: silent (already warned)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        dispatch_arrays(_cyclic_batch(seed=3), "auto")


def test_forced_xl_rejects_over_budget(monkeypatch):
    monkeypatch.setattr(semiring_xl, "XL_VMEM_BUDGET", 1)
    monkeypatch.setattr(semiring_xl, "XL_STREAM_MAX_S", 0)
    batch = _cyclic_batch()
    with pytest.raises(ValueError, match="semiring_xl"):
        dispatch_arrays(batch, "semiring_xl")


def test_chunked_contractions_match_direct(monkeypatch):
    """emissions/gamma chunked one-hot contractions vs direct gather /
    segment-sum, with a chunk budget small enough to force several
    batch chunks."""
    monkeypatch.setattr(semiring_xl, "CHUNK_BUDGET", 64)
    rng = np.random.RandomState(3)
    B, T, K, P = 5, 7, 9, 8
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    pdf = jnp.asarray(rng.randint(0, P, size=(B, K)), jnp.int32)

    em = emissions_chunked(x, pdf)
    ref = jnp.take_along_axis(
        x, jnp.broadcast_to(pdf[:, None, :], (B, T, K)), axis=2)
    np.testing.assert_allclose(np.asarray(em), np.asarray(ref), rtol=1e-6)

    occ = jnp.asarray(rng.rand(B, T, K).astype(np.float32))
    gm = gamma_chunked(occ, pdf, P)
    ref_g = jax.vmap(
        lambda o, p: jax.ops.segment_sum(o.T, p, num_segments=P).T
    )(occ, pdf)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(ref_g),
                               rtol=1e-5, atol=1e-6)


def _bigger_cyclic_batch(B=3, P=6, seed=21, ns=40, arcs=5):
    """K > 128 per graph so the streamed kernels get multiple chunks at
    kc=128."""
    graphs = [ChainGraph(random_fst(num_states=ns + b, num_pdfs=P,
                                    max_arcs_per_state=arcs,
                                    seed=seed * 100 + b), log_domain=True)
              for b in range(B)]
    return ChainGraphBatch(
        graphs, max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))


def test_fits_xl_stream():
    from pychain_tpu.ops.semiring_xl import fits_xl_stream, xl_chunk_arcs
    # the denominator-scale log-domain class the resident budget rejects
    assert not fits_xl_budget(49500, 3000)
    assert fits_xl_stream(49500, 3000)
    assert not fits_xl_stream(49500, 100000)
    kc = xl_chunk_arcs(49664, 3000)
    assert kc % 128 == 0 and kc >= 128
    # chunk masks fit the stream budget
    assert 2 * 3000 * kc * 4 <= semiring_xl.XL_STREAM_MASK_BUDGET


def test_streamed_xl_matches_gather(monkeypatch):
    """Force the streamed tier (resident budget killed, kc=128 ->
    multiple chunks) and check full parity vs the gather engine:
    objf, gamma, invariants, per-sequence lengths."""
    monkeypatch.setattr(semiring_xl, "XL_VMEM_BUDGET", 1)
    monkeypatch.setattr(semiring_xl, "XL_STREAM_MASK_BUDGET", 1)
    rng = np.random.RandomState(5)
    B, T, P = 3, 7, 6
    batch = _bigger_cyclic_batch(B, P)
    assert batch.num_transitions > 128, "must exercise multiple chunks"
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([7, 5, 2], np.int32)

    _, rg = chain_function_with_aux(x, lengths, batch, impl="gather")
    _, rx = chain_function_with_aux(x, lengths, batch, impl="semiring_xl")
    np.testing.assert_allclose(np.asarray(rx.objf), np.asarray(rg.objf),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rx.gamma), np.asarray(rg.gamma),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rx.gamma_sum),
                               np.asarray(rg.gamma_sum),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rx.alpha_beta),
                               np.asarray(rx.gamma_sum), rtol=1e-5)
    assert np.all(np.asarray(rx.ok))


def test_streamed_xl_remainder_padding(monkeypatch):
    """kc that does NOT divide K_pad: the entry pads the arc axis with
    inert arcs; results must match the resident kernels exactly."""
    rng = np.random.RandomState(6)
    B, T, P = 2, 6, 5
    batch = _bigger_cyclic_batch(B, P, seed=31)
    kp = (batch.num_transitions + 127) // 128 * 128
    assert kp % 256 != 0 or kp > 256, "fixture should leave a remainder"
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([6, 4], np.int32)

    _, r_res = chain_function_with_aux(x, lengths, batch,
                                       impl="semiring_xl")
    monkeypatch.setattr(semiring_xl, "XL_VMEM_BUDGET", 1)
    monkeypatch.setattr(semiring_xl, "xl_chunk_arcs", lambda k, s: 256)
    _, r_str = chain_function_with_aux(x, lengths, batch,
                                       impl="semiring_xl")
    np.testing.assert_allclose(np.asarray(r_str.objf),
                               np.asarray(r_res.objf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r_str.gamma),
                               np.asarray(r_res.gamma),
                               rtol=1e-5, atol=1e-7)


def test_streamed_xl_gradient(monkeypatch):
    monkeypatch.setattr(semiring_xl, "XL_VMEM_BUDGET", 1)
    monkeypatch.setattr(semiring_xl, "XL_STREAM_MASK_BUDGET", 1)
    rng = np.random.RandomState(7)
    B, T, P = 2, 5, 5
    batch = _bigger_cyclic_batch(B, P, seed=41)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([5, 3], np.int32)
    gg = jax.grad(lambda v: chain_function(v, lengths, batch,
                                           impl="gather"))(x)
    gx = jax.grad(lambda v: chain_function(v, lengths, batch,
                                           impl="semiring_xl"))(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gg),
                               rtol=1e-4, atol=1e-6)


def test_auto_dispatch_takes_streamed_xl(monkeypatch):
    """Beyond the resident budget but within the stream ceiling, a
    forced semiring_xl dispatch still builds (the class that used to
    fall to gather)."""
    monkeypatch.setattr(semiring_xl, "XL_VMEM_BUDGET", 1)
    batch = _bigger_cyclic_batch()
    g = dispatch_arrays(batch, "semiring_xl")
    assert isinstance(g, SemiringXLArrays)


def test_xl_batch_reorder_permutes_engine():
    """reorder() must permute the lazily-built XL arrays too, or a
    forced dispatch after reorder pairs graphs with wrong sequences."""
    rng = np.random.RandomState(4)
    B, T, P = 3, 8, 5
    batch = _cyclic_batch(B, P, seed=11)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([8, 8, 8], np.int32)
    dispatch_arrays(batch, "semiring_xl")   # builds + caches
    order = [2, 0, 1]
    batch.reorder(order)
    _, rx = chain_function_with_aux(x, lengths, batch, impl="semiring_xl")
    _, rg = chain_function_with_aux(x, lengths, batch, impl="gather")
    np.testing.assert_allclose(np.asarray(rx.objf), np.asarray(rg.objf),
                               rtol=1e-5, atol=1e-6)


def test_shared_log_domain_broadcast_reaches_xl():
    """A BROADCAST-built log-domain batch (shared graph, e.g. a
    denominator-scale graph trained in log domain) must reach the XL
    engine — the broadcast ctor used to strand every shared log-domain
    graph on the gather engine (round-4 fix).  Parity vs gather on the
    same batch, plus the streamed tier under a killed resident
    budget."""
    rng = np.random.RandomState(9)
    B, T, P = 3, 6, 6
    shared = ChainGraph(random_fst(num_states=9, num_pdfs=P, seed=77),
                        log_domain=True)
    batch = ChainGraphBatch(shared, B)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([6, 4, 6], np.int32)

    g = dispatch_arrays(batch, "semiring_xl")
    assert isinstance(g, SemiringXLArrays)
    assert g.src.shape[0] == B                  # tiled to (B, K_pad)
    _, rx = chain_function_with_aux(x, lengths, batch, impl="semiring_xl")
    _, rg = chain_function_with_aux(x, lengths, batch, impl="gather")
    np.testing.assert_allclose(np.asarray(rx.objf), np.asarray(rg.objf),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rx.gamma), np.asarray(rg.gamma),
                               rtol=1e-4, atol=1e-6)


def test_shared_log_domain_broadcast_streamed(monkeypatch):
    monkeypatch.setattr(semiring_xl, "XL_VMEM_BUDGET", 1)
    monkeypatch.setattr(semiring_xl, "XL_STREAM_MASK_BUDGET", 1)
    rng = np.random.RandomState(10)
    B, T, P = 2, 5, 5
    shared = ChainGraph(random_fst(num_states=8, num_pdfs=P, seed=78),
                        log_domain=True)
    batch = ChainGraphBatch(shared, B)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([5, 3], np.int32)
    _, rx = chain_function_with_aux(x, lengths, batch, impl="semiring_xl")
    _, rg = chain_function_with_aux(x, lengths, batch, impl="gather")
    np.testing.assert_allclose(np.asarray(rx.objf), np.asarray(rg.objf),
                               rtol=1e-5, atol=1e-6)


def test_shared_log_domain_broadcast_dense_engines():
    """The broadcast ctor runs the same engine detection as the list
    ctor for the special classes: a shared LINEAR graph builds the
    closed-form arrays (broadcast on device).  A shared CYCLIC graph
    no longer builds the dense semiring arrays — the factorized-log
    path serves it (round 5, ADVICE r4)."""
    from pychain_tpu.utils.testgraphs import linear_fst
    lin = ChainGraph(linear_fst([1, 2, 3]), log_domain=True)
    b_lin = ChainGraphBatch(lin, 3)
    assert b_lin._linear is not None
    assert b_lin._linear.pdf_seq.shape[0] == 3
    cyc = ChainGraph(random_fst(num_states=5, num_pdfs=4, seed=79),
                     log_domain=True)
    b_cyc = ChainGraphBatch(cyc, 3)
    assert b_cyc._semiring is None
    assert b_cyc._fact is not None and b_cyc._fact.log_semantics

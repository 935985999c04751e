"""Weight-streaming Pallas engine (ops/pallas_stream.py).

Parity against the XLA factorized oracle in f32 (same math, so tight
tolerances), chunk-boundary coverage (column runs split across streamed
chunks), dispatch tiering (fits_vmem fail + fits_stream pass ->
engine="stream"), and gradient flow through the custom_vjp core.

Kernels run in the Pallas interpreter off-TPU; the small graph is
forced onto the tile stratum (dense_min_fill > 1) so the stream path
is actually exercised.
"""

import dataclasses
import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pychain_tpu.graphs.factorize as fz
from pychain_tpu import ChainGraph, ChainGraphBatch, chain_function
from pychain_tpu.loss import dispatch_arrays
from pychain_tpu.ops.factorized import forward_backward_prob_fact
from pychain_tpu.ops.pallas_stream import (
    _WKStream, _coalesce_rows, fits_stream, forward_backward_prob_stream)
from pychain_tpu.utils.testgraphs import denominator_fst


@pytest.fixture(scope="module")
def setup():
    """A small denominator batch whose W1/W2/E matrices are forced onto
    the TILE stratum (no dense boxes), so the streamed chunks carry
    real work."""
    orig = fz._build_wparts
    fz._build_wparts = functools.partial(orig, dense_min_fill=2.0)
    try:
        rng = np.random.RandomState(0)
        B, T = 4, 10
        fst, P = denominator_fst(num_phones=256, states_per_phone=2,
                                 bigram_fanout=2, seed=0)
        den = ChainGraph(fst, log_domain=False)
        batch = ChainGraphBatch(den, B)
    finally:
        fz._build_wparts = orig
    fa = batch._fact
    assert fa.w1.tiles.shape[0] > 1, "fixture must exercise the stream"
    x = jnp.asarray(
        np.exp(rng.randn(B, T, P).astype(np.float32) * 0.3))
    lengths = jnp.asarray(np.array([T, T, T - 2, T - 5], np.int32))
    return batch, fa, x, lengths, P


@pytest.mark.parametrize("chunk_tiles", [2, 5, 1000])
def test_stream_parity_f32(setup, chunk_tiles):
    """f32 streamed kernels match the XLA factorized engine bit-tight
    (same arithmetic; chunk_tiles=2 splits column runs across chunk
    boundaries, 1000 runs single-chunk)."""
    batch, fa, x, lengths, P = setup
    ref = forward_backward_prob_fact(x, lengths, fa)
    got = forward_backward_prob_stream(x, lengths, fa,
                                       chunk_tiles=chunk_tiles)
    np.testing.assert_allclose(np.asarray(got.objf), np.asarray(ref.objf),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.gamma),
                               np.asarray(ref.gamma), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.alpha_beta),
                               np.asarray(ref.alpha_beta),
                               rtol=1e-4, atol=1e-5)
    assert bool(np.all(np.asarray(got.ok)))


def test_stream_grad_through_vjp(setup):
    """value+grad through the custom_vjp core with engine='stream'
    matches the factorized engine."""
    batch, fa, x, lengths, P = setup
    logx = jnp.log(x)
    fa_stream = dataclasses.replace(fa, engine="stream")
    v_ref, g_ref = jax.value_and_grad(
        lambda a: chain_function(a, lengths, fa))(logx)
    v_got, g_got = jax.value_and_grad(
        lambda a: chain_function(a, lengths, fa_stream))(logx)
    np.testing.assert_allclose(float(v_got), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_dispatch_tiering(setup, monkeypatch):
    """impl='pallas' beyond fits_vmem picks the streamed engine when
    fits_stream passes, the XLA engine when it fails."""
    import pychain_tpu.loss as loss_mod
    batch, fa, x, lengths, P = setup
    monkeypatch.setattr("pychain_tpu.ops.pallas_fact.fits_vmem",
                        lambda *a, **k: False)
    g = dispatch_arrays(batch, "pallas")
    assert g.engine == "stream"
    monkeypatch.setattr("pychain_tpu.ops.pallas_stream.fits_stream",
                        lambda *a, **k: False)
    g = dispatch_arrays(batch, "pallas")
    assert g.engine == "xla"


def test_fits_stream_gates(setup):
    """No tile stream (all-dense W1) or residual arcs -> not eligible."""
    batch, fa, x, lengths, P = setup
    assert fits_stream(fa)
    no_tiles = dataclasses.replace(
        fa, w1=dataclasses.replace(
            fa.w1, tiles=jnp.zeros((0, 128, 128), fa.w1.tiles.dtype),
            rows=(), cols=()))
    assert not fits_stream(no_tiles)
    residual = dataclasses.replace(
        fa, res_src=jnp.zeros(3, jnp.int32), res_dst=jnp.zeros(3, jnp.int32),
        res_pdf=jnp.zeros(3, jnp.int32), res_prob=jnp.zeros(3, jnp.float32))
    assert not fits_stream(residual)


def test_stream_budget_fallback(setup, monkeypatch):
    """When the fwd->bwd aux streams exceed the HBM budget, the entry
    falls back to the XLA factorized engine at trace time (same
    result, no pallas_call)."""
    batch, fa, x, lengths, P = setup
    monkeypatch.setattr("pychain_tpu.ops.pallas_stream.STREAM_BUDGET", 1)
    called = {}
    import pychain_tpu.ops.pallas_stream as ps
    orig = ps._fwd_stream
    monkeypatch.setattr(ps, "_fwd_stream",
                        lambda *a, **k: called.setdefault("hit", True)
                        or orig(*a, **k))
    ref = forward_backward_prob_fact(x, lengths, fa)
    got = ps.forward_backward_prob_stream(x, lengths, fa)
    assert "hit" not in called
    np.testing.assert_allclose(np.asarray(got.objf), np.asarray(ref.objf),
                               rtol=1e-6)


def test_wkstream_chunking_roundtrip(setup):
    """The chunked, reordered tile array reproduces W1 exactly: apply
    all chunks' metadata on the host and compare against the dense
    reconstruction of the original WArrays."""
    batch, fa, x, lengths, P = setup
    w = fa.w1
    wks = _WKStream(w, mm_dtype=jnp.float32, chunk_tiles=3)
    s_pad = fa.s_pad
    dense = np.zeros((s_pad, s_pad), np.float32)
    if w.diag is not None:
        dense[np.arange(s_pad), np.arange(s_pad)] += np.asarray(w.diag)
    tiles = np.asarray(w.tiles)
    for k in range(tiles.shape[0]):
        r, c = w.rows[k], w.cols[k]
        dense[r * 128:(r + 1) * 128, c * 128:(c + 1) * 128] += tiles[k]
    rebuilt = np.zeros_like(dense)
    if wks.has_diag:
        rebuilt[np.arange(s_pad), np.arange(s_pad)] += \
            np.asarray(wks.resident[0])[:, 0]
    chunked = np.asarray(wks.tiles)
    for gi, chunk in enumerate(wks.chunks):
        base = gi * wks.chunk_tiles
        for c, rows, start in chunk:
            for j, r in enumerate(rows):
                rebuilt[r * 128:(r + 1) * 128, c * 128:(c + 1) * 128] += \
                    chunked[base + start + j]
    np.testing.assert_array_equal(rebuilt, dense)


def test_coalesce_rows():
    assert _coalesce_rows((3, 4, 5, 9, 11, 12)) == [(0, 3, 3), (3, 9, 1),
                                                    (4, 11, 2)]
    assert _coalesce_rows(()) == []
    assert _coalesce_rows((7,)) == [(0, 7, 1)]

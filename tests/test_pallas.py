"""Pallas fused kernels vs the XLA factorized path.

On CPU CI the kernels run in Pallas interpreter mode (tiny shapes); on
TPU they compile for real.  Tolerances reflect the fast-mode bfloat16
quantisation of transition probs and streamed activations (~1e-3).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.loss import chain_function, chain_function_with_aux
from pychain_tpu.utils.testgraphs import denominator_fst, random_fst


def test_pallas_matches_xla_factorized():
    rng = np.random.RandomState(0)
    den_fst, P = denominator_fst(num_phones=10, states_per_phone=2, seed=0)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 4, 7
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([7, 5, 3, 1], np.int32)
    batch = ChainGraphBatch(den, B)

    _, ref = chain_function_with_aux(x, lengths, batch, impl="factorized")
    _, got = chain_function_with_aux(x, lengths, batch, impl="pallas")

    np.testing.assert_allclose(np.asarray(got.objf), np.asarray(ref.objf),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got.gamma),
                               np.asarray(ref.gamma), rtol=2e-2, atol=4e-3)
    assert np.all(np.asarray(got.ok))
    # invariants hold within the bf16 budget on active frames
    for b in range(B):
        for t in range(int(lengths[b])):
            assert abs(got.alpha_beta[b, t] - 1.0) < 2e-2
            assert abs(got.gamma_sum[b, t] - 1.0) < 2e-2
    # masked region exactly zero
    gam = np.asarray(got.gamma)
    for b in range(B):
        assert np.all(gam[b, lengths[b]:] == 0.0)


def test_pallas_gradient_path():
    rng = np.random.RandomState(1)
    den_fst, P = denominator_fst(num_phones=8, states_per_phone=2, seed=1)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 2, 5
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = jnp.array([5, 4], jnp.int32)
    batch = ChainGraphBatch(den, B)

    g_pal = jax.grad(lambda xx: chain_function(
        xx, lengths, batch, impl="pallas"))(x)
    g_ref = jax.grad(lambda xx: chain_function(
        xx, lengths, batch, impl="factorized"))(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=2e-2, atol=4e-3)


@pytest.mark.parametrize("fwd_mode,want_xsrc", [
    ("source", "identity"),
    ("cross", "matrix"),
    ("separate", "stream"),
])
def test_pallas_xsrc_modes(fwd_mode, want_xsrc):
    """All three x_src derivations (aliased to x_dst / one-hot state
    map / own gathered stream) must match the XLA factorized engine.
    "separate" mirrors Kaldi's real chain topology (self-loop pdf !=
    forward pdf)."""
    rng = np.random.RandomState(7)
    den_fst, P = denominator_fst(num_phones=9, states_per_phone=2,
                                 seed=7, forward_pdf_mode=fwd_mode)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 3, 6
    batch = ChainGraphBatch(den, B)
    assert batch._fact.xsrc_mode == want_xsrc
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([6, 4, 2], np.int32)

    _, ref = chain_function_with_aux(x, lengths, batch, impl="factorized")
    _, got = chain_function_with_aux(x, lengths, batch, impl="pallas")
    np.testing.assert_allclose(np.asarray(got.objf), np.asarray(ref.objf),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.gamma),
                               np.asarray(ref.gamma), rtol=1e-3, atol=1e-4)
    assert np.all(np.asarray(got.ok))

    g_pal = jax.grad(lambda xx: chain_function(
        xx, lengths, batch, impl="pallas"))(x)
    g_ref = jax.grad(lambda xx: chain_function(
        xx, lengths, batch, impl="factorized"))(x)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_pallas_rejects_residual_graphs():
    fst = random_fst(num_states=9, num_pdfs=6, max_arcs_per_state=4, seed=3)
    den = ChainGraph(fst, log_domain=False)
    batch = ChainGraphBatch(den, 2)
    if batch._fact.res_src.shape[0] == 0:
        pytest.skip("graph happened to factorize fully")
    with pytest.raises(ValueError, match="fully factorized"):
        chain_function(jnp.zeros((2, 4, 6)), jnp.array([4, 4]), batch,
                       impl="pallas")


def test_oversized_graph_falls_back_to_xla(monkeypatch):
    """Graphs whose stratified form exceeds the VMEM residency budget
    must dispatch to the XLA factorized engine instead of failing to
    compile (S~8k graphs need ~158 MB scoped VMEM on a 128 MB chip)."""
    import pychain_tpu.ops.pallas_fact as pf
    from pychain_tpu.loss import dispatch_arrays
    from pychain_tpu.ops.factorized import FactorizedArrays

    den_fst, P = denominator_fst(num_phones=8, states_per_phone=2, seed=0)
    den = ChainGraph(den_fst, log_domain=False)
    batch = ChainGraphBatch(den, 2, tile_dtype="bfloat16")

    g = dispatch_arrays(batch, impl="pallas")
    assert g.engine == "pallas"          # small graph: kernels
    assert pf.fits_vmem(batch._fact)     # real estimator: small fits

    monkeypatch.setattr(pf, "fits_vmem", lambda fa, b_tile=128: False)
    g2 = dispatch_arrays(batch, impl="pallas")
    assert isinstance(g2, FactorizedArrays) and g2.engine == "xla"


@pytest.mark.parametrize("fwd_mode", ["source", "separate"])
def test_pallas_lean_stream_mode_matches_full(fwd_mode):
    """The long-T "lean" stream mode (alpha stream only, bwd recomputes
    W1@alpha' and the emission rows) must match the default "full" mode
    exactly in f32 parity tiles — same math, different data movement."""
    from pychain_tpu.loss import dispatch_arrays
    from pychain_tpu.ops.pallas_fact import forward_backward_prob_pallas

    rng = np.random.RandomState(11)
    den_fst, P = denominator_fst(num_phones=8, states_per_phone=2,
                                 seed=11, forward_pdf_mode=fwd_mode)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 3, 6
    batch = ChainGraphBatch(den, B)
    fa = batch._fact
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    px = jnp.exp(jnp.clip(x, -30, 30))
    lengths = jnp.array([6, 4, 2], jnp.int32)

    full = forward_backward_prob_pallas(px, lengths, fa,
                                        stream_mode="full")
    lean = forward_backward_prob_pallas(px, lengths, fa,
                                        stream_mode="lean")
    np.testing.assert_allclose(np.asarray(lean.objf),
                               np.asarray(full.objf), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lean.gamma),
                               np.asarray(full.gamma),
                               rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(lean.ok))

    with pytest.raises(ValueError, match="stream_mode"):
        forward_backward_prob_pallas(px, lengths, fa, stream_mode="bogus")


@pytest.mark.parametrize("fwd_mode", ["source", "cross", "separate"])
def test_pallas_ckpt_stream_mode_matches_full(fwd_mode):
    """Checkpointed backward (sqrt(T) alpha snapshots + per-chunk
    forward replay) must be BIT-IDENTICAL to the full mode in f32
    parity tiles: same kernels, same arithmetic, different residency.
    Covers non-divisible T (T=11, C=4 -> padded to 12), unequal
    lengths, a single-chunk batch (C >= T), and the default C."""
    from pychain_tpu.ops.pallas_fact import forward_backward_prob_pallas

    rng = np.random.RandomState(7)
    den_fst, P = denominator_fst(num_phones=9, states_per_phone=2,
                                 seed=7, forward_pdf_mode=fwd_mode)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 3, 11
    batch = ChainGraphBatch(den, B)
    fa = batch._fact
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    px = jnp.exp(jnp.clip(x, -30, 30))
    lengths = jnp.array([11, 7, 2], jnp.int32)

    full = forward_backward_prob_pallas(px, lengths, fa,
                                        stream_mode="full")
    for chunk in (4, 64, None):
        ck = forward_backward_prob_pallas(px, lengths, fa,
                                          stream_mode="ckpt",
                                          ckpt_chunk=chunk)
        np.testing.assert_array_equal(np.asarray(ck.objf),
                                      np.asarray(full.objf))
        np.testing.assert_array_equal(np.asarray(ck.gamma),
                                      np.asarray(full.gamma))
        assert np.all(np.asarray(ck.ok))


def test_pallas_ckpt_bf16_within_snapshot_rounding():
    """With bfloat16 tiles the replayed alphas differ from the full
    mode only by snapshot rounding — same error class as the full
    mode's bf16 alpha stream."""
    from pychain_tpu.ops.pallas_fact import forward_backward_prob_pallas

    rng = np.random.RandomState(3)
    den_fst, P = denominator_fst(num_phones=8, states_per_phone=2, seed=3)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 2, 9
    batch = ChainGraphBatch(den, B, tile_dtype="bfloat16")
    fa = batch._fact
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    px = jnp.exp(jnp.clip(x, -30, 30))
    lengths = jnp.array([9, 5], jnp.int32)

    full = forward_backward_prob_pallas(px, lengths, fa,
                                        stream_mode="full")
    ck = forward_backward_prob_pallas(px, lengths, fa,
                                      stream_mode="ckpt", ckpt_chunk=4)
    np.testing.assert_allclose(np.asarray(ck.objf), np.asarray(full.objf),
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(ck.gamma),
                               np.asarray(full.gamma),
                               rtol=2e-2, atol=2e-2)
    assert np.all(np.asarray(ck.ok))


def test_pallas_auto_selects_ckpt_beyond_lean_budget(monkeypatch):
    """auto mode: full within STREAM_BUDGET, lean within LEAN_BUDGET,
    ckpt beyond both (very long T)."""
    import pychain_tpu.ops.pallas_fact as pf

    rng = np.random.RandomState(5)
    den_fst, P = denominator_fst(num_phones=8, states_per_phone=2, seed=5)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 2, 10
    batch = ChainGraphBatch(den, B)
    fa = batch._fact
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    px = jnp.exp(jnp.clip(x, -30, 30))
    lengths = jnp.array([10, 6], jnp.int32)

    full = pf.forward_backward_prob_pallas(px, lengths, fa)

    seen = {}
    real = pf._forward_backward_ckpt

    def spy(*a, **k):
        seen["ckpt"] = True
        return real(*a, **k)

    monkeypatch.setattr(pf, "_forward_backward_ckpt", spy)

    # full over budget, single alpha stream within -> lean
    row = T * fa.s_pad * B * 4
    monkeypatch.setattr(pf, "STREAM_BUDGET", row)   # < 3 streams
    monkeypatch.setattr(pf, "LEAN_BUDGET", row)     # >= 1 stream
    lean = pf.forward_backward_prob_pallas(px, lengths, fa)
    assert not seen.get("ckpt")
    np.testing.assert_array_equal(np.asarray(lean.objf),
                                  np.asarray(full.objf))

    # both budgets exceeded -> ckpt
    monkeypatch.setattr(pf, "STREAM_BUDGET", 1)
    monkeypatch.setattr(pf, "LEAN_BUDGET", 1)
    auto = pf.forward_backward_prob_pallas(px, lengths, fa)
    assert seen.get("ckpt")
    np.testing.assert_array_equal(np.asarray(auto.objf),
                                  np.asarray(full.objf))

    with pytest.raises(ValueError, match="ckpt_chunk"):
        pf.forward_backward_prob_pallas(px, lengths, fa,
                                        stream_mode="ckpt", ckpt_chunk=-4)
    with pytest.raises(ValueError, match="ckpt_chunk"):
        pf.forward_backward_prob_pallas(px, lengths, fa,
                                        stream_mode="ckpt", ckpt_chunk=0)


def test_pallas_debug_false_traces_frame0_only():
    """debug=False (the plain-objective path) must leave objf/gamma
    bit-identical and compute the invariant traces only at frame 0 —
    the reference's default (chain-computation.cc:337-338) — reporting
    exactly 1.0 elsewhere.  chain_function's gradient flows through
    the debug=False primal and must match the aux path's."""
    from pychain_tpu.ops.pallas_fact import forward_backward_prob_pallas

    rng = np.random.RandomState(9)
    den_fst, P = denominator_fst(num_phones=8, states_per_phone=2, seed=9)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 3, 7
    batch = ChainGraphBatch(den, B)
    fa = batch._fact
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    px = jnp.exp(jnp.clip(x, -30, 30))
    lengths = jnp.array([7, 5, 2], jnp.int32)

    dbg = forward_backward_prob_pallas(px, lengths, fa)
    fast = forward_backward_prob_pallas(px, lengths, fa, debug=False)
    np.testing.assert_array_equal(np.asarray(fast.objf),
                                  np.asarray(dbg.objf))
    np.testing.assert_array_equal(np.asarray(fast.gamma),
                                  np.asarray(dbg.gamma))
    ab = np.asarray(fast.alpha_beta)
    gs = np.asarray(fast.gamma_sum)
    np.testing.assert_allclose(ab[:, 0], np.asarray(dbg.alpha_beta)[:, 0],
                               rtol=1e-6)
    assert np.all(ab[:, 1:] == 1.0) and np.all(gs[:, 1:] == 1.0)
    assert np.all(np.asarray(fast.ok))

    # the public gradient path (debug=False primal) is unchanged
    g_fast = jax.grad(lambda xx: chain_function(
        xx, lengths, batch, impl="pallas"))(x)
    _, aux = chain_function_with_aux(x, lengths, batch, impl="pallas")
    np.testing.assert_array_equal(
        np.asarray(g_fast),
        np.asarray(aux.gamma))  # ct == 1.0: grad IS gamma


def test_auto_stream_mode_selection():
    """BASELINE config 5 sizing: "auto" must hand long-T batches to the
    lean/ckpt stream modes once the fwd->bwd streams blow the HBM
    budgets (VERDICT r2 weak #1)."""
    from pychain_tpu.ops.pallas_fact import select_stream_mode
    # headline (B=128 T=500 S=3000 bf16): everything fits -> full
    assert select_stream_mode(500, 3072, 128, 2, 3) == "full"
    # long-T config-5 at headline batch: 3 streams = 5.9 GB -> lean
    assert select_stream_mode(2500, 3072, 128, 2, 3) == "lean"
    # very long T: even one alpha stream exceeds LEAN_BUDGET -> ckpt
    assert select_stream_mode(6000, 3072, 128, 2, 3) == "ckpt"
    # default --long config (B=32 T=2500): fits full
    assert select_stream_mode(2500, 3072, 32, 2, 3) == "full"

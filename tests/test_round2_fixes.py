"""Regression tests for round-2 review findings (VERDICT.md / ADVICE.md).

* leveled dispatch must not silently drop intermediate final states,
* BLSTM must not read pad frames through the reversed recurrence,
* bucketer shuffling must differ across epochs,
* pad_to_bucket must reject (not truncate) over-long utterances,
* read_scp must accept bare rxfilenames without a :offset suffix,
* chain_function_with_aux must match the grad of chain_function
  (single-pass custom_vjp).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.graphs.fst import FST
from pychain_tpu.loss import chain_function, chain_function_with_aux
from pychain_tpu.utils.testgraphs import denominator_fst, linear_fst


def _early_final_fst(T=4, P=5):
    """Linear chain with an extra finite final prob at an intermediate
    state: sequences of length T-2 may legally terminate there."""
    arcs = [(t, t + 1, (t % P) + 1, (t % P) + 1, 0.5) for t in range(T)]
    finals = {T: 0.0, T - 2: 0.3}
    return FST.from_arcs(T + 1, 0, arcs, finals)


def test_leveled_rejects_intermediate_finals():
    from pychain_tpu.ops.leveled import is_leveled_graph
    g = ChainGraph(_early_final_fst(), log_domain=True)
    assert not is_leveled_graph(g)


def test_auto_dispatch_early_final_matches_gather():
    """ADVICE #1: auto dispatch returned objf=-inf for a short sequence
    on a graph with an intermediate final state; gather was correct."""
    rng = np.random.RandomState(0)
    T, P = 4, 5
    graphs = [ChainGraph(_early_final_fst(T, P), log_domain=True)
              for _ in range(2)]
    batch = ChainGraphBatch(graphs, max_num_transitions=T,
                            max_num_states=T + 1)
    x = jnp.asarray(rng.randn(2, T, P).astype(np.float32))
    lengths = jnp.array([T, T - 2], jnp.int32)

    auto = chain_function(x, lengths, batch, impl="auto")
    gather = chain_function(x, lengths, batch, impl="gather")
    assert np.isfinite(float(auto))
    np.testing.assert_allclose(float(auto), float(gather), rtol=1e-5)


def test_blstm_lengths_mask_padding():
    """A padded batch must match per-utterance unpadded outputs on the
    real frames (VERDICT weak #5: the reversed RNN used to consume pad
    frames first)."""
    from pychain_tpu.models import BLSTM, BLSTMConfig
    cfg = BLSTMConfig(num_pdfs=6, hidden_dim=8, num_layers=2, dropout=0.0)
    model = BLSTM(cfg)
    rng = np.random.RandomState(0)
    T, D = 9, 4
    lens = [9, 5, 7]
    feats = [rng.randn(t, D).astype(np.float32) for t in lens]
    padded = np.zeros((3, T, D), np.float32)
    for i, f in enumerate(feats):
        padded[i, :len(f)] = f
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(padded),
                        train=False, lengths=jnp.asarray(lens))
    out_b = model.apply(params, jnp.asarray(padded), train=False,
                        lengths=jnp.asarray(lens))
    for i, f in enumerate(feats):
        out_1 = model.apply(params, jnp.asarray(f)[None], train=False,
                            lengths=jnp.asarray([lens[i]]))
        np.testing.assert_allclose(np.asarray(out_b)[i, :lens[i]],
                                   np.asarray(out_1)[0], rtol=1e-4,
                                   atol=1e-5)


def test_bucketer_epochs_differ():
    from pychain_tpu.data.bucketing import BucketSpec, LengthBucketer
    bucketer = LengthBucketer(BucketSpec.linear(step=10, max_t=100),
                              shuffle=True, seed=7)
    lengths = np.random.RandomState(0).randint(5, 100, size=64)
    e0 = [g.tolist() for g in bucketer.batches(lengths, 8, epoch=0)]
    e1 = [g.tolist() for g in bucketer.batches(lengths, 8, epoch=1)]
    e0_again = [g.tolist() for g in bucketer.batches(lengths, 8, epoch=0)]
    assert e0 == e0_again          # deterministic per (seed, epoch)
    assert e0 != e1                # epochs reshuffle
    # same-size groups must not share one permutation within an epoch
    sizes = {}
    for g in e0:
        sizes.setdefault(len(g), []).append(sorted(range(len(g)),
                                                   key=g.__getitem__))
    full = sizes.get(8, [])
    assert len(set(map(tuple, full))) > 1


def test_pad_to_bucket_rejects_overlong():
    from pychain_tpu.data.bucketing import pad_to_bucket
    feats = [np.zeros((12, 3), np.float32), np.zeros((4, 3), np.float32)]
    with pytest.raises(ValueError, match="frames > bucket"):
        pad_to_bucket(feats, np.array([0, 1]), t_pad=8)


def test_read_scp_bare_path(tmp_path):
    from pychain_tpu.data.kaldi_features import read_scp
    scp = tmp_path / "feats.scp"
    scp.write_text("utt1 /data/feats.ark:1234\nutt2 /data/raw.mat\n"
                   "utt3 /data/odd:name.ark:77\n")
    entries = read_scp(str(scp))
    assert entries[0] == ("utt1", "/data/feats.ark", 1234)
    assert entries[1] == ("utt2", "/data/raw.mat", 0)
    assert entries[2] == ("utt3", "/data/odd:name.ark", 77)


def test_with_aux_single_pass_grad_matches():
    """The aux variant must produce the same gradient as the plain path
    (it used to run the fwd-bwd twice; now one custom_vjp serves both)."""
    rng = np.random.RandomState(3)
    den_fst, P = denominator_fst(num_phones=6, states_per_phone=2, seed=0)
    den = ChainGraph(den_fst)
    B, T = 2, 8
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    batch = ChainGraphBatch(den, B)

    g_plain = jax.grad(lambda xx: chain_function(xx, lengths, batch))(x)

    def objf_aux(xx):
        objf, _ = chain_function_with_aux(xx, lengths, batch)
        return objf
    v, g_aux = jax.value_and_grad(objf_aux)(x)
    assert np.isfinite(float(v))
    np.testing.assert_allclose(np.asarray(g_aux), np.asarray(g_plain),
                               rtol=1e-6, atol=1e-8)


def test_pdf_range_check_rejects_narrow_nnet_output():
    """Graphs referencing pdf ids beyond the nnet output width must be
    rejected at the public boundary instead of flowing through the
    emission gathers as silent NaN (the reference only asserts this in
    a debug build, fstext.cc:42)."""
    from pychain_tpu.graphs.fst import FST
    from pychain_tpu.loss import ChainLoss, chain_function_with_aux

    B, T, P = 2, 3, 4
    # labels P..P+T-1 -> pdf ids P-1..P+T-2, beyond a P-wide output
    wide = [ChainGraph(FST.linear([P + t for t in range(T)]),
                       log_domain=True) for _ in range(B)]
    batch = ChainGraphBatch(wide, max_num_states=T + 1,
                            max_num_transitions=T + 2)
    assert batch.num_pdfs == P + T
    x = jnp.zeros((B, T, P), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)
    with pytest.raises(ValueError, match="pdf ids up to"):
        chain_function(x, lengths, batch)
    with pytest.raises(ValueError, match="pdf ids up to"):
        chain_function_with_aux(x, lengths, batch)

    den_fst, DP = denominator_fst(num_phones=4, states_per_phone=2, seed=0)
    loss = ChainLoss(ChainGraph(den_fst))
    over = [ChainGraph(FST.linear([DP + t for t in range(T)]),
                       log_domain=True) for _ in range(B)]
    over_batch = ChainGraphBatch(over, max_num_states=T + 1,
                                 max_num_transitions=T + 2)
    with pytest.raises(ValueError, match="pdf ids up to"):
        loss(jnp.zeros((B, T, DP), jnp.float32), lengths, over_batch)

    # in-range graphs still pass (num_pdfs == nnet width is fine)
    ok = [ChainGraph(FST.linear(list(range(T))), log_domain=True)
          for _ in range(B)]
    ok_batch = ChainGraphBatch(ok, max_num_states=T + 1,
                               max_num_transitions=T + 2)
    assert ok_batch.num_pdfs <= P
    chain_function(x, lengths, ok_batch)


def test_chainloss_tile_dtype_fast_mode():
    """ChainLoss must be able to reach the benched bf16 fast path: the
    tile_dtype knob flows into the cached denominator batches, and the
    result stays within the bf16 budget of the default f32 mode."""
    rng = np.random.RandomState(5)
    from pychain_tpu.loss import ChainLoss
    den_fst, P = denominator_fst(num_phones=6, states_per_phone=2, seed=0)
    den = ChainGraph(den_fst)
    B, T = 2, 6
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    nums = [ChainGraph(linear_fst(rng.randint(0, P, size=T)),
                       log_domain=True) for _ in range(B)]
    num_batch = ChainGraphBatch(nums, max_num_states=T + 1,
                                max_num_transitions=T + 2)

    slow = ChainLoss(den)
    fast = ChainLoss(den, impl="pallas", tile_dtype="bfloat16")
    assert str(fast.den_batch(B)._fact.w1.tiles.dtype) == "bfloat16"
    assert fast.den_batch(B)._tile_dtype == "bfloat16"
    l_slow = float(slow(x, lengths, num_batch))
    l_fast = float(fast(x, lengths, num_batch))
    np.testing.assert_allclose(l_fast, l_slow, rtol=2e-2, atol=2e-2)


def test_chainloss_jit_then_eager_no_tracer_leak():
    """Calling a ChainLoss module first inside a caller's jit and then
    eagerly must work: the cached denominator batch is built under
    ensure_compile_time_eval so the first (traced) call cannot leak
    tracers into the cache."""
    rng = np.random.RandomState(6)
    from pychain_tpu.loss import ChainLoss
    den_fst, P = denominator_fst(num_phones=4, states_per_phone=2, seed=0)
    B, T = 2, 5
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    nums = [ChainGraph(linear_fst(rng.randint(0, P, size=T)),
                       log_domain=True) for _ in range(B)]
    num_batch = ChainGraphBatch(nums, max_num_states=T + 1,
                                max_num_transitions=T + 2)
    loss = ChainLoss(ChainGraph(den_fst))
    jitted = jax.jit(lambda xx: loss(xx, lengths, num_batch))
    v_jit = float(jitted(x))
    v_eager = float(loss(x, lengths, num_batch))  # used to raise
    np.testing.assert_allclose(v_eager, v_jit, rtol=1e-6)

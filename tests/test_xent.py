"""Cross-entropy regularization (chain_loss_xent) — the Kaldi chain
recipe's companion objective over the numerator posteriors."""

import numpy as np
import jax
import jax.numpy as jnp

from pychain_tpu import (ChainGraph, ChainGraphBatch, chain_loss,
                         chain_loss_xent)
from pychain_tpu.utils.testgraphs import denominator_fst, linear_fst


def _setup(B=3, T=8, seed=0):
    rng = np.random.RandomState(seed)
    den_fst, P = denominator_fst(num_phones=6, states_per_phone=2,
                                 seed=seed)
    den = ChainGraphBatch(ChainGraph(den_fst, log_domain=False), B)
    seqs = [rng.randint(0, P, size=T) for _ in range(B)]
    nums = [ChainGraph(linear_fst(s), log_domain=True) for s in seqs]
    num_b = ChainGraphBatch(
        nums, max_num_transitions=max(g.num_transitions for g in nums),
        max_num_states=max(g.num_states for g in nums))
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    xent_out = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.full(B, T, np.int32)
    return x, xent_out, lengths, num_b, den, seqs, P


def test_zero_regularizer_matches_chain_loss():
    x, xent_out, lengths, num_b, den, _, _ = _setup()
    loss, (mmi, xent) = chain_loss_xent(x, xent_out, lengths, num_b, den,
                                        xent_regularize=0.0)
    base = chain_loss(x, lengths, num_b, den)
    np.testing.assert_allclose(float(loss), float(base), rtol=1e-5)
    np.testing.assert_allclose(float(mmi), float(base), rtol=1e-5)
    assert float(xent) > 0.0  # CE against a proper posterior


def test_hard_alignment_reduces_to_frame_ce():
    """With linear numerators the posterior is one-hot at the aligned
    pdf, so the xent term is plain frame-level cross-entropy."""
    x, xent_out, lengths, num_b, den, seqs, P = _setup()
    _, (_, xent) = chain_loss_xent(x, xent_out, lengths, num_b, den)
    logp = np.asarray(jax.nn.log_softmax(xent_out, axis=-1))
    B, T = len(seqs), len(seqs[0])
    expect = -sum(logp[b, t, seqs[b][t]] for b in range(B)
                  for t in range(T)) / (B * T)
    np.testing.assert_allclose(float(xent), expect, rtol=1e-4)


def test_gradients_flow_and_targets_are_constant():
    x, xent_out, lengths, num_b, den, _, _ = _setup()

    def f(x, xo):
        loss, _ = chain_loss_xent(x, xo, lengths, num_b, den,
                                  xent_regularize=0.5)
        return loss

    gx, gxo = jax.grad(f, argnums=(0, 1))(x, xent_out)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gxo)).all()
    assert float(jnp.abs(gxo).max()) > 0.0
    # xent head gradient = (softmax - posterior) / frames * reg: its
    # per-frame sum is softmax_sum(1) - gamma_sum(1) = 0
    per_frame = np.asarray(gxo).sum(axis=-1)
    np.testing.assert_allclose(per_frame, 0.0, atol=1e-6)


def test_l2_regularizer():
    x, xent_out, lengths, num_b, den, _, _ = _setup()
    base, _ = chain_loss_xent(x, xent_out, lengths, num_b, den,
                              xent_regularize=0.0, l2_regularize=0.0)
    reg, _ = chain_loss_xent(x, xent_out, lengths, num_b, den,
                             xent_regularize=0.0, l2_regularize=0.01)
    expect_l2 = 0.5 * float(jnp.sum(jnp.square(x))) / lengths.sum()
    np.testing.assert_allclose(float(reg) - float(base),
                               0.01 * expect_l2, rtol=1e-4)


def test_padded_frames_contribute_nothing():
    x, xent_out, _, num_b, den, _, P = _setup()
    B, T = x.shape[0], x.shape[1]
    # lengths equal graph lengths here; shorten nothing — instead check
    # that perturbing xent_out has no effect where gamma is zero, by
    # using sequences shorter than T with matching shorter numerators
    rng = np.random.RandomState(1)
    T_short = T - 3
    seqs = [rng.randint(0, P, size=T_short) for _ in range(B)]
    from pychain_tpu.utils.testgraphs import linear_fst
    nums = [ChainGraph(linear_fst(s), log_domain=True) for s in seqs]
    num_s = ChainGraphBatch(
        nums, max_num_transitions=max(g.num_transitions for g in nums),
        max_num_states=max(g.num_states for g in nums))
    lengths = np.full(B, T_short, np.int32)
    loss1, _ = chain_loss_xent(x, xent_out, lengths, num_s, den)
    bumped = xent_out.at[:, T_short:].add(5.0)
    loss2, _ = chain_loss_xent(x, bumped, lengths, num_s, den)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)

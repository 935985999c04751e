"""Select-free Pallas TPU kernels for the one-hot semiring engine.

The XLA semiring path (ops/semiring.py) runs ~10 small ops per scan
step; at numerator sizes (S ~ 64, K ~ 128) every one of them is
dispatch-overhead-bound, not compute-bound.  These kernels run each
time sweep as ONE `pallas_call` with a sequential grid over frames:
the (K, S, B) one-hot selectors stay resident in VMEM across all T
steps and the alpha/beta carries live in VMEM scratch.

Design rule (measured on the factorized denominator kernels, see
docs/DESIGN.md "select discovery"): a single `jnp.where` with a
lane-varying condition serialises the Mosaic pipeline (+8 us/step).
The first version of these kernels carried log-space alpha/beta and
paid ~12 such selects per step (isfinite guards, -inf masking, length
freezing); it measured ~1.7x SLOWER than the XLA scan.  This version
is select-free:

* the carry is **normalised linear space**: alpha is divided by its
  sum every step (the log-domain recurrence of the reference,
  chain-log-domain-computation.cc:93-159, divides by the previous
  frame's logsumexp anyway, so the running scale cancels exactly and
  the per-step log alpha-sum is simply ``log(sum a_lin) + c_t``);
  beta is divided by its max, with the log scale carried as one
  (8, B) row;
* -inf guards vanish: dead probability mass is an exact linear 0 and
  stays 0 through every multiply-add; `log`/`exp` run only on (8, B)
  scalar rows, computed outside the kernels (forward) or on the row
  carry (backward);
* the per-sequence final-frame beta injection (BetaLastFrame,
  chain-log-domain-computation.cc:192-202) is a precomputed {0,1}
  multiply-add mask pair streamed as (T, 8, B) rows — exact, because
  one coefficient is always zero;
* length masking is unnecessary: before a sequence's injection frame
  its beta carry is exactly 0, so arc occupancies and the alpha*beta
  invariant are exactly 0 without any select (the junk alpha the
  forward keeps computing past T_b is never read).

Numerics: f32 throughout, max-shifted by the same per-frame arc max
``c_t`` as the XLA engine; the only formal difference is normalising
alpha by its sum (not its max), which is the same reals regrouped.
Infeasible sequences (alpha dies, objf = -inf) are detected host-side
from the streamed raw alpha sums; the kernels never see a -inf.
Gamma is the same deterministic one-hot contraction as the XLA engine
(replacing the reference's atomicLogAdd,
chain-log-domain-kernels.cu:161-235).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fwdbwd import FwdBwdResult, _ok_flags
from .pallas_fact import VMEM_LIMIT, _interpret
from .semiring import SemiringArrays, _emissions, _gamma_from_occ

NEG_INF = float("-inf")
TINY = 1e-37          # normalisation floor — must be a NORMAL f32:
                      # a subnormal floor (e.g. 1e-38) flushes to zero
                      # under FTZ, making log(max(m, TINY)) = -inf and
                      # the injection multiply-add -inf * 0 = nan
EXP_CLAMP = 80.0      # exp(scale) guard; overlap < e^-80 is f32 noise


def supports(g: SemiringArrays, batch: int | None = None) -> bool:
    """One-hots must fit VMEM next to the working set.

    The batch axis is the kernels' MINOR (lane) dim, so Mosaic pads it
    to a full 128-lane tile regardless of b_tile: a small batch does
    NOT shrink the resident (K, S, bt) blocks.  Pricing the unpadded
    bt admitted B=4 K=1320 S=80 (3.4 MB nominal) that compiled to
    154 MB of VMEM — a hard Mosaic OOM instead of an XLA fallback."""
    B, K, S = g.src_oh.shape
    sp = (S + 7) // 8 * 8                  # sublane padding
    return 2 * K * sp * 128 * 4 <= 48 * 1024 * 1024


# ----------------------------------------------------------------------
# Forward sweep
# ----------------------------------------------------------------------

def _fwd_kernel(n0_ref, src_ref, dst_ref, warc_ref, n_out, raw_out, nc):
    """Grid (nb, T).  Carry nc: (S, bt) linear alpha normalised to
    sum 1.  Per step: two (K, S, bt) VPU contractions, no selects."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        nc[:] = n0_ref[:]

    w = warc_ref[0]                                         # (K, bt)
    asel = jnp.sum(src_ref[:] * nc[:][None, :, :], axis=1)  # (K, bt)
    a_lin = jnp.sum(dst_ref[:] * (asel * w)[:, None, :], axis=0)
    raw = jnp.sum(a_lin, axis=0)                            # (bt,)
    n_new = a_lin * (1.0 / jnp.maximum(raw, TINY))[None, :]
    nc[:] = n_new
    n_out[0] = n_new
    raw_out[0, 0, :] = raw


def _fwd_pallas(g: SemiringArrays, warc_tm, n0_sb, b_tile):
    T, K, B = warc_tm.shape
    S = g.num_states
    nb = B // b_tile
    src_ksb = jnp.transpose(g.src_oh, (1, 2, 0))            # (K, S, B)
    dst_ksb = jnp.transpose(g.dst_oh, (1, 2, 0))

    in_specs = [
        pl.BlockSpec((S, b_tile), lambda b, t: (0, b),
                     memory_space=pltpu.VMEM),              # n0
        pl.BlockSpec((K, S, b_tile), lambda b, t: (0, 0, b),
                     memory_space=pltpu.VMEM),              # src one-hot
        pl.BlockSpec((K, S, b_tile), lambda b, t: (0, 0, b),
                     memory_space=pltpu.VMEM),              # dst one-hot
        pl.BlockSpec((1, K, b_tile), lambda b, t: (t, 0, b),
                     memory_space=pltpu.VMEM),              # arc weights
    ]
    out_specs = [
        pl.BlockSpec((1, S, b_tile), lambda b, t: (t, 0, b),
                     memory_space=pltpu.VMEM),              # alpha (norm.)
        pl.BlockSpec((1, 8, b_tile), lambda b, t: (t, 0, b),
                     memory_space=pltpu.VMEM),              # raw alpha sum
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, S, B), jnp.float32),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
    ]
    n_ys, raw8 = pl.pallas_call(
        _fwd_kernel,
        grid=(nb, T),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((S, b_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(n0_sb, src_ksb, dst_ksb, warc_tm)
    return n_ys, raw8[:, 0, :]


# ----------------------------------------------------------------------
# Backward sweep
# ----------------------------------------------------------------------

def _bwd_kernel(T, rows_ref, rf_ref, mf_ref, src_ref, dst_ref,
                warc_ref, n_prev_ref, n0_ref, occ_out, ab_out, rc, mc):
    """Grid (nb, T), reversed streams.  Carries: rc (S, bt) linear
    beta normalised to max 1; mc (8, bt) with row 0 = its log scale.
    rows: 0=inject, 1=1-inject, 2=c_t (+lz0 at u=0), 3=c_t - s_t."""
    gi = pl.program_id(1)
    u = T - 1 - gi

    @pl.when(gi == 0)
    def _():
        rc[:] = jnp.zeros(rc.shape, jnp.float32)
        mc[:] = jnp.zeros(mc.shape, jnp.float32)

    inj = rows_ref[0, 0, :]                                 # (bt,)
    inj_not = rows_ref[0, 1, :]
    c_row = rows_ref[0, 2, :]
    c_m_s = rows_ref[0, 3, :]

    # beta'(u+1): the carry, or exp(final - max final) at each
    # sequence's own final frame — exact multiply-add injection
    r_eff = rc[:] * inj_not[None, :] + rf_ref[:] * inj[None, :]
    m_eff = mc[0, :] * inj_not + mf_ref[0, :] * inj

    w = warc_ref[0]                                         # (K, bt)
    bsel = jnp.sum(dst_ref[:] * r_eff[None, :, :], axis=1)  # (K, bt)
    vf = w * bsel
    b_lin = jnp.sum(src_ref[:] * vf[:, None, :], axis=0)    # (S, bt)

    a_u = jnp.where(u == 0, n0_ref[:], n_prev_ref[0])       # scalar cond
    asel = jnp.sum(src_ref[:] * a_u[None, :, :], axis=1)    # (K, bt)

    # occ = alpha(u)[src] * arc * beta'(u+1)[dst], scale e; the clamp
    # only bites when the alpha/beta overlap is below e^-80 (f32 noise)
    e = jnp.exp(jnp.minimum(m_eff + c_row, EXP_CLAMP))      # (bt,)
    occ_out[0] = asel * vf * e[None, :]
    ab_out[0, 0, :] = jnp.sum(a_u * b_lin, axis=0) * e

    m = jnp.max(b_lin, axis=0)                              # (bt,)
    rc[:] = b_lin * (1.0 / jnp.maximum(m, TINY))[None, :]
    mc[0, :] = m_eff + c_m_s + jnp.log(jnp.maximum(m, TINY))


def _bwd_pallas(g: SemiringArrays, warc_tm, n_ys, n0_sb, rows, rf_sb,
                mf, b_tile):
    T, K, B = warc_tm.shape
    S = g.num_states
    nb = B // b_tile
    src_ksb = jnp.transpose(g.src_oh, (1, 2, 0))
    dst_ksb = jnp.transpose(g.dst_oh, (1, 2, 0))

    rev = lambda rows_: pl.BlockSpec((1, rows_, b_tile),
                                     lambda b, t: (T - 1 - t, 0, b),
                                     memory_space=pltpu.VMEM)
    rev_shift = pl.BlockSpec(
        (1, S, b_tile),
        lambda b, t: (jnp.maximum(T - 2 - t, 0), 0, b),
        memory_space=pltpu.VMEM)
    col = lambda rows_: pl.BlockSpec((rows_, b_tile),
                                     lambda b, t: (0, b),
                                     memory_space=pltpu.VMEM)

    in_specs = [
        rev(8),                                     # mask/scale rows
        col(S),                                     # rf (final linear)
        col(8),                                     # mf (final scale)
        pl.BlockSpec((K, S, b_tile), lambda b, t: (0, 0, b),
                     memory_space=pltpu.VMEM),      # src one-hot
        pl.BlockSpec((K, S, b_tile), lambda b, t: (0, 0, b),
                     memory_space=pltpu.VMEM),      # dst one-hot
        rev(K),                                     # arc weights
        rev_shift,                                  # alpha (u-1)
        col(S),                                     # alpha(0)
    ]
    out_specs = [
        rev(K),                                     # occ
        pl.BlockSpec((1, 8, b_tile), lambda b, t: (T - 1 - t, 0, b),
                     memory_space=pltpu.VMEM),      # alpha*beta
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, K, B), jnp.float32),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
    ]
    occ_ys, ab8 = pl.pallas_call(
        functools.partial(_bwd_kernel, T),
        grid=(nb, T),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((S, b_tile), jnp.float32),
                        pltpu.VMEM((8, b_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(rows, rf_sb, jnp.broadcast_to(mf[None, :], (8, B)),
      src_ksb, dst_ksb, warc_tm, n_ys, n0_sb)
    return occ_ys, ab8[:, 0, :]


# ----------------------------------------------------------------------
# Full fused fwd+bwd
# ----------------------------------------------------------------------

def forward_backward_semiring_pallas(x, lengths,
                                     g: SemiringArrays) -> FwdBwdResult:
    """Kernel-resident variant of forward_backward_semiring.  Same f32
    semantics (per-frame arbitrary scale, objf at each sequence's own
    length, -inf for infeasible sequences); the log-space bookkeeping
    runs host-side on (T, B) rows, the kernels are pure multiply-add."""
    B, T, P = x.shape
    S = g.num_states
    lengths = lengths.astype(jnp.int32)

    b_tile = min(128, B)
    while B % b_tile:
        b_tile //= 2

    # hoisted arc weights, max-shifted per (sequence, frame)
    em = _emissions(x, g)
    arc = g.logp[:, None, :] + em                           # (B, T, K)
    c = jnp.max(arc, axis=2)
    csafe = jnp.where(jnp.isfinite(c), c, 0.0)              # (B, T)
    warc_tm = jnp.transpose(jnp.exp(arc - csafe[:, :, None]),
                            (1, 2, 0))                      # (T, K, B)
    c_tm = jnp.transpose(csafe, (1, 0))                     # (T, B)

    # normalised linear initial state
    ei = jnp.exp(g.initial)                                 # (B, S)
    z0 = jnp.sum(ei, axis=1)
    lz0 = jnp.where(z0 > 0, jnp.log(jnp.maximum(z0, TINY)), 0.0)
    n0_sb = jnp.transpose(ei / jnp.maximum(z0, TINY)[:, None], (1, 0))

    n_ys, raw = _fwd_pallas(g, warc_tm, n0_sb, b_tile)      # (T,S,B),(T,B)

    # log alpha-sums recovered host-side; -inf marks dead frames
    s_ys = jnp.where(raw > 0,
                     jnp.log(jnp.maximum(raw, TINY)) + c_tm, NEG_INF)
    s_ys = s_ys.at[0].add(lz0)
    ts = jnp.arange(1, T + 1, dtype=jnp.int32)
    ll = jnp.where(ts[:, None] < lengths[None, :], s_ys, 0.0).sum(0)

    n_at = jnp.concatenate([n0_sb[None], n_ys], axis=0)     # (T+1, S, B)
    n_last = jnp.take_along_axis(
        n_at, lengths[None, None, :], axis=0)[0]            # (S, B)
    s_all = jnp.concatenate([lz0[None], s_ys], axis=0)      # (T+1, B)
    s_last = jnp.take_along_axis(s_all, lengths[None, :], axis=0)[0]

    final_sb = jnp.transpose(g.final, (1, 0))               # (S, B)
    fmax = jnp.max(final_sb, axis=0)
    fmaxs = jnp.where(jnp.isfinite(fmax), fmax, 0.0)
    efin = jnp.exp(final_sb - fmaxs[None, :])               # (S, B)
    tsum = jnp.sum(n_last * efin, axis=0)
    tlp = jnp.where(tsum > 0,
                    jnp.log(jnp.maximum(tsum, TINY)) + fmaxs + s_last,
                    NEG_INF)
    objf = ll + tlp

    # ----- backward prep: all selects happen here, outside the kernel
    alive = jnp.isfinite(tlp)
    rf_sb = jnp.where(alive[None, :], efin, 0.0)            # (S, B)
    mf = jnp.where(alive, fmaxs - tlp, 0.0)                 # (B,)

    inj = (lengths[None, :] == ts[:, None]).astype(jnp.float32)  # (T,B)
    # c_t - s_t with s_0 = 0 (cc:89) and dead frames floored so the
    # scale row stays bounded (dead rows are exact zeros regardless)
    s_scale = jnp.log(jnp.maximum(raw, TINY)) + c_tm
    s_shift = jnp.concatenate([jnp.zeros((1, B), jnp.float32),
                               s_scale[:-1]], axis=0)       # (T, B)
    c_row = c_tm.at[0].add(lz0)
    rows = jnp.stack([inj, 1.0 - inj, c_row, c_tm - s_shift], axis=1)
    rows = jnp.concatenate(
        [rows, jnp.zeros((T, 4, B), jnp.float32)], axis=1)  # (T, 8, B)

    occ_ys, ab = _bwd_pallas(g, warc_tm, n_ys, n0_sb, rows, rf_sb,
                             mf, b_tile)

    occ = jnp.transpose(occ_ys, (2, 0, 1))                  # (B, T, K)
    alpha_beta = jnp.transpose(ab, (1, 0))                  # (B, T)
    gamma = _gamma_from_occ(occ, g, P)
    gamma_sum = gamma.sum(axis=2)
    ok = _ok_flags(objf, alpha_beta, gamma_sum)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum)

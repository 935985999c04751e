"""Pallas TPU kernels for the one-hot semiring engine.

The XLA semiring path (ops/semiring.py) runs ~10 small ops per scan
step; at numerator sizes (S ~ 64, K ~ 128) every one of them is
dispatch-overhead-bound, not compute-bound.  These kernels run each
time sweep as ONE `pallas_call` with a sequential grid over frames:
the (K, S, B) one-hot selectors stay resident in VMEM across all T
steps, the alpha/beta carries live in VMEM scratch, and per-frame HBM
traffic is one streamed arc-score slice in and one alpha (forward) or
arc-occupancy (backward) slice out.

Layout: batch rides the 128-lane dimension everywhere — the per-frame
contractions are (K, S, B) elementwise multiplies with S- or K-axis
reductions on the VPU (the per-sequence one-hot matrices make this a
batched matvec, which cannot use the MXU; the VPU does it in a few
hundred cycles at these sizes).

Numerics are identical to the XLA engine (f32, exact max-shifted
linear-space log-semiring); gamma is the same deterministic post-scan
segment-sum.  Outside the kernels (XLA): the objf reduction and the
gamma scatter.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fwdbwd import FwdBwdResult, _ok_flags
from .pallas_fact import VMEM_LIMIT, _interpret
from .semiring import SemiringArrays, _emissions, _gamma_from_occ, _safe_log

NEG_INF = float("-inf")


def supports(g: SemiringArrays, batch: int | None = None) -> bool:
    """One-hots must fit VMEM next to the working set."""
    B, K, S = g.src_oh.shape
    bt = min(B if batch is None else batch, 128)
    return 2 * K * S * bt * 4 <= 48 * 1024 * 1024


def _shift0(a):
    """(exp(a - max), safe max) over axis 0."""
    m = jnp.max(a, axis=0)
    msafe = jnp.where(jnp.isfinite(m), m, 0.0)
    return jnp.exp(a - msafe[None, :]), msafe


def _guard_scale(logv, scale):
    return jnp.where(jnp.isfinite(scale)[None, :],
                     logv + jnp.where(jnp.isfinite(scale), scale,
                                      0.0)[None, :],
                     NEG_INF)


# ----------------------------------------------------------------------
# Forward sweep
# ----------------------------------------------------------------------

def _fwd_kernel(len_ref, init_ref, src_ref, dst_ref, arc_ref,
                a_out, s_out, ea, st):
    """Grid (nb, T).  Carries: ea (S, bt) linear alpha normalised to
    max 1; st rows: 0 = s_prev (log alpha-sum), 1 = ma (log max)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        ea0, ma0 = _shift0(init_ref[:])
        ea[:] = ea0
        st[0, :] = jnp.zeros_like(ma0)          # s0 := 0 (cc:89)
        st[1, :] = jnp.where(
            jnp.max(init_ref[:], axis=0) > NEG_INF, ma0, NEG_INF)

    arc_t = arc_ref[0]                          # (K, bt)
    c = jnp.max(arc_t, axis=0)
    csafe = jnp.where(jnp.isfinite(c), c, 0.0)
    w = jnp.exp(arc_t - csafe[None, :])

    # asel[k] = sum_s src[k,s] * ea[s]  (exp(alpha[src] - ma))
    asel = jnp.sum(src_ref[:] * ea[:][None, :, :], axis=1)   # (K, bt)
    contrib = asel * w
    a_lin = jnp.sum(dst_ref[:] * contrib[:, None, :], axis=0)  # (S, bt)

    s_prev = st[0, :]
    ma = st[1, :]
    scale = ma + csafe - s_prev
    a_log = _guard_scale(_safe_log(a_lin), scale)
    s_t = jnp.where(jnp.isfinite(scale),
                    _safe_log(jnp.sum(a_lin, axis=0)) + scale, NEG_INF)

    m_lin = jnp.max(a_lin, axis=0)
    m_safe = jnp.where(m_lin > 0, m_lin, 1.0)
    ea_t = a_lin / m_safe[None, :]
    ma_t = jnp.where(jnp.isfinite(scale) & (m_lin > 0),
                     jnp.log(m_safe) + scale, NEG_INF)

    active = len_ref[0, :] > t                  # t+1 <= T_b
    ea_new = jnp.where(active[None, :], ea_t, ea[:])
    ma_new = jnp.where(active, ma_t, ma)
    s_new = jnp.where(active, s_t, s_prev)
    ea[:] = ea_new
    st[0, :] = s_new
    st[1, :] = ma_new
    a_out[0] = _guard_scale(_safe_log(ea_new), ma_new)
    s_out[0, 0, :] = s_new


def _fwd_pallas(g: SemiringArrays, arc_tm, lengths, b_tile):
    T, K, B = arc_tm.shape
    S = g.num_states
    nb = B // b_tile
    src_ksb = jnp.transpose(g.src_oh, (1, 2, 0))   # (K, S, B)
    dst_ksb = jnp.transpose(g.dst_oh, (1, 2, 0))
    init_sb = jnp.transpose(g.initial, (1, 0))     # (S, B)

    whole = lambda shp: pl.BlockSpec(shp, lambda b, t: (0,) * len(shp),
                                     memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, b_tile), lambda b, t: (0, b),
                     memory_space=pltpu.VMEM),     # lengths
        pl.BlockSpec((S, b_tile), lambda b, t: (0, b),
                     memory_space=pltpu.VMEM),     # initial
        pl.BlockSpec((K, S, b_tile), lambda b, t: (0, 0, b),
                     memory_space=pltpu.VMEM),     # src one-hot
        pl.BlockSpec((K, S, b_tile), lambda b, t: (0, 0, b),
                     memory_space=pltpu.VMEM),     # dst one-hot
        pl.BlockSpec((1, K, b_tile), lambda b, t: (t, 0, b),
                     memory_space=pltpu.VMEM),     # arc scores
    ]
    out_specs = [
        pl.BlockSpec((1, S, b_tile), lambda b, t: (t, 0, b),
                     memory_space=pltpu.VMEM),     # alpha log
        pl.BlockSpec((1, 8, b_tile), lambda b, t: (t, 0, b),
                     memory_space=pltpu.VMEM),     # alpha-sum log
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, S, B), jnp.float32),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((S, b_tile), jnp.float32),      # ea carry
        pltpu.VMEM((8, b_tile), jnp.float32),      # s_prev / ma carry
    ]
    a_ys, s_ys8 = pl.pallas_call(
        _fwd_kernel,
        grid=(nb, T),
        in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(lengths.reshape(1, B).astype(jnp.int32), init_sb,
      src_ksb, dst_ksb, arc_tm)
    return a_ys, s_ys8[:, 0, :]


# ----------------------------------------------------------------------
# Backward sweep
# ----------------------------------------------------------------------

def _bwd_kernel(T, len_ref, tlp_ref, init_ref, final_ref, s_all_ref,
                src_ref, dst_ref, arc_ref, a_prev_ref,
                occ_out, ab_out, bl):
    """Grid (nb, T) with reversed streams.  Carry: bl (S, bt) log beta."""
    gi = pl.program_id(1)
    u = T - 1 - gi

    @pl.when(gi == 0)
    def _():
        bl[:] = jnp.full(bl.shape, NEG_INF, jnp.float32)

    lengths_v = len_ref[0, :]
    inject = lengths_v == (u + 1)
    b_fin = final_ref[:] - tlp_ref[0, :][None, :]
    b_eff = jnp.where(inject[None, :], b_fin, bl[:])

    eb, mb = _shift0(b_eff)
    bsel = jnp.sum(dst_ref[:] * eb[None, :, :], axis=1)     # (K, bt)

    arc_t = arc_ref[0]
    c = jnp.max(arc_t, axis=0)
    csafe = jnp.where(jnp.isfinite(c), c, 0.0)
    w = jnp.exp(arc_t - csafe[None, :])
    vf_lin = w * bsel

    b_lin = jnp.sum(src_ref[:] * vf_lin[:, None, :], axis=0)  # (S, bt)
    s_u = s_all_ref[pl.ds(u, 1), :][0]                      # (bt,)
    scale_b = mb + csafe - s_u
    b_t = _guard_scale(_safe_log(b_lin), scale_b)

    # alpha(u): streamed row u-1, or rebuilt from initial at u == 0
    a_u = jnp.where(u == 0, init_ref[:], a_prev_ref[0])
    ea, ma = _shift0(a_u)
    asel = jnp.sum(src_ref[:] * ea[None, :, :], axis=1)

    occ = jnp.exp(_guard_scale(_safe_log(vf_lin) + _safe_log(asel),
                               ma + mb + csafe - s_u))

    active = lengths_v > u
    b_new = jnp.where(active[None, :], b_t, b_eff)
    bl[:] = b_new
    occ_out[0] = jnp.where(active[None, :], occ, 0.0)
    ab_out[0, 0, :] = jnp.sum(jnp.exp(a_u + b_new), axis=0)


def _bwd_pallas(g: SemiringArrays, arc_tm, a_ys, s_all, lengths, tlp,
                b_tile):
    T, K, B = arc_tm.shape
    S = g.num_states
    nb = B // b_tile
    src_ksb = jnp.transpose(g.src_oh, (1, 2, 0))
    dst_ksb = jnp.transpose(g.dst_oh, (1, 2, 0))
    init_sb = jnp.transpose(g.initial, (1, 0))
    final_sb = jnp.transpose(g.final, (1, 0))

    rev = lambda rows: pl.BlockSpec((1, rows, b_tile),
                                    lambda b, t: (T - 1 - t, 0, b),
                                    memory_space=pltpu.VMEM)
    rev_shift = pl.BlockSpec(
        (1, S, b_tile),
        lambda b, t: (jnp.maximum(T - 2 - t, 0), 0, b),
        memory_space=pltpu.VMEM)
    col = lambda rows: pl.BlockSpec((rows, b_tile), lambda b, t: (0, b),
                                    memory_space=pltpu.VMEM)

    in_specs = [
        col(1),                                     # lengths
        col(1),                                     # tlp
        col(S), col(S),                             # initial, final
        pl.BlockSpec((T + 1, b_tile), lambda b, t: (0, b),
                     memory_space=pltpu.VMEM),      # s_all
        pl.BlockSpec((K, S, b_tile), lambda b, t: (0, 0, b),
                     memory_space=pltpu.VMEM),      # src one-hot
        pl.BlockSpec((K, S, b_tile), lambda b, t: (0, 0, b),
                     memory_space=pltpu.VMEM),      # dst one-hot
        rev(K),                                     # arc scores
        rev_shift,                                  # alpha (u-1)
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
        scratch_shapes=[pltpu.VMEM((S, b_tile), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(lengths.reshape(1, B).astype(jnp.int32),
      tlp.reshape(1, B).astype(jnp.float32),
      init_sb, final_sb, s_all, src_ksb, dst_ksb, arc_tm, a_ys)
    return occ_ys, ab8[:, 0, :]


# ----------------------------------------------------------------------
# Full fused fwd+bwd
# ----------------------------------------------------------------------

def forward_backward_semiring_pallas(x, lengths,
                                     g: SemiringArrays) -> FwdBwdResult:
    """Kernel-resident variant of forward_backward_semiring.  Same f32
    numerics; ~10x fewer dispatches per frame."""
    B, T, P = x.shape
    S = g.num_states
    K = g.logp.shape[1]
    lengths = lengths.astype(jnp.int32)

    b_tile = min(128, B)
    while B % b_tile:
        b_tile //= 2

    # hoisted arc scores (one one-hot contraction), streamed (T, K, B)
    em = _emissions(x, g)
    arc_tm = jnp.transpose(g.logp[:, None, :] + em, (1, 2, 0))

    a_ys, s_ys = _fwd_pallas(g, arc_tm, lengths, b_tile)

    s_all = jnp.concatenate(
        [jnp.zeros((1, B), jnp.float32), s_ys], axis=0)     # (T+1, B)
    ts = jnp.arange(1, T + 1, dtype=jnp.int32)
    ll = jnp.where(ts[:, None] < lengths[None, :],
                   jnp.where(jnp.isfinite(s_ys), s_ys, NEG_INF),
                   0.0).sum(0)

    init_sb = jnp.transpose(g.initial, (1, 0))[None]        # (1, S, B)
    a_at = jnp.concatenate([init_sb, a_ys], axis=0)         # (T+1, S, B)
    a_last = jnp.take_along_axis(
        a_at, lengths[None, None, :], axis=0)[0]            # (S, B)
    tlp = jax.nn.logsumexp(a_last + jnp.transpose(g.final, (1, 0)),
                           axis=0)
    objf = ll + tlp

    occ_ys, ab = _bwd_pallas(g, arc_tm, a_ys, s_all, lengths, tlp,
                             b_tile)

    occ = jnp.transpose(occ_ys, (2, 0, 1))                  # (B, T, K)
    alpha_beta = jnp.transpose(ab, (1, 0))                  # (B, T)
    gamma = _gamma_from_occ(occ, g, P)
    gamma_sum = gamma.sum(axis=2)
    ok = _ok_flags(objf, alpha_beta, gamma_sum)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum)

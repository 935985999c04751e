"""Stratified MXU forward-backward for the denominator (prob domain).

Consumes the factorized graph form built by
``pychain_tpu.graphs.factorize``: each transition matrix is stratified
into a diagonal (elementwise), one dense sub-block (a single MXU matmul
— the cross-phone block of a denominator graph), and a block-sparse
tile remainder.  The per-frame update runs entirely on MXU/VPU with
S-sized emission gathers; the occupation posteriors are S-sized
segment-sums — no K-sized gather/scatter anywhere.  Layout is
state-major (S_pad, B) so the batch rides the 128-lane dimension.

Semantics are identical to ``ops.fwdbwd.forward_backward_prob`` (the
reference recurrences, chain-computation.h:109-155) and are tested for
parity against it; only the evaluation strategy differs.  Used for
shared (broadcast) graphs — the ChainGraphBatch denominator case.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .fwdbwd import FwdBwdResult, _ok_flags


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class WArrays:
    """One stratified matrix on device (square W or rectangular E).

    Tile block coordinates are STATIC (python tuples): they define the
    program structure (which MXU tile matmuls exist), not runtime data.
    """
    diag: Optional[jax.Array]       # (S_pad,) or None (rectangular)
    dense: Optional[jax.Array]      # (R, C) or None
    tiles: jax.Array                # (n, 128, 128)
    rows: tuple = dataclasses.field(metadata=dict(static=True))
    cols: tuple = dataclasses.field(metadata=dict(static=True))
    dense_r0: int = dataclasses.field(metadata=dict(static=True))
    dense_c0: int = dataclasses.field(metadata=dict(static=True))
    out_rows: int = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FactorizedArrays:
    """Device pytree for the factorized denominator graph (shared across
    the batch).  State vectors are permuted+padded to S_pad."""
    w1: WArrays
    f_dst: jax.Array      # (S_pad,) pdf id feeding each state's W1 term
    e_f: WArrays          # one-hot (S_pad, P_pad): x_dst = E_f @ x_t
    w2: WArrays
    g_src: jax.Array
    e_g: WArrays
    w1t: WArrays          # transposed orientations for the beta sweep
    w2t: WArrays
    e_ft: WArrays         # gamma scatter: E_f^T @ c
    e_gt: WArrays
    initial: jax.Array    # (S_pad,)
    final: jax.Array
    leaky: jax.Array
    # residual arcs (generic gather path); zero-length for HMM topologies
    res_src: jax.Array
    res_dst: jax.Array
    res_pdf: jax.Array
    res_prob: jax.Array
    # which engine executes this graph: "xla" (default, f32 parity) or
    # "pallas" (fused VMEM-resident kernels, bf16 fast mode)
    engine: str = dataclasses.field(default="xla",
                                    metadata=dict(static=True))
    # emission-attachment structure: "identity" means g == f on W2's
    # support (x_src = x_dst; the Pallas backward merges the two gamma
    # scatters into one E_f^T).  Non-identity modes ("matrix"/"stream",
    # kept as diagnostics of how g relates to f) all compute
    # x_src = E_g @ px in-kernel.
    xsrc_mode: str = dataclasses.field(default="stream",
                                       metadata=dict(static=True))
    # True when this factorization serves a LOG-DOMAIN graph in
    # normalized-linear form (weights exp'd — exact for hard zeros).
    # Dispatch then forces leaky_coefficient=0 (graph.py:54-59 — no
    # leaky HMM in log domain) and guards infeasible sequences to the
    # log-engine contract (objf=-inf, gamma=0, ok=False).  The per-frame
    # normalization of the "version 3" recurrences provides the same
    # underflow protection the log-domain gather engine gets from its
    # per-frame logsumexp shifts.
    log_semantics: bool = dataclasses.field(default=False,
                                            metadata=dict(static=True))
    # (2,) f32 [arc_shift, const_shift] when the log_semantics weights
    # were re-centered into the f32 exp-safe band (unnormalized graphs:
    # exp of a log-weight outside ~[-87, 88] silently under/overflows —
    # ADVICE r4).  Every length-L path was rescaled by
    # exp(-(arc_shift*L + const_shift)); loss._run adds the correction
    # back onto objf.  None for graphs already inside the band.
    log_shifts: Optional[jax.Array] = None

    @property
    def s_pad(self) -> int:
        return self.initial.shape[0]

    @property
    def p_pad(self) -> int:
        return self.e_ft.out_rows


def _w_arrays(parts, td, out_rows) -> WArrays:
    return WArrays(
        diag=None if parts.diag is None else jnp.asarray(parts.diag),
        dense=None if parts.dense is None else jnp.asarray(parts.dense, td),
        tiles=jnp.asarray(parts.tiles, td),
        rows=tuple(int(r) for r in parts.rows),
        cols=tuple(int(c) for c in parts.cols),
        dense_r0=int(parts.dense_r0),
        dense_c0=int(parts.dense_c0),
        out_rows=int(out_rows),
    )


def _transpose_parts(parts):
    from ..graphs.factorize import WParts
    t = np.transpose(parts.tiles, (0, 2, 1))
    r, c = parts.cols, parts.rows
    order = np.argsort(r, kind="stable")
    return WParts(
        diag=parts.diag,
        dense=None if parts.dense is None else parts.dense.T.copy(),
        dense_r0=parts.dense_c0, dense_c0=parts.dense_r0,
        tiles=t[order], rows=r[order], cols=c[order])


def from_factorized_graph(fg, initial, final, leaky,
                          tile_dtype=None) -> FactorizedArrays:
    """Build device arrays from a host FactorizedGraph + the graph's
    (un-permuted) initial/final/leaky state vectors.

    tile_dtype: float32 (default, bit-parity with the reference) or
    bfloat16 (speed mode: native-rate MXU at ~0.4% relative quantisation
    of transition probs)."""
    from ..graphs.factorize import permute_state_vector

    td = jnp.dtype(tile_dtype) if tile_dtype is not None else jnp.float32
    one = jnp.float32  # E matrices are one-hot; keep them exact
    return FactorizedArrays(
        w1=_w_arrays(fg.w1, td, fg.s_pad),
        f_dst=jnp.asarray(fg.f_dst),
        e_f=_w_arrays(fg.e_f, one, fg.s_pad),
        w2=_w_arrays(fg.w2, td, fg.s_pad),
        g_src=jnp.asarray(fg.g_src),
        e_g=_w_arrays(fg.e_g, one, fg.s_pad),
        w1t=_w_arrays(_transpose_parts(fg.w1), td, fg.s_pad),
        w2t=_w_arrays(_transpose_parts(fg.w2), td, fg.s_pad),
        e_ft=_w_arrays(_transpose_parts(fg.e_f), one, fg.p_pad),
        e_gt=_w_arrays(_transpose_parts(fg.e_g), one, fg.p_pad),
        initial=jnp.asarray(permute_state_vector(fg, initial)),
        final=jnp.asarray(permute_state_vector(fg, final)),
        leaky=jnp.asarray(permute_state_vector(fg, leaky)),
        res_src=jnp.asarray(fg.res_src), res_dst=jnp.asarray(fg.res_dst),
        res_pdf=jnp.asarray(fg.res_pdf), res_prob=jnp.asarray(fg.res_prob),
        xsrc_mode=fg.xsrc_mode,
    )


def _mxu_precision(fa: "FactorizedArrays"):
    """f32 tiles mean f32 math: on TPU the MXU's DEFAULT precision
    rounds f32 operands to bfloat16 (~1e-3 relative), which would
    silently break the parity engine.  HIGH (bf16_3x) restores f32-
    grade results (measured ~8e-6 relative on the headline graph,
    ~10x inside the 1e-4 parity budget) at 3 MXU passes instead of
    HIGHEST's 6.  bf16 tiles are the explicit speed mode and keep the
    native single-pass rate."""
    if fa.w1.tiles.dtype == jnp.bfloat16:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGH


def _apply_w(w: WArrays, v, precision=jax.lax.Precision.HIGHEST):
    """W @ v for v (C_total, B) -> (w.out_rows, B):
    diagonal + dense block + sparse tiles."""
    c_total, B = v.shape
    if w.diag is not None:
        out = w.diag[:, None] * v
    else:
        out = jnp.zeros((w.out_rows, B), jnp.float32)
    if w.dense is not None:
        R, C = w.dense.shape
        block = jnp.dot(w.dense, v[w.dense_c0:w.dense_c0 + C].astype(
            w.dense.dtype), preferred_element_type=jnp.float32,
            precision=precision)
        out = out.at[w.dense_r0:w.dense_r0 + R].add(block)
    if w.tiles.shape[0] > 0:
        ntc = c_total // 128
        vt = v.astype(w.tiles.dtype).reshape(ntc, 128, B)
        cols = jnp.asarray(w.cols, jnp.int32)
        gathered = jnp.take(vt, cols, axis=0)               # (n, 128, B)
        prod = jnp.einsum("nij,njb->nib", w.tiles, gathered,
                          preferred_element_type=jnp.float32,
                          precision=precision)
        acc = jax.ops.segment_sum(prod, jnp.asarray(w.rows, jnp.int32),
                                  num_segments=w.out_rows // 128,
                                  indices_are_sorted=True)
        out = out + acc.reshape(w.out_rows, B)
    return out


def _residual_fwd(fa: FactorizedArrays, ad, x_t):
    """Generic gather-path term for residual arcs (usually empty)."""
    if fa.res_src.shape[0] == 0:
        return 0.0
    w = (jnp.take(ad, fa.res_src, axis=0) * fa.res_prob[:, None]
         * jnp.take(x_t, fa.res_pdf, axis=0))
    return jax.ops.segment_sum(w, fa.res_dst,
                               num_segments=fa.s_pad)


def forward_prob_fact(px_tm, lengths, fa: FactorizedArrays,
                      leaky_coefficient):
    """Alpha sweep.  px_tm: (T, P, B) exp'd nnet output, time-major,
    pdf-major.  Returns (alpha_dash (T+1, S_pad, B), alpha_sums (T+1, B),
    objf (B,), tot_prob (B,))."""
    T, P, B = px_tm.shape
    s_pad = fa.s_pad
    leaky = fa.leaky[:, None]
    prec = _mxu_precision(fa)

    alpha0 = jnp.broadcast_to(fa.initial[:, None], (s_pad, B))
    s0 = alpha0.sum(axis=0)
    ad0 = alpha0 + leaky_coefficient * s0[None, :] * leaky

    ts = jnp.arange(1, T + 1, dtype=lengths.dtype)

    def step(carry, xs):
        ad_prev, s_prev, loglike, ad_last = carry
        px_t, t = xs
        x_dst = _apply_w(fa.e_f, px_t, prec)              # (S_pad, B)
        # identity mode: g == f on W2's support, and W2 zeroes the
        # off-support columns, so x_dst serves as x_src
        x_src = (x_dst if fa.xsrc_mode == "identity"
                 else _apply_w(fa.e_g, px_t, prec))
        a = x_dst * _apply_w(fa.w1, ad_prev, prec)
        a = a + _apply_w(fa.w2, x_src * ad_prev, prec)
        a = a + _residual_fwd(fa, ad_prev, px_t)
        a = a / s_prev[None, :]
        s_t = a.sum(axis=0)
        ad_t = a + leaky_coefficient * s_t[None, :] * leaky
        active = t <= lengths
        loglike = loglike + jnp.where(
            t < lengths, jnp.log(jnp.where(s_t > 0, s_t, 1.0)), 0.0)
        ad_new = jnp.where(active[None, :], ad_t, ad_prev)
        s_new = jnp.where(active, s_t, s_prev)
        # alpha' at each sequence's own final frame, captured in the
        # carry: a post-hoc take_along_axis would re-read the whole
        # (T+1, S_pad, B) history from HBM
        ad_last = jnp.where((t == lengths)[None, :], ad_new, ad_last)
        return (ad_new, s_new, loglike, ad_last), (ad_new, s_new)

    loglike0 = jnp.log(s0)
    (_, _, loglike, ad_last), (ad_ys, s_ys) = jax.lax.scan(
        step, (ad0, s0, loglike0, ad0), (px_tm, ts))

    alpha_dash = jnp.concatenate([ad0[None], ad_ys], axis=0)
    alpha_sums = jnp.concatenate([s0[None], s_ys], axis=0)

    tot_prob = (ad_last * fa.final[:, None]).sum(axis=0)
    objf = loglike + jnp.log(tot_prob)
    return alpha_dash, alpha_sums, objf, tot_prob


def backward_prob_fact(px_tm, lengths, fa: FactorizedArrays,
                       leaky_coefficient, alpha_dash, alpha_sums, tot_prob,
                       num_pdfs: int):
    """Beta sweep + posteriors.  Returns (gamma (T, P, B), alpha_beta
    (B, T), gamma_sum (B, T))."""
    T, P, B = px_tm.shape
    s_pad = fa.s_pad
    leaky = fa.leaky[:, None]
    final = fa.final[:, None]
    prec = _mxu_precision(fa)
    bd_final = final / tot_prob[None, :]

    ts = jnp.arange(T - 1, -1, -1, dtype=lengths.dtype)
    xs = (px_tm[::-1], alpha_dash[:T][::-1], alpha_sums[:T][::-1], ts)

    def step(bd_next, xs):
        px_t, ad_t, s_t, t = xs
        inject = (lengths == t + 1)
        bd_eff = jnp.where(inject[None, :], bd_final, bd_next)
        b_next = bd_eff + leaky_coefficient * (
            (bd_eff * leaky).sum(axis=0, keepdims=True))
        x_dst = _apply_w(fa.e_f, px_t, prec)
        x_src = (x_dst if fa.xsrc_mode == "identity"
                 else _apply_w(fa.e_g, px_t, prec))
        inv_s = 1.0 / s_t[None, :]

        xb = x_dst * b_next                                 # (S_pad, B)
        w1t_term = _apply_w(fa.w1t, xb, prec)
        w2t_term = _apply_w(fa.w2t, b_next, prec)
        bd_t = (w1t_term + x_src * w2t_term) * inv_s

        # posteriors: pdf-attachment scatters as transposed E matmuls.
        # In identity mode c2 is zero off W2's support where g == f, so
        # one E_f^T scatter of the combined mass replaces the pair.
        w1_fwd = _apply_w(fa.w1, ad_t, prec)
        c1 = xb * w1_fwd * inv_s                            # per-dst mass
        c2 = x_src * ad_t * w2t_term * inv_s                # per-src mass
        if fa.xsrc_mode == "identity":
            gamma_t = _apply_w(fa.e_ft, c1 + c2, prec)
        else:
            gamma_t = _apply_w(fa.e_ft, c1, prec) \
                + _apply_w(fa.e_gt, c2, prec)

        if fa.res_src.shape[0] > 0:
            vf = (fa.res_prob[:, None]
                  * jnp.take(b_next, fa.res_dst, axis=0)
                  * jnp.take(px_t, fa.res_pdf, axis=0))
            bd_t = bd_t + jax.ops.segment_sum(
                vf, fa.res_src, num_segments=s_pad) * inv_s
            occ = jnp.take(ad_t, fa.res_src, axis=0) * inv_s
            gamma_t = gamma_t + jax.ops.segment_sum(
                vf * occ, fa.res_pdf, num_segments=fa.p_pad)

        active = (t < lengths)
        bd_new = jnp.where(active[None, :], bd_t, bd_eff)
        gamma_t = jnp.where(active[None, :], gamma_t, 0.0)
        ab = (ad_t * bd_new).sum(axis=0)
        gs = gamma_t.sum(axis=0)
        return bd_new, (gamma_t, ab, gs)

    _, (gamma_rev, ab_rev, gs_rev) = jax.lax.scan(
        step, jnp.zeros((s_pad, px_tm.shape[2]), px_tm.dtype), xs)
    gamma_tm = gamma_rev[::-1]                              # (T, P, B)
    alpha_beta = jnp.swapaxes(ab_rev[::-1], 0, 1)           # (B, T)
    gamma_sum = jnp.swapaxes(gs_rev[::-1], 0, 1)
    return gamma_tm, alpha_beta, gamma_sum


def px_time_major(px, fa: FactorizedArrays, dtype=None):
    """(B, T, P) -> (T, P_eff, B), pdf axis zero-padded to a lane
    multiple covering the graph's E matrices.  Shared by the XLA and
    Pallas engines so the lane-padding rule cannot drift between them.
    """
    B, T, P = px.shape
    p_eff = max(-(-P // 128) * 128, fa.p_pad)
    px_tm = jnp.transpose(px, (1, 2, 0))                    # (T, P, B)
    if dtype is not None:
        px_tm = px_tm.astype(dtype)
    if p_eff != P:
        px_tm = jnp.pad(px_tm, ((0, 0), (0, p_eff - P), (0, 0)))
    return px_tm


def forward_backward_prob_fact(px, lengths, fa: FactorizedArrays,
                               leaky_coefficient=1e-5) -> FwdBwdResult:
    """Fused fwd+bwd on the factorized graph.  px: (B, T, P) exp'd
    output; gamma is returned in (B, T, P)."""
    B, T, P = px.shape
    px_tm = px_time_major(px, fa)
    alpha_dash, alpha_sums, objf, tot_prob = forward_prob_fact(
        px_tm, lengths, fa, leaky_coefficient)
    gamma_tm, alpha_beta, gamma_sum = backward_prob_fact(
        px_tm, lengths, fa, leaky_coefficient, alpha_dash, alpha_sums,
        tot_prob, P)
    if gamma_tm.shape[1] < P:
        gamma_tm = jnp.pad(gamma_tm,
                           ((0, 0), (0, P - gamma_tm.shape[1]), (0, 0)))
    elif gamma_tm.shape[1] > P:
        gamma_tm = gamma_tm[:, :P, :]
    gamma = jnp.transpose(gamma_tm, (2, 0, 1))              # (B, T, P)
    ok = _ok_flags(objf, alpha_beta, gamma_sum)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum,
                        gamma_tm=gamma_tm)

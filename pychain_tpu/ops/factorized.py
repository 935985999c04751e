"""Block-sparse MXU forward-backward for the denominator (prob domain).

Consumes the factorized graph form built by
``pychain_tpu.graphs.factorize``: the per-frame arc sweep becomes
batched 128x128 tile matmuls (MXU) plus S-sized emission gathers, and
the occupation posteriors become S-sized segment-sums — no K-sized
gather/scatter anywhere.  Layout is state-major (S_pad, B) so the batch
rides the 128-lane dimension.

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
class FactorizedArrays:
    """Device pytree for the factorized denominator graph (shared across
    the batch).  State vectors are permuted+padded to S_pad; tiles are
    (n, 128, 128) with block row/col index vectors, sorted by row."""
    w1_tiles: jax.Array
    w1_rows: jax.Array
    w1_cols: jax.Array
    f_dst: jax.Array      # (S_pad,) pdf id feeding each state's W1 term
    w2_tiles: jax.Array
    w2_rows: jax.Array
    w2_cols: jax.Array
    g_src: jax.Array
    # transposed orientations for the beta sweep
    w1t_tiles: jax.Array
    w1t_rows: jax.Array
    w1t_cols: jax.Array
    w2t_tiles: jax.Array
    w2t_rows: jax.Array
    w2t_cols: jax.Array
    initial: jax.Array    # (S_pad,)
    final: jax.Array
    leaky: jax.Array
    # residual arcs (generic gather path); zero-length for HMM topologies
    res_src: jax.Array
    res_dst: jax.Array
    res_pdf: jax.Array
    res_prob: jax.Array

    @property
    def s_pad(self) -> int:
        return self.initial.shape[0]


def from_factorized_graph(fg, initial, final, leaky) -> FactorizedArrays:
    """Build device arrays from a host FactorizedGraph + the graph's
    (un-permuted) initial/final/leaky state vectors."""
    from ..graphs.factorize import permute_state_vector

    def tr(tiles, rows, cols):
        """Transpose a block-sparse matrix: swap tile indices, transpose
        each tile, re-sort by the new row index."""
        t = np.transpose(tiles, (0, 2, 1))
        r, c = cols, rows
        order = np.argsort(r * (fg.s_pad // 128) + c, kind="stable")
        return t[order], r[order], c[order]

    w1t, w1t_r, w1t_c = tr(fg.w1_tiles, fg.w1_rows, fg.w1_cols)
    w2t, w2t_r, w2t_c = tr(fg.w2_tiles, fg.w2_rows, fg.w2_cols)
    return FactorizedArrays(
        w1_tiles=jnp.asarray(fg.w1_tiles), w1_rows=jnp.asarray(fg.w1_rows),
        w1_cols=jnp.asarray(fg.w1_cols), f_dst=jnp.asarray(fg.f_dst),
        w2_tiles=jnp.asarray(fg.w2_tiles), w2_rows=jnp.asarray(fg.w2_rows),
        w2_cols=jnp.asarray(fg.w2_cols), g_src=jnp.asarray(fg.g_src),
        w1t_tiles=jnp.asarray(w1t), w1t_rows=jnp.asarray(w1t_r),
        w1t_cols=jnp.asarray(w1t_c),
        w2t_tiles=jnp.asarray(w2t), w2t_rows=jnp.asarray(w2t_r),
        w2t_cols=jnp.asarray(w2t_c),
        initial=jnp.asarray(permute_state_vector(fg, initial)),
        final=jnp.asarray(permute_state_vector(fg, final)),
        leaky=jnp.asarray(permute_state_vector(fg, leaky)),
        res_src=jnp.asarray(fg.res_src), res_dst=jnp.asarray(fg.res_dst),
        res_pdf=jnp.asarray(fg.res_pdf), res_prob=jnp.asarray(fg.res_prob),
    )


def _bsmm(tiles, rows, cols, v, nt):
    """Block-sparse matvec batch: (W @ v) for v (S_pad, B) -> (S_pad, B).

    Gathers column tiles of v, runs one batched MXU matmul over the
    nonzero tiles, segment-sums into row tiles.
    """
    s_pad, B = v.shape
    if tiles.shape[0] == 0:
        return jnp.zeros_like(v)
    vt = v.reshape(nt, 128, B)
    gathered = jnp.take(vt, cols, axis=0)                 # (n, 128, B)
    prod = jnp.einsum("nij,njb->nib", tiles, gathered,
                      preferred_element_type=jnp.float32)
    out = jax.ops.segment_sum(prod, rows, num_segments=nt,
                              indices_are_sorted=True)
    return out.reshape(s_pad, B)


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
    nt = s_pad // 128
    leaky = fa.leaky[:, None]

    alpha0 = jnp.broadcast_to(fa.initial[:, None], (s_pad, B))
    s0 = alpha0.sum(axis=0)
    ad0 = alpha0 + leaky_coefficient * s0[None, :] * leaky

    ts = jnp.arange(1, T + 1, dtype=lengths.dtype)

    def step(carry, xs):
        ad_prev, s_prev, loglike = carry
        px_t, t = xs
        x_dst = jnp.take(px_t, fa.f_dst, axis=0)          # (S_pad, B)
        x_src = jnp.take(px_t, fa.g_src, axis=0)
        a = x_dst * _bsmm(fa.w1_tiles, fa.w1_rows, fa.w1_cols, ad_prev, nt)
        a = a + _bsmm(fa.w2_tiles, fa.w2_rows, fa.w2_cols,
                      x_src * ad_prev, nt)
        a = a + _residual_fwd(fa, ad_prev, px_t)
        a = a / s_prev[None, :]
        s_t = a.sum(axis=0)
        ad_t = a + leaky_coefficient * s_t[None, :] * leaky
        active = t <= lengths
        loglike = loglike + jnp.where(
            t < lengths, jnp.log(jnp.where(s_t > 0, s_t, 1.0)), 0.0)
        ad_new = jnp.where(active[None, :], ad_t, ad_prev)
        s_new = jnp.where(active, s_t, s_prev)
        return (ad_new, s_new, loglike), (ad_new, s_new)

    loglike0 = jnp.log(s0)
    (_, _, loglike), (ad_ys, s_ys) = jax.lax.scan(
        step, (ad0, s0, loglike0), (px_tm, ts))

    alpha_dash = jnp.concatenate([ad0[None], ad_ys], axis=0)
    alpha_sums = jnp.concatenate([s0[None], s_ys], axis=0)

    idx = lengths[None, None, :].astype(jnp.int32)
    ad_last = jnp.take_along_axis(
        alpha_dash, jnp.broadcast_to(idx, (1, s_pad, B)), axis=0)[0]
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
    nt = s_pad // 128
    leaky = fa.leaky[:, None]
    final = fa.final[:, None]
    bd_final = final / tot_prob[None, :]

    ts = jnp.arange(T - 1, -1, -1, dtype=lengths.dtype)
    xs = (px_tm[::-1], alpha_dash[:T][::-1], alpha_sums[:T][::-1], ts)

    def step(bd_next, xs):
        px_t, ad_t, s_t, t = xs
        inject = (lengths == t + 1)
        bd_eff = jnp.where(inject[None, :], bd_final, bd_next)
        b_next = bd_eff + leaky_coefficient * (
            (bd_eff * leaky).sum(axis=0, keepdims=True))
        x_dst = jnp.take(px_t, fa.f_dst, axis=0)
        x_src = jnp.take(px_t, fa.g_src, axis=0)
        inv_s = 1.0 / s_t[None, :]

        xb = x_dst * b_next                                 # (S_pad, B)
        w1t_term = _bsmm(fa.w1t_tiles, fa.w1t_rows, fa.w1t_cols, xb, nt)
        w2t_term = _bsmm(fa.w2t_tiles, fa.w2t_rows, fa.w2t_cols, b_next, nt)
        bd_t = (w1t_term + x_src * w2t_term) * inv_s

        # posteriors: S-sized scatters by pdf attachment
        w1_fwd = _bsmm(fa.w1_tiles, fa.w1_rows, fa.w1_cols, ad_t, nt)
        c1 = xb * w1_fwd * inv_s                            # per-dst mass
        c2 = x_src * ad_t * w2t_term * inv_s                # per-src mass
        gamma_t = (jax.ops.segment_sum(c1, fa.f_dst, num_segments=P)
                   + jax.ops.segment_sum(c2, fa.g_src, num_segments=P))

        if fa.res_src.shape[0] > 0:
            vf = (fa.res_prob[:, None]
                  * jnp.take(b_next, fa.res_dst, axis=0)
                  * jnp.take(px_t, fa.res_pdf, axis=0))
            bd_t = bd_t + jax.ops.segment_sum(
                vf, fa.res_src, num_segments=s_pad) * inv_s
            occ = jnp.take(ad_t, fa.res_src, axis=0) * inv_s
            gamma_t = gamma_t + jax.ops.segment_sum(
                vf * occ, fa.res_pdf, num_segments=P)

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


def forward_backward_prob_fact(px, lengths, fa: FactorizedArrays,
                               leaky_coefficient=1e-5) -> FwdBwdResult:
    """Fused fwd+bwd on the factorized graph.  px: (B, T, P) exp'd
    output; gamma is returned in (B, T, P)."""
    B, T, P = px.shape
    px_tm = jnp.transpose(px, (1, 2, 0))                    # (T, P, B)
    alpha_dash, alpha_sums, objf, tot_prob = forward_prob_fact(
        px_tm, lengths, fa, leaky_coefficient)
    gamma_tm, alpha_beta, gamma_sum = backward_prob_fact(
        px_tm, lengths, fa, leaky_coefficient, alpha_dash, alpha_sums,
        tot_prob, P)
    gamma = jnp.transpose(gamma_tm, (2, 0, 1))              # (B, T, P)
    ok = _ok_flags(objf, alpha_beta, gamma_sum)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum)

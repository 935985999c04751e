"""Dense-batched forward-backward for prob-domain LIST batches.

The reference serves *batched per-sequence* denominator-style graphs at
full kernel speed with one CUDA thread per (sequence, arc)
(/root/reference/pytorch_binding/src/chain-kernels.cu:112-169).  The
TPU-native equivalent of that capability axis is NOT an arc gather —
per-row dynamic indices cost ~35-61 ns/arc on TPU (measured,
docs/ab/prob_list_gather.json) — but a *batched dense* form: each
graph's transition matrix is classified with the same pdf-attachment
rule as the shared factorized engine (graphs/factorize._classify_arcs)
and materialized as per-graph dense (S_pad, S_pad) blocks, so the
per-frame update is a batched matrix-vector product on the MXU plus two
S-sized batched emission gathers hoisted OUT of the scan:

    a_t = x_dst_t * (W1 @ a') + W2 @ (x_src_t * a')   [+ residual arcs]

with ``x_dst[b, t, s] = px[b, t, f_b(s)]`` precomputed for all frames in
one batched ``take_along_axis`` (indices vary per graph but not per
frame).  Occupation posteriors are emitted in state space inside the
scan (c1/c2, the per-dst and per-src masses) and scattered to pdf space
once post-scan.  HBM traffic is ~5 * B * S_pad^2 * 4 bytes per frame —
a measured ~0.1 s/batch roofline where the gather engine pays 2.2 s
(B=8, S=2000, K=13k, T=300).

Semantics are identical to ``ops.fwdbwd.forward_backward_prob`` (the
reference recurrences, chain-computation.h:109-155, leaky-HMM included)
and are tested for parity against it; only the evaluation strategy
differs.  Dense blocks scale as O(B * S_pad^2) HBM, so dispatch gates
this engine on ``fits_dense_list`` and falls back to the gather path
(with its cliff warning) beyond the budget.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp

from .fwdbwd import FwdBwdResult, _ok_flags


def _budget_bytes() -> int:
    return int(os.environ.get("PYCHAIN_DENSE_LIST_BUDGET",
                              2 * 1024 * 1024 * 1024))


def fits_dense_list(batch_size: int, num_states: int) -> bool:
    """W1+W2 f32 dense blocks within the HBM budget (default 2 GiB)."""
    s_pad = -(-int(num_states) // 128) * 128
    return 2 * batch_size * s_pad * s_pad * 4 <= _budget_bytes()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseListArrays:
    """Device pytree for a batch of per-sequence prob-domain graphs.

    Every array leaf is batch-leading so ``ChainGraphBatch.reorder``'s
    generic ``take(axis=0)`` keeps graph/sequence pairing intact.
    """
    w1: jax.Array        # (B, S_pad, S_pad) w1[b, dst, src], dst-attached
    w2: jax.Array        # (B, S_pad, S_pad) src-attached arcs
    f_idx: jax.Array     # (B, S_pad) pdf feeding each state's W1 term
    g_idx: jax.Array     # (B, S_pad) pdf feeding each state's W2 term
    initial: jax.Array   # (B, S_pad)
    final: jax.Array     # (B, S_pad)
    leaky: jax.Array     # (B, S_pad)
    # residual arcs (pdf not attachable to src or dst); prob 0 = padding
    res_src: jax.Array   # (B, R_pad) int32
    res_dst: jax.Array
    res_pdf: jax.Array
    res_prob: jax.Array  # (B, R_pad) float32
    p_pad: int = dataclasses.field(metadata=dict(static=True))
    # True when f_idx == g_idx everywhere: x_src aliases x_dst and the
    # two gamma scatters merge into one
    x_same: bool = dataclasses.field(metadata=dict(static=True))
    tile_dtype: str = dataclasses.field(default="float32",
                                        metadata=dict(static=True))

    @property
    def s_pad(self) -> int:
        return self.w1.shape[-1]

    @property
    def batch_size(self) -> int:
        return self.w1.shape[0]


def dense_list_arrays(graphs, tile_dtype="float32") -> DenseListArrays:
    """Build the batched dense form from a list of prob-domain
    ``ChainGraph``s (padded to the batch max S)."""
    from ..graphs.factorize import _classify_arcs

    B = len(graphs)
    S = max(g.num_states for g in graphs)
    s_pad = -(-S // 128) * 128
    p_max = 1
    res_lists = []
    w1 = np.zeros((B, s_pad, s_pad), np.float32)
    w2 = np.zeros((B, s_pad, s_pad), np.float32)
    f_idx = np.zeros((B, s_pad), np.int32)
    g_idx = np.zeros((B, s_pad), np.int32)
    initial = np.zeros((B, s_pad), np.float32)
    final = np.zeros((B, s_pad), np.float32)
    leaky = np.zeros((B, s_pad), np.float32)
    for i, g in enumerate(graphs):
        if g.log_domain:
            raise ValueError("dense_list engine is for the probability "
                             "domain; log-domain lists dispatch to the "
                             "semiring/XL tiers")
        s = g.num_states
        trans = np.asarray(g.forward_transitions)
        probs = np.asarray(g.forward_transition_probs, np.float32)
        src = trans[:, 0].astype(np.int64)
        dst = trans[:, 1].astype(np.int64)
        pdf = trans[:, 2].astype(np.int64)
        if len(pdf):
            p_max = max(p_max, int(pdf.max()) + 1)
        cls, f_raw, g_raw = _classify_arcs(src, dst, pdf)
        m1, m2, m0 = cls == 1, cls == 2, cls == 0
        np.add.at(w1[i], (dst[m1], src[m1]), probs[m1])
        np.add.at(w2[i], (dst[m2], src[m2]), probs[m2])
        f_idx[i, :len(f_raw)] = np.maximum(f_raw, 0)
        g_idx[i, :len(g_raw)] = np.maximum(g_raw, 0)
        res_lists.append((src[m0], dst[m0], pdf[m0], probs[m0]))
        initial[i, :s] = g.initial_probs
        final[i, :s] = g.final_probs
        if g.leaky_probs is not None:
            leaky[i, :s] = g.leaky_probs
    r_pad = max(len(r[0]) for r in res_lists)
    res_src = np.zeros((B, r_pad), np.int32)
    res_dst = np.zeros((B, r_pad), np.int32)
    res_pdf = np.zeros((B, r_pad), np.int32)
    res_prob = np.zeros((B, r_pad), np.float32)
    for i, (rs, rd, rp, rw) in enumerate(res_lists):
        res_src[i, :len(rs)] = rs
        res_dst[i, :len(rd)] = rd
        res_pdf[i, :len(rp)] = rp
        res_prob[i, :len(rw)] = rw
    p_pad = -(-p_max // 128) * 128
    td = jnp.bfloat16 if tile_dtype == "bfloat16" else jnp.float32
    dev = jax.device_put(dict(
        w1=w1.astype(td), w2=w2.astype(td), f_idx=f_idx, g_idx=g_idx,
        initial=initial, final=final, leaky=leaky, res_src=res_src,
        res_dst=res_dst, res_pdf=res_pdf, res_prob=res_prob))
    return DenseListArrays(
        w1=dev["w1"], w2=dev["w2"], f_idx=dev["f_idx"],
        g_idx=dev["g_idx"], initial=dev["initial"], final=dev["final"],
        leaky=dev["leaky"], res_src=dev["res_src"],
        res_dst=dev["res_dst"], res_pdf=dev["res_pdf"],
        res_prob=dev["res_prob"], p_pad=p_pad,
        x_same=bool(np.array_equal(f_idx, g_idx)),
        tile_dtype=tile_dtype)


def _precision(da: DenseListArrays):
    """Same policy as the factorized engine (ops/factorized.py): f32
    blocks need HIGH so the MXU doesn't silently round to bf16."""
    if da.w1.dtype == jnp.bfloat16:
        return jax.lax.Precision.DEFAULT
    return jax.lax.Precision.HIGH


def _mv(w, v, prec, transpose=False):
    """Batched matvec: w (B, D, S) x v (S, B) -> (D, B); transpose
    contracts over D instead (w^T @ v)."""
    vt = v.astype(w.dtype)
    eq = "bds,db->sb" if transpose else "bds,sb->db"
    return jnp.einsum(eq, w, vt, preferred_element_type=jnp.float32,
                      precision=prec)


def _take_batch(v_sb, idx_rb):
    """v (S, B), idx (R, B) -> out[r, b] = v[idx[r, b], b]."""
    return jnp.take_along_axis(v_sb, idx_rb, axis=0)


def _scatter_batch(vals_rb, idx_rb, size):
    """Batched scatter-add along axis 0: out[idx[r,b], b] += vals[r,b]."""
    R, B = vals_rb.shape
    lanes = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None, :],
                             (R, B))
    return jnp.zeros((size, B), vals_rb.dtype).at[idx_rb, lanes].add(
        vals_rb)


def _emissions(px_tm, da: DenseListArrays):
    """Hoisted emission gathers: (T, P_eff, B) -> x_dst/x_src/res_x,
    each (T, S_pad|R_pad, B).  Indices vary per graph but not per
    frame, so this is one batched gather instead of T in-scan ones."""
    f_tb = jnp.transpose(da.f_idx)[None]                 # (1, S_pad, B)
    T = px_tm.shape[0]
    x_dst = jnp.take_along_axis(
        px_tm, jnp.broadcast_to(f_tb, (T,) + f_tb.shape[1:]), axis=1)
    if da.x_same:
        x_src = x_dst
    else:
        g_tb = jnp.transpose(da.g_idx)[None]
        x_src = jnp.take_along_axis(
            px_tm, jnp.broadcast_to(g_tb, (T,) + g_tb.shape[1:]), axis=1)
    if da.res_src.shape[1] > 0:
        r_tb = jnp.transpose(da.res_pdf)[None]
        res_x = jnp.take_along_axis(
            px_tm, jnp.broadcast_to(r_tb, (T,) + r_tb.shape[1:]), axis=1)
    else:
        res_x = jnp.zeros((T, 0, px_tm.shape[2]), px_tm.dtype)
    return x_dst, x_src, res_x


def forward_prob_dense(px_tm, lengths, da: DenseListArrays,
                       leaky_coefficient, ems=None):
    """Alpha sweep; px_tm (T, P_eff, B).  Same recurrence as
    ops/factorized.forward_prob_fact, with per-graph dense blocks."""
    T, _, B = px_tm.shape
    s_pad = da.s_pad
    prec = _precision(da)
    leaky = jnp.transpose(da.leaky)                      # (S_pad, B)
    x_dst_all, x_src_all, res_x_all = (ems if ems is not None
                                       else _emissions(px_tm, da))
    res_src = jnp.transpose(da.res_src)                  # (R_pad, B)
    res_dst = jnp.transpose(da.res_dst)
    res_prob = jnp.transpose(da.res_prob)
    has_res = da.res_src.shape[1] > 0

    alpha0 = jnp.transpose(da.initial)                   # (S_pad, B)
    s0 = alpha0.sum(axis=0)
    ad0 = alpha0 + leaky_coefficient * s0[None, :] * leaky

    ts = jnp.arange(1, T + 1, dtype=lengths.dtype)

    def step(carry, xs):
        ad_prev, s_prev, loglike, ad_last = carry
        x_dst, x_src, res_x, t = xs
        a = x_dst * _mv(da.w1, ad_prev, prec)
        a = a + _mv(da.w2, x_src * ad_prev, prec)
        if has_res:
            vals = _take_batch(ad_prev, res_src) * res_prob * res_x
            a = a + _scatter_batch(vals, res_dst, s_pad)
        a = a / s_prev[None, :]
        s_t = a.sum(axis=0)
        ad_t = a + leaky_coefficient * s_t[None, :] * leaky
        active = t <= lengths
        loglike = loglike + jnp.where(
            t < lengths, jnp.log(jnp.where(s_t > 0, s_t, 1.0)), 0.0)
        ad_new = jnp.where(active[None, :], ad_t, ad_prev)
        s_new = jnp.where(active, s_t, s_prev)
        ad_last = jnp.where((t == lengths)[None, :], ad_new, ad_last)
        return (ad_new, s_new, loglike, ad_last), (ad_new, s_new)

    loglike0 = jnp.log(s0)
    (_, _, loglike, ad_last), (ad_ys, s_ys) = jax.lax.scan(
        step, (ad0, s0, loglike0, ad0),
        (x_dst_all, x_src_all, res_x_all, ts))

    alpha_dash = jnp.concatenate([ad0[None], ad_ys], axis=0)
    alpha_sums = jnp.concatenate([s0[None], s_ys], axis=0)
    final = jnp.transpose(da.final)
    tot_prob = (ad_last * final).sum(axis=0)
    objf = loglike + jnp.log(tot_prob)
    return alpha_dash, alpha_sums, objf, tot_prob


def backward_prob_dense(px_tm, lengths, da: DenseListArrays,
                        leaky_coefficient, alpha_dash, alpha_sums,
                        tot_prob, ems=None):
    """Beta sweep + posteriors.  c1/c2 (per-dst / per-src occupation
    masses) are emitted in state space and scattered to pdf space ONCE
    post-scan (indices are frame-invariant)."""
    T, _, B = px_tm.shape
    s_pad = da.s_pad
    prec = _precision(da)
    leaky = jnp.transpose(da.leaky)
    final = jnp.transpose(da.final)
    x_dst_all, x_src_all, res_x_all = (ems if ems is not None
                                       else _emissions(px_tm, da))
    res_src = jnp.transpose(da.res_src)
    res_dst = jnp.transpose(da.res_dst)
    res_prob = jnp.transpose(da.res_prob)
    has_res = da.res_src.shape[1] > 0
    r_pad = da.res_src.shape[1]
    bd_final = final / tot_prob[None, :]

    ts = jnp.arange(T - 1, -1, -1, dtype=lengths.dtype)
    xs = (x_dst_all[::-1], x_src_all[::-1], res_x_all[::-1],
          alpha_dash[:T][::-1], alpha_sums[:T][::-1], ts)

    def step(bd_next, xs):
        x_dst, x_src, res_x, ad_t, s_t, t = xs
        inject = (lengths == t + 1)
        bd_eff = jnp.where(inject[None, :], bd_final, bd_next)
        b_next = bd_eff + leaky_coefficient * (
            (bd_eff * leaky).sum(axis=0, keepdims=True))
        inv_s = 1.0 / s_t[None, :]

        xb = x_dst * b_next                              # (S_pad, B)
        w1t_term = _mv(da.w1, xb, prec, transpose=True)
        w2t_term = _mv(da.w2, b_next, prec, transpose=True)
        bd_t = (w1t_term + x_src * w2t_term) * inv_s

        w1_fwd = _mv(da.w1, ad_t, prec)
        c1 = xb * w1_fwd * inv_s                         # per-dst mass
        c2 = x_src * ad_t * w2t_term * inv_s             # per-src mass

        if has_res:
            vf = res_prob * _take_batch(b_next, res_dst) * res_x
            bd_t = bd_t + _scatter_batch(vf, res_src, s_pad) * inv_s
            cr = vf * _take_batch(ad_t, res_src) * inv_s
        else:
            cr = jnp.zeros((r_pad, B), jnp.float32)

        active = (t < lengths)
        bd_new = jnp.where(active[None, :], bd_t, bd_eff)
        c1 = jnp.where(active[None, :], c1, 0.0)
        c2 = jnp.where(active[None, :], c2, 0.0)
        cr = jnp.where(active[None, :], cr, 0.0)
        ab = (ad_t * bd_new).sum(axis=0)
        gs = c1.sum(axis=0) + c2.sum(axis=0) + cr.sum(axis=0)
        return bd_new, (c1, c2, cr, ab, gs)

    _, (c1_rev, c2_rev, cr_rev, ab_rev, gs_rev) = jax.lax.scan(
        step, jnp.zeros((s_pad, B), jnp.float32), xs)

    p_eff = px_tm.shape[1]
    t_ix = jnp.arange(T, dtype=jnp.int32)[:, None, None]
    b_ix = jnp.arange(B, dtype=jnp.int32)[None, None, :]
    f_ix = jnp.transpose(da.f_idx)[None]                 # (1, S_pad, B)
    c1_tm = c1_rev[::-1]
    c2_tm = c2_rev[::-1]
    gamma_tm = jnp.zeros((T, p_eff, B), jnp.float32)
    if da.x_same:
        gamma_tm = gamma_tm.at[t_ix, f_ix, b_ix].add(c1_tm + c2_tm)
    else:
        g_ix = jnp.transpose(da.g_idx)[None]
        gamma_tm = gamma_tm.at[t_ix, f_ix, b_ix].add(c1_tm)
        gamma_tm = gamma_tm.at[t_ix, g_ix, b_ix].add(c2_tm)
    if has_res:
        r_ix = jnp.transpose(da.res_pdf)[None]
        gamma_tm = gamma_tm.at[t_ix, r_ix, b_ix].add(cr_rev[::-1])

    alpha_beta = jnp.swapaxes(ab_rev[::-1], 0, 1)        # (B, T)
    gamma_sum = jnp.swapaxes(gs_rev[::-1], 0, 1)
    return gamma_tm, alpha_beta, gamma_sum


def forward_backward_prob_dense(px, lengths, da: DenseListArrays,
                                leaky_coefficient=1e-5) -> FwdBwdResult:
    """Fused fwd+bwd over the batched dense graphs.  px: (B, T, P)
    exp'd nnet output; gamma returned in (B, T, P)."""
    B, T, P = px.shape
    p_eff = max(-(-P // 128) * 128, da.p_pad)
    px_tm = jnp.transpose(px, (1, 2, 0))                 # (T, P, B)
    if p_eff != P:
        px_tm = jnp.pad(px_tm, ((0, 0), (0, p_eff - P), (0, 0)))
    ems = _emissions(px_tm, da)
    alpha_dash, alpha_sums, objf, tot_prob = forward_prob_dense(
        px_tm, lengths, da, leaky_coefficient, ems=ems)
    gamma_tm, alpha_beta, gamma_sum = backward_prob_dense(
        px_tm, lengths, da, leaky_coefficient, alpha_dash, alpha_sums,
        tot_prob, ems=ems)
    if gamma_tm.shape[1] > P:
        gamma_tm = gamma_tm[:, :P, :]
    elif gamma_tm.shape[1] < P:
        gamma_tm = jnp.pad(gamma_tm,
                           ((0, 0), (0, P - gamma_tm.shape[1]), (0, 0)))
    gamma = jnp.transpose(gamma_tm, (2, 0, 1))           # (B, T, P)
    ok = _ok_flags(objf, alpha_beta, gamma_sum)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum,
                        gamma_tm=gamma_tm)

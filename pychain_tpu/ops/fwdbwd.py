"""Batched HMM forward-backward for the LF-MMI (chain) objective — pure XLA.

TPU-native re-design of the reference's native engines
(/root/reference/pytorch_binding/src/chain-computation.{h,cc} — probability
domain with arbitrary-scale renormalisation and leaky-HMM, used for the
denominator — and chain-log-domain-computation.{h,cc} — log domain, no
leaky-HMM, used for the numerator).  The recurrences implemented here are
exactly the "version 3" equations documented at chain-computation.h:25-158.

Key departures from the CUDA design, chosen for XLA/TPU:

* One ``lax.scan`` per direction instead of 2T host-driven kernel
  launches (chain-computation.cc:200-204, 335-340): the whole sweep is a
  single compiled loop.
* Unequal lengths are handled by static-shape *masks* instead of the
  sorted shrinking-batch scheme (``pack_padded_sequence`` batch_sizes,
  reference loss.py:37-40).  One compiled program serves every length
  distribution, and batches need not be sorted.
* Occupation posteriors (gamma) are accumulated with deterministic
  segment-sums over arcs instead of atomics — no race handling and no
  randomised pruning noise (chain-kernels.cu:54-87 exists only to make
  GPU atomics cheap; TPU does not need it).
* A ``shared`` fast path: when every sequence uses the same graph (the
  broadcast denominator), gathers use one shared index vector, which XLA
  lowers far more efficiently than per-sequence gathers.

Shape conventions: x is (B, T, P); graphs are either batched (B, ...) or
shared (unbatched).  All internals run time-major, (T, B, ...).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphArrays:
    """Device-ready graph tensors consumed by the scans.

    Arrays have a leading batch dim (B, ...) unless ``shared`` is True, in
    which case they are unbatched and broadcast across the batch.
    fwd_* arcs are grouped by source state, bwd_* arcs by destination
    state (matching the reference's forward/backward transition lists).
    Padded arcs must carry neutral probability (0 in prob domain, -inf in
    log domain) and in-range indices.
    """
    fwd_src: jax.Array   # (K,) or (B, K) int32
    fwd_dst: jax.Array
    fwd_pdf: jax.Array
    fwd_prob: jax.Array  # float
    bwd_src: jax.Array
    bwd_dst: jax.Array
    bwd_pdf: jax.Array
    bwd_prob: jax.Array
    initial: jax.Array   # (S,) or (B, S)
    final: jax.Array
    leaky: Optional[jax.Array]  # None in log domain
    shared: bool = dataclasses.field(metadata=dict(static=True))

    @property
    def num_states(self) -> int:
        return self.initial.shape[-1]


class FwdBwdResult(NamedTuple):
    objf: jax.Array        # (B,) per-sequence total log-likelihood
    gamma: jax.Array       # (B, T, P) occupation posteriors = d objf / d x
    ok: jax.Array          # (B,) bool, alpha*beta invariant within 5% at t=0
    alpha_beta: jax.Array  # (B, T) per-frame sum_i alpha'(t,i) beta^(t,i)
    gamma_sum: jax.Array   # (B, T) per-frame sum_n gamma(t,n)
    # Optional compact posterior in the engine's native (T, P, B)
    # layout/dtype.  When set, the custom_vjp saves THIS as the
    # residual and fuses the transpose/widen/cotangent-scale into the
    # backward pass, so the primal never materialises the (B, T, P)
    # float32 gamma (1.5 GB at the headline config) that XLA would
    # otherwise write and re-read.  gamma (above) is still derived for
    # aux/diagnostic consumers; it DCEs away when unused.
    gamma_tm: jax.Array | None = None


def _gather(values, idx, shared: bool):
    """values (B, N) indexed by idx: (K,) shared or (B, K) batched -> (B, K)."""
    if shared:
        return jnp.take(values, idx, axis=1, indices_are_sorted=False,
                        unique_indices=False)
    return jnp.take_along_axis(values, idx, axis=1)


def _segment_sum(values, seg_ids, num_segments: int, shared: bool):
    """Sum values (B, K) into (B, S) by segment id; ids sorted ascending."""
    if shared:
        # One shared sorted id vector: segment-sum along the K axis.
        f = lambda v: jax.ops.segment_sum(
            v, seg_ids, num_segments=num_segments, indices_are_sorted=True)
        return jax.vmap(f)(values)
    # List-built batches pad arc ids with 0 AFTER the sorted real ids
    # (graph.py list constructor), so sortedness cannot be promised here.
    f = lambda v, s: jax.ops.segment_sum(
        v, s, num_segments=num_segments, indices_are_sorted=False)
    return jax.vmap(f)(values, seg_ids)


def _segment_max(values, seg_ids, num_segments: int, shared: bool):
    if shared:
        f = lambda v: jax.ops.segment_max(
            v, seg_ids, num_segments=num_segments, indices_are_sorted=True)
        return jax.vmap(f)(values)
    f = lambda v, s: jax.ops.segment_max(
        v, s, num_segments=num_segments, indices_are_sorted=False)
    return jax.vmap(f)(values, seg_ids)


def safe_log(v):
    """log(v) with exact -inf at v <= 0 and no NaN from the masked
    branch (the inner where keeps log's argument positive).  Shared by
    the leveled and semiring engines — the guard encodes a subtle
    NaN-avoidance invariant that must not drift between copies."""
    return jnp.where(v > 0, jnp.log(jnp.where(v > 0, v, 1.0)), NEG_INF)


def _segment_logsumexp(terms, seg_ids, num_segments, shared):
    """Numerically-stable log-semiring segment reduction (B,K)->(B,S).

    Replaces the reference's chained LogAdd / atomicLogAdd
    (chain-log-domain-kernels.cu:24-75) with max-shifted exp/sum/log.
    Empty or all(-inf) segments yield -inf, as they must.
    """
    m = _segment_max(terms, seg_ids, num_segments, shared)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    shifted = terms - _gather(m_safe, seg_ids, shared)
    s = _segment_sum(jnp.exp(shifted), seg_ids, num_segments, shared)
    return jnp.where(jnp.isfinite(m), jnp.log(s) + m_safe, NEG_INF)


def _bexp(g: GraphArrays, v):
    """Broadcast an unbatched graph array against batch for elementwise use."""
    return v[None] if g.shared else v


# ======================================================================
# Probability domain with leaky HMM (denominator path).
# Recurrences: chain-computation.h:109-155 ("version 3").
# ======================================================================

def forward_prob(px, lengths, g: GraphArrays, leaky_coefficient: float):
    """Alpha sweep in the probability domain.

    px: (B, T, P) exp'd nnet output.  lengths: (B,) int32.
    Returns (alpha_dash (T+1, B, S), alpha_sums (T+1, B), objf (B,),
    tot_prob (B,)).
    """
    B, T, P = px.shape
    S = g.num_states

    init = _bexp(g, g.initial) * jnp.ones((B, S), px.dtype)
    leaky = _bexp(g, g.leaky) * jnp.ones((B, S), px.dtype)

    alpha0 = init
    s0 = alpha0.sum(axis=1)
    ad0 = alpha0 + leaky_coefficient * s0[:, None] * leaky

    px_tm = jnp.swapaxes(px, 0, 1)  # (T, B, P)
    ts = jnp.arange(1, T + 1, dtype=lengths.dtype)

    def step(carry, xs):
        ad_prev, s_prev, loglike, ad_last = carry
        px_t, t = xs
        av = _gather(ad_prev, g.bwd_src, g.shared)          # (B, K)
        ev = _gather(px_t, g.bwd_pdf, g.shared)             # (B, K)
        w = av * _bexp(g, g.bwd_prob) * ev
        alpha_t = _segment_sum(w, g.bwd_dst, S, g.shared)   # (B, S)
        alpha_t = alpha_t / s_prev[:, None]                  # arbitrary scale
        s_t = alpha_t.sum(axis=1)
        ad_t = alpha_t + leaky_coefficient * s_t[:, None] * leaky
        active = t <= lengths                                # (B,)
        # log alpha_sum(u) accumulates for u = 0..T_b-1; s_t is u = t.
        loglike = loglike + jnp.where(
            t < lengths, jnp.log(jnp.where(s_t > 0, s_t, 1.0)), 0.0)
        ad_new = jnp.where(active[:, None], ad_t, ad_prev)
        s_new = jnp.where(active, s_t, s_prev)
        # alpha' at each sequence's own final frame (cc:209-230),
        # captured in the carry instead of a post-hoc take_along_axis
        # that would re-read the whole (T+1, B, S) history from HBM
        ad_last = jnp.where((t == lengths)[:, None], ad_new, ad_last)
        return (ad_new, s_new, loglike, ad_last), (ad_new, s_new)

    loglike0 = jnp.log(s0)  # frame 0 always active (lengths >= 1)
    (_, _, loglike, ad_last), (ad_ys, s_ys) = jax.lax.scan(
        step, (ad0, s0, loglike0, ad0), (px_tm, ts))

    alpha_dash = jnp.concatenate([ad0[None], ad_ys], axis=0)   # (T+1, B, S)
    alpha_sums = jnp.concatenate([s0[None], s_ys], axis=0)     # (T+1, B)

    tot_prob = (ad_last * _bexp(g, g.final)).sum(axis=1)       # (B,)
    objf = loglike + jnp.log(tot_prob)
    return alpha_dash, alpha_sums, objf, tot_prob


def backward_prob(px, lengths, g: GraphArrays, leaky_coefficient: float,
                  alpha_dash, alpha_sums, tot_prob):
    """Beta sweep + occupation posteriors, probability domain.

    Returns (gamma (B, T, P), alpha_beta (B, T), gamma_sum (B, T)).
    """
    B, T, P = px.shape
    S = g.num_states
    leaky = _bexp(g, g.leaky) * jnp.ones((B, S), px.dtype)
    final = _bexp(g, g.final) * jnp.ones((B, S), px.dtype)
    inv_tot = 1.0 / tot_prob
    bd_final = final * inv_tot[:, None]                        # beta-dash(T_b)

    px_tm = jnp.swapaxes(px, 0, 1)
    ts = jnp.arange(T - 1, -1, -1, dtype=lengths.dtype)
    xs = (px_tm[::-1], alpha_dash[:T][::-1], alpha_sums[:T][::-1], ts)

    def step(bd_next, xs):
        px_t, ad_t, s_t, t = xs
        inject = (lengths == t + 1)
        bd_eff = jnp.where(inject[:, None], bd_final, bd_next)
        # Beta(t+1): leaky correction (chain-computation.cc:313-330).
        b_next = bd_eff + leaky_coefficient * (
            (bd_eff * leaky).sum(axis=1, keepdims=True))
        bv = _gather(b_next, g.fwd_dst, g.shared)              # (B, K)
        ev = _gather(px_t, g.fwd_pdf, g.shared)
        vf = _bexp(g, g.fwd_prob) * bv * ev                    # (B, K)
        inv_s = 1.0 / s_t[:, None]
        bd_t = _segment_sum(vf, g.fwd_src, S, g.shared) * inv_s
        occ = _gather(ad_t, g.fwd_src, g.shared) * inv_s       # (B, K)
        gamma_t = _segment_sum(vf * occ, g.fwd_pdf, P, g.shared)
        active = (t < lengths)
        bd_new = jnp.where(active[:, None], bd_t, bd_eff)
        gamma_t = jnp.where(active[:, None], gamma_t, 0.0)
        # Invariants (BetaGeneralFrameDebug, cc:345-391), pre-leaky beta-dash.
        ab = (ad_t * bd_new).sum(axis=1)
        gs = gamma_t.sum(axis=1)
        return bd_new, (gamma_t, ab, gs)

    _, (gamma_rev, ab_rev, gs_rev) = jax.lax.scan(
        step, jnp.zeros((B, S), px.dtype), xs)
    gamma = jnp.swapaxes(gamma_rev[::-1], 0, 1)                # (B, T, P)
    alpha_beta = jnp.swapaxes(ab_rev[::-1], 0, 1)              # (B, T)
    gamma_sum = jnp.swapaxes(gs_rev[::-1], 0, 1)
    return gamma, alpha_beta, gamma_sum


def forward_backward_prob(px, lengths, g: GraphArrays,
                          leaky_coefficient: float = 1e-5) -> FwdBwdResult:
    """Fused forward+backward, probability domain with leaky HMM."""
    alpha_dash, alpha_sums, objf, tot_prob = forward_prob(
        px, lengths, g, leaky_coefficient)
    gamma, alpha_beta, gamma_sum = backward_prob(
        px, lengths, g, leaky_coefficient, alpha_dash, alpha_sums, tot_prob)
    ok = _ok_flags(objf, alpha_beta, gamma_sum)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum)


# ======================================================================
# Log domain, no leaky HMM (numerator path).
# Reference: chain-log-domain-computation.{h,cc}.
# ======================================================================

def forward_log(x, lengths, g: GraphArrays):
    """Alpha sweep in the log domain.

    x: (B, T, P) nnet log-likelihoods (already clamped by the caller).
    Returns (alpha (T+1, B, S), alpha_sums (T+1, B), objf (B,), tlp (B,)),
    where tlp = logsumexp(alpha(T_b) + final) per sequence.
    """
    B, T, P = x.shape
    S = g.num_states
    init = _bexp(g, g.initial) * jnp.ones((B, S), x.dtype)

    a0 = init
    s0 = jnp.zeros((B,), x.dtype)  # alpha-sum(0) := 0, cc:89

    x_tm = jnp.swapaxes(x, 0, 1)
    ts = jnp.arange(1, T + 1, dtype=lengths.dtype)

    def step(carry, xs):
        a_prev, s_prev, loglike, a_last = carry
        x_t, t = xs
        av = _gather(a_prev, g.bwd_src, g.shared)
        ev = _gather(x_t, g.bwd_pdf, g.shared)
        terms = av + _bexp(g, g.bwd_prob) + ev                 # (B, K)
        a_t = _segment_logsumexp(terms, g.bwd_dst, S, g.shared)
        a_t = a_t - s_prev[:, None]                            # arbitrary scale
        s_t = jax.nn.logsumexp(a_t, axis=1)
        active = t <= lengths
        loglike = loglike + jnp.where(t < lengths, s_t, 0.0)
        a_new = jnp.where(active[:, None], a_t, a_prev)
        s_new = jnp.where(active, s_t, s_prev)
        # alpha at each sequence's final frame, captured in the carry
        # (avoids a whole-history take_along_axis afterwards)
        a_last = jnp.where((t == lengths)[:, None], a_new, a_last)
        return (a_new, s_new, loglike, a_last), (a_new, s_new)

    (_, _, loglike, a_last), (a_ys, s_ys) = jax.lax.scan(
        step, (a0, s0, jnp.zeros((B,), x.dtype), a0), (x_tm, ts))

    alpha = jnp.concatenate([a0[None], a_ys], axis=0)
    alpha_sums = jnp.concatenate([s0[None], s_ys], axis=0)

    tlp = jax.nn.logsumexp(a_last + _bexp(g, g.final), axis=1)  # (B,)
    objf = loglike + tlp
    return alpha, alpha_sums, objf, tlp


def backward_log(x, lengths, g: GraphArrays, alpha, alpha_sums, tlp):
    """Beta sweep + posteriors, log domain.  gamma returned in linear space
    (the reference accumulates log-gamma with atomicLogAdd then exps at
    loss.py:77; a linear segment-sum of exp() terms is equivalent and
    deterministic)."""
    B, T, P = x.shape
    S = g.num_states
    final = _bexp(g, g.final) * jnp.ones((B, S), x.dtype)
    b_final = final - tlp[:, None]                             # beta(T_b)

    x_tm = jnp.swapaxes(x, 0, 1)
    ts = jnp.arange(T - 1, -1, -1, dtype=lengths.dtype)
    xs = (x_tm[::-1], alpha[:T][::-1], alpha_sums[:T][::-1], ts)

    def step(b_next, xs):
        x_t, a_t, s_t, t = xs
        inject = (lengths == t + 1)
        b_eff = jnp.where(inject[:, None], b_final, b_next)
        bv = _gather(b_eff, g.fwd_dst, g.shared)
        ev = _gather(x_t, g.fwd_pdf, g.shared)
        vf = _bexp(g, g.fwd_prob) + bv + ev - s_t[:, None]     # (B, K)
        b_t = _segment_logsumexp(vf, g.fwd_src, S, g.shared)
        occ = vf + _gather(a_t, g.fwd_src, g.shared)
        gamma_t = _segment_sum(jnp.exp(occ), g.fwd_pdf, P, g.shared)
        active = (t < lengths)
        b_new = jnp.where(active[:, None], b_t, b_eff)
        gamma_t = jnp.where(active[:, None], gamma_t, 0.0)
        ab = jax.nn.logsumexp(a_t + b_new, axis=1)             # log alpha*beta
        gs = gamma_t.sum(axis=1)
        return b_new, (gamma_t, ab, gs)

    _, (gamma_rev, ab_rev, gs_rev) = jax.lax.scan(
        step, jnp.full((B, S), NEG_INF, x.dtype), xs)
    gamma = jnp.swapaxes(gamma_rev[::-1], 0, 1)
    alpha_beta = jnp.swapaxes(jnp.exp(ab_rev[::-1]), 0, 1)
    gamma_sum = jnp.swapaxes(gs_rev[::-1], 0, 1)
    return gamma, alpha_beta, gamma_sum


def forward_backward_log(x, lengths, g: GraphArrays) -> FwdBwdResult:
    """Fused forward+backward in the log domain (numerator path)."""
    alpha, alpha_sums, objf, tlp = forward_log(x, lengths, g)
    gamma, alpha_beta, gamma_sum = backward_log(
        x, lengths, g, alpha, alpha_sums, tlp)
    ok = _ok_flags(objf, alpha_beta, gamma_sum)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum)


def _ok_flags(objf, alpha_beta, gamma_sum):
    """Per-sequence sanity flags, mirroring BetaGeneralFrameDebug
    (chain-computation.cc:345-391) at t=0 with the 5% 'abandon minibatch'
    threshold, surfaced properly instead of being dropped (the reference
    Python discards the flag, loss.py:44/62)."""
    ab0 = alpha_beta[:, 0]
    gs0 = gamma_sum[:, 0]
    ok = (jnp.isfinite(objf)
          & (jnp.abs(ab0 - 1.0) <= 0.05)
          & (jnp.abs(gs0 - 1.0) <= 0.05))
    return ok

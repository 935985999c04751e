"""Leveled (time-synchronous) numerator engine — gather-free sausages.

Kaldi chain supervision FSTs are time-synchronous: every arc advances
exactly one frame, so states partition into levels 0..T_g and the
forward variable at frame t is supported on level t only (the linear
engine in ops/linear.py is the width-1 special case).  Lay alpha out as
a dense (B, W) band (W = max level width, typically <= 8) and the
log-domain recurrence becomes a tiny dense contraction over (W, A)
in-arc slots — no per-row gathers, which on TPU cost ~8 cycles/element
regardless of size (see docs/DESIGN.md).

Emission lookups are hoisted out of the scan entirely: the per-slot pdf
ids are frame-indexed constants, so ``em[b, t, j, a] = x[b, t, pdf]``
is ONE one-hot einsum over the whole utterance batch.

Compiled form per graph (padded to common W, A, T_g):

* ``src_onehot`` (T_g, W, A, W): in-arc source-slot selectors,
* ``logp`` (T_g, W, A): arc log-probs, -inf padding,
* ``pdf`` (T_g, W, A): arc pdf ids (0 padding, masked by logp),
* ``final`` (W,): log final probs of the last level's slots.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .fwdbwd import FwdBwdResult, safe_log

NEG_INF = float("-inf")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LeveledArrays:
    """Batched time-synchronous graphs (log domain)."""
    src_onehot: jax.Array  # (B, Tg_max, W, A, W) bf16/f32 one-hot
    logp: jax.Array        # (B, Tg_max, W, A) f32, -inf padding
    pdf: jax.Array         # (B, Tg_max, W, A) int32
    final: jax.Array       # (B, W) f32, -inf on padded slots
    graph_len: jax.Array   # (B,) int32


def level_structure(g):
    """Levelize a log-domain ChainGraph.  Returns (levels, widths) with
    ``levels[s]`` the frame index of state s, or None if the graph is
    not time-synchronous (some state has in-arcs from mixed levels, a
    self-loop, or is unreachable)."""
    S, K = g.num_states, g.num_transitions
    t = g.forward_transitions
    levels = np.full(S, -1, np.int64)
    levels[g.start_state] = 0
    # graph arcs sorted by src; propagate in topological-ish sweeps
    for _ in range(S):
        src_l = levels[t[:, 0]]
        ok = src_l >= 0
        want = src_l + 1
        cur = levels[t[:, 1]]
        conflict = ok & (cur >= 0) & (cur != want)
        if conflict.any():
            return None
        upd = ok & (cur < 0)
        if not upd.any():
            break
        levels[t[upd, 1]] = want[upd]
    if (levels < 0).any():           # unreachable states
        return None
    if (levels[t[:, 0]] + 1 != levels[t[:, 1]]).any():
        return None
    return levels


def is_leveled_graph(g, max_width: int = 16) -> bool:
    """Cached per (graph, max_width): ChainGraphs are immutable after
    construction and re-batched every minibatch, and the levelization
    sweep is O(S*K)."""
    cache = getattr(g, "_is_leveled_cache", None)
    if cache is None:
        cache = {}
        try:
            g._is_leveled_cache = cache
        except AttributeError:
            cache = None
    if cache is not None and max_width in cache:
        return cache[max_width]
    result = _is_leveled_graph(g, max_width)
    if cache is not None:
        cache[max_width] = result
    return result


def _is_leveled_graph(g, max_width: int) -> bool:
    if not g.log_domain:
        return False
    levels = level_structure(g)
    if levels is None:
        return False
    widths = np.bincount(levels)
    if int(widths.max()) > max_width:
        return False
    # The banded sweep injects final probs only at the terminal level;
    # a graph that can legally terminate early (finite final prob at an
    # intermediate level) would silently lose those paths — route it to
    # the generic gather engine instead.
    finals_at = np.isfinite(g.final_probs) & (levels != levels.max())
    return not bool(finals_at.any())


def _cumcount(ids):
    """Position of each element within its run of equal ids (ids must
    be grouped, i.e. sorted)."""
    n = ids.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    new = np.ones(n, bool)
    new[1:] = ids[1:] != ids[:-1]
    idx = np.arange(n)
    return idx - np.maximum.accumulate(np.where(new, idx, 0))


def _graph_leveled_meta(g):
    """Per-graph banded compilation (vectorized), cached on the graph —
    list batches are rebuilt every minibatch and the per-arc Python
    loop dominated stage-2 (constrained supervision) step time."""
    meta = getattr(g, "_leveled_meta", None)
    if meta is not None:
        return meta
    levels = level_structure(g)
    assert levels is not None
    Tg = int(levels.max())
    S = g.num_states
    # stable slot assignment in state order (position within level)
    order = np.argsort(levels, kind="stable")
    slots = np.empty(S, np.int64)
    slots[order] = _cumcount(levels[order])
    t = g.forward_transitions
    d = t[:, 1].astype(np.int64)
    # in-arc index per destination, preserving arc order within a dst
    aorder = np.argsort(d, kind="stable")
    a_idx = np.empty(d.shape[0], np.int64)
    a_idx[aorder] = _cumcount(d[aorder])
    fmask = (levels == Tg) & np.isfinite(g.final_probs)
    meta = dict(
        Tg=Tg,
        Wg=int(np.bincount(levels).max()),
        Ag=int(np.bincount(d, minlength=S).max()) if d.size else 1,
        lv=(levels[d] - 1).astype(np.int64),   # arc consumed at frame lv
        j=slots[d],
        a=a_idx,
        src_slot=slots[t[:, 0].astype(np.int64)],
        logp=np.asarray(g.forward_transition_probs, np.float32),
        pdf=t[:, 2].astype(np.int32),
        final_slots=slots[np.nonzero(fmask)[0]],
        final_vals=np.asarray(g.final_probs, np.float32)[fmask])
    try:
        g._leveled_meta = meta
    except AttributeError:
        pass
    return meta


def leveled_arrays(graphs, dtype=jnp.float32) -> LeveledArrays:
    """Compile a batch of time-synchronous graphs to banded tensors."""
    B = len(graphs)
    metas = [_graph_leveled_meta(g) for g in graphs]
    W = max(1, max(m["Wg"] for m in metas))
    A = max(1, max(m["Ag"] for m in metas))
    Tg_max = max(1, max(m["Tg"] for m in metas))

    onehot = np.zeros((B, Tg_max, W, A, W), np.float32)
    logp = np.full((B, Tg_max, W, A), NEG_INF, np.float32)
    pdf = np.zeros((B, Tg_max, W, A), np.int32)
    final = np.full((B, W), NEG_INF, np.float32)
    glen = np.zeros(B, np.int32)
    for i, m in enumerate(metas):
        glen[i] = m["Tg"]
        onehot[i, m["lv"], m["j"], m["a"], m["src_slot"]] = 1.0
        logp[i, m["lv"], m["j"], m["a"]] = m["logp"]
        pdf[i, m["lv"], m["j"], m["a"]] = m["pdf"]
        final[i, m["final_slots"]] = m["final_vals"]
    host = jax.device_put(dict(onehot=onehot.astype(dtype), logp=logp,
                               pdf=pdf, final=final, glen=glen))
    return LeveledArrays(
        src_onehot=host["onehot"], logp=host["logp"], pdf=host["pdf"],
        final=host["final"], graph_len=host["glen"])


def _lse(v, axis):
    m = jnp.max(v, axis=axis, keepdims=True)
    msafe = jnp.where(jnp.isfinite(m), m, 0.0)
    out = jnp.log(jnp.sum(jnp.exp(v - msafe), axis=axis)) \
        + jnp.squeeze(msafe, axis)
    return jnp.where(jnp.isfinite(jnp.squeeze(m, axis)), out, NEG_INF)


def forward_backward_leveled(x, lengths, g: LeveledArrays) -> FwdBwdResult:
    """Banded log-domain fwd-bwd.  x: (B, T, P) clamped log-probs.

    Per-frame the alpha band is renormalised by its max m_t; the ll
    carry accumulates the m's, and the beta sweep removes them again so
    the occupancies telescope to true posteriors.
    """
    B, T, P = x.shape
    Tg, W, A = g.logp.shape[1:]
    kmax = min(Tg, T)
    lengths = lengths.astype(jnp.int32)

    # hoisted emissions: em[b,t,j,a] = x[b,t,pdf] as one one-hot einsum
    # (gather-free: per-row TPU gathers cost ~8 cycles/element)
    onehot_p = jax.nn.one_hot(g.pdf[:, :kmax], P, dtype=x.dtype)
    em = jnp.einsum("btp,btjap->btja", x[:, :kmax], onehot_p)

    arc_w = g.logp[:, :kmax] + em                    # (B, kmax, W, A)
    ts = jnp.arange(kmax, dtype=jnp.int32)

    alpha0 = jnp.full((B, W), NEG_INF, x.dtype).at[:, 0].set(0.0)

    def fwd_step(carry, xs):
        alpha, ll = carry
        aw, oh, t = xs                               # (B,W,A), (B,W,A,W)
        asel = safe_log(jnp.einsum("bjaw,bw->bja", oh, jnp.exp(alpha)))
        a_new = _lse(asel + aw, axis=2)              # (B, W)
        # renormalise so exp(alpha) stays in range for the one-hot trick
        m = jnp.max(a_new, axis=1, keepdims=True)
        msafe = jnp.where(jnp.isfinite(m), m, 0.0)
        a_new = a_new - msafe
        active = t < lengths
        alpha_out = jnp.where(active[:, None], a_new, alpha)
        ll_out = jnp.where(active, ll + msafe[:, 0], ll)
        return (alpha_out, ll_out), (alpha_out, msafe[:, 0])

    aw_tm = jnp.swapaxes(arc_w, 0, 1)
    oh_tm = jnp.swapaxes(g.src_onehot[:, :kmax], 0, 1)
    (alpha_T, ll), (alpha_ys, m_ys) = jax.lax.scan(
        fwd_step, (alpha0, jnp.zeros((B,), x.dtype)), (aw_tm, oh_tm, ts))

    tlp_local = _lse(alpha_T + g.final, axis=1)      # (B,)
    objf = ll + tlp_local
    feasible = (lengths == g.graph_len) & (g.graph_len <= T)
    objf = jnp.where(feasible, objf, NEG_INF)

    # backward: stored beta_t := true_beta_t - objf + M_t, so that
    # occupancy = exp(alpha_stored[src] + arc + beta_stored[dst] - m_t).
    alphas = jnp.concatenate([alpha0[None], alpha_ys[:-1]], axis=0)

    def bwd_step(beta, xs):
        aw, oh, a_t, m_t, t = xs
        inject = (g.graph_len == t + 1)
        beta_eff = jnp.where(inject[:, None],
                             g.final - tlp_local[:, None], beta)
        vf = aw + beta_eff[:, :, None] - m_t[:, None, None]
        asel = safe_log(jnp.einsum("bjaw,bw->bja", oh, jnp.exp(a_t)))
        occ = jnp.exp(asel + vf)                     # linear posteriors
        b_new = safe_log(jnp.einsum("bjaw,bja->bw", oh, jnp.exp(vf)))
        active = t < lengths
        beta_out = jnp.where(active[:, None], b_new, beta_eff)
        occ = jnp.where(active[:, None, None], occ, 0.0)
        return beta_out, occ

    ts_rev = jnp.arange(kmax - 1, -1, -1, dtype=jnp.int32)
    beta0 = jnp.full((B, W), NEG_INF, x.dtype)
    _, occ_rev = jax.lax.scan(
        bwd_step, beta0,
        (aw_tm[::-1], oh_tm[::-1], alphas[::-1], m_ys[::-1], ts_rev))
    occ = jnp.swapaxes(occ_rev[::-1], 0, 1)          # (B, kmax, W, A)

    gamma_k = jnp.einsum("btja,btjap->btp", occ, onehot_p)
    gamma_k = jnp.where(feasible[:, None, None], gamma_k, 0.0)
    gamma = jnp.zeros((B, T, P), x.dtype).at[:, :kmax].set(gamma_k)

    frame_mask = (jnp.arange(T, dtype=jnp.int32)[None, :]
                  < lengths[:, None])
    gamma_sum = gamma.sum(axis=2)
    alpha_beta = jnp.where(frame_mask & feasible[:, None],
                           gamma_sum, 0.0)
    ok = feasible & jnp.isfinite(objf) \
        & (jnp.abs(jnp.where(feasible, gamma_sum[:, 0], 1.0) - 1.0)
           <= 0.05)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum)

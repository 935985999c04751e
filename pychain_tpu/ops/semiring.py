"""Dense one-hot log-semiring engine for ARBITRARY numerator graphs.

The reference runs any log-domain graph through its CUDA kernels
(chain-log-domain-kernels.cu:86-235: per-(seq,state) threads looping
arcs, atomicLogAdd for gamma).  The TPU-generic equivalent here keeps
the exact log-domain recurrences of ``ops.fwdbwd.forward_backward_log``
(reference chain-log-domain-computation.cc) but replaces every per-row
gather/scatter in the scan with batched one-hot MXU contractions:

* arc weights ``exp(logp + x[pdf] - c_t)`` are hoisted OUT of the scan
  (one big take_along_axis over all frames, one exp),
* per frame, gather ``alpha[src]`` and scatter-to-``dst`` become two
  (B, K, S) one-hot einsums — batched K x S matmuls on the MXU,
* the log-semiring is computed in max-shifted linear space: each
  logsumexp is shifted by the exact running maxima (per-frame arc max
  ``c_t``, per-sequence state max), so the only mass lost is below
  f32's ~1e-38 floor — strictly tighter than the reference's LogAdd
  cutoff at log(FLT_EPSILON) (chain-log-domain-kernels.cu:24-45),
* gamma is one deterministic vmapped segment-sum after the scan
  (replacing atomicLogAdd), as everywhere else in this package.

This is the fast path for cyclic / self-loop / DAG numerator
supervisions that the linear (ops/linear.py) and leveled
(ops/leveled.py) engines reject.  Dense one-hots cost B*K*S floats, so
dispatch guards on a size budget and falls back to the gather engine
beyond it.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .fwdbwd import FwdBwdResult, _ok_flags, safe_log

NEG_INF = float("-inf")

# One-hot budget: 2 * B*K*S f32 arrays must stay comfortably inside
# HBM next to activations.  2^26 elements = 256 MiB per one-hot.
ONEHOT_BUDGET = 1 << 26


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SemiringArrays:
    """Batched arbitrary log-domain graphs, one-hot compiled."""
    src_oh: jax.Array   # (B, K, S) f32 one-hot of arc source states
    dst_oh: jax.Array   # (B, K, S) f32 one-hot of arc destination states
    pdf: jax.Array      # (B, K) int32 arc pdf ids (0 on padding)
    logp: jax.Array     # (B, K) f32 arc log-probs (-inf on padding)
    initial: jax.Array  # (B, S) f32 log initial probs
    final: jax.Array    # (B, S) f32 log final probs
    # execution engine: "xla" (lax.scan of einsums) or "pallas"
    # (VMEM-resident fused kernels; same f32 numerics)
    engine: str = dataclasses.field(default="xla",
                                    metadata=dict(static=True))

    @property
    def num_states(self) -> int:
        return self.src_oh.shape[2]


def fits_budget(batch_size: int, max_k: int, max_s: int) -> bool:
    return batch_size * max_k * max_s <= ONEHOT_BUDGET


def semiring_arrays(graphs, max_k: int, max_s: int) -> SemiringArrays:
    """Compile a list of log-domain ChainGraphs to one-hot form."""
    B = len(graphs)
    src_oh = np.zeros((B, max_k, max_s), np.float32)
    dst_oh = np.zeros((B, max_k, max_s), np.float32)
    pdf = np.zeros((B, max_k), np.int32)
    logp = np.full((B, max_k), NEG_INF, np.float32)
    initial = np.full((B, max_s), NEG_INF, np.float32)
    final = np.full((B, max_s), NEG_INF, np.float32)
    for i, g in enumerate(graphs):
        k, s = g.num_transitions, g.num_states
        t = g.forward_transitions
        src_oh[i, np.arange(k), t[:, 0]] = 1.0
        dst_oh[i, np.arange(k), t[:, 1]] = 1.0
        pdf[i, :k] = t[:, 2]
        logp[i, :k] = g.forward_transition_probs
        initial[i, :s] = g.initial_probs
        final[i, :s] = g.final_probs
    dev = jax.device_put(dict(src_oh=src_oh, dst_oh=dst_oh, pdf=pdf,
                              logp=logp, initial=initial, final=final))
    return SemiringArrays(
        src_oh=dev["src_oh"], dst_oh=dev["dst_oh"], pdf=dev["pdf"],
        logp=dev["logp"], initial=dev["initial"], final=dev["final"])


_PREC = jax.lax.Precision.HIGHEST  # parity engine: f32 means f32

# Per-element TPU gathers/scatters cost ~8 cycles regardless of size;
# a (B, K, P) one-hot contraction on the MXU is ~40x faster at these
# shapes and bit-exact (one-hot entries).  Above this element budget
# the materialised one-hot would not pay for itself in HBM.
ONEHOT_EM_BUDGET = 1 << 26


def _emissions(x, g: SemiringArrays):
    """Arc emissions em[b,t,k] = x[b,t,pdf[b,k]] for all frames at once.

    One-hot matmul when (B, K, P) fits the budget (bit-exact, MXU),
    else a single big gather."""
    B, T, P = x.shape
    K = g.pdf.shape[1]
    if B * K * P <= ONEHOT_EM_BUDGET:
        oh = jax.nn.one_hot(g.pdf, P, dtype=x.dtype)        # (B, K, P)
        return jnp.einsum("btp,bkp->btk", x, oh, precision=_PREC)
    return jnp.take_along_axis(
        x, jnp.broadcast_to(g.pdf[:, None, :], (B, T, K)), axis=2)


def _gamma_from_occ(occ, g: SemiringArrays, P: int):
    """gamma[b,t,p] = sum_k occ[b,t,k] [pdf[b,k] == p] — transposed
    one-hot matmul within budget, else a vmapped segment-sum."""
    B, T, K = occ.shape
    if B * K * P <= ONEHOT_EM_BUDGET:
        oh = jax.nn.one_hot(g.pdf, P, dtype=occ.dtype)
        return jnp.einsum("btk,bkp->btp", occ, oh, precision=_PREC)
    return jax.vmap(
        lambda o, p: jax.ops.segment_sum(o.T, p, num_segments=P).T
    )(occ, g.pdf)


def _shift_exp(a):
    """(exp(a - max), max-with-safe-zero) along the last axis."""
    m = jnp.max(a, axis=-1, keepdims=True)
    msafe = jnp.where(jnp.isfinite(m), m, 0.0)
    return jnp.exp(a - msafe), msafe[..., 0]


def _add_scale(logv, scale):
    """logv + scale with dead sequences (scale = inf - inf = nan, or
    -inf) pinned to -inf instead of poisoning downstream frames with
    nan: once alpha/beta mass dies, everything after is -inf."""
    return jnp.where(jnp.isfinite(scale)[:, None],
                     logv + jnp.where(jnp.isfinite(scale), scale,
                                      0.0)[:, None],
                     NEG_INF)


def forward_backward_semiring(x, lengths, g: SemiringArrays) -> FwdBwdResult:
    """Fused log-domain fwd+bwd.  x: (B, T, P) clamped log-likelihoods.

    Semantics are identical to forward_backward_log (the reference
    recurrences, chain-log-domain-computation.cc): per-frame arbitrary
    scale by logsumexp(alpha), objf gathered at each sequence's own
    length, beta injection at T_b, linear-space gamma.
    """
    B, T, P = x.shape
    S = g.num_states
    K = g.logp.shape[1]
    lengths = lengths.astype(jnp.int32)

    # Hoisted arc emissions: one one-hot contraction over all frames.
    em = _emissions(x, g)
    arc = g.logp[:, None, :] + em                       # (B, T, K)
    warc, c = _shift_exp(arc)                           # (B,T,K), (B,T)

    warc_tm = jnp.swapaxes(warc, 0, 1)                  # (T, B, K)
    c_tm = jnp.swapaxes(c, 0, 1)                        # (T, B)
    ts = jnp.arange(1, T + 1, dtype=jnp.int32)

    a0 = jnp.broadcast_to(g.initial, (B, S))
    s0 = jnp.zeros((B,), x.dtype)                       # alpha-sum(0) := 0

    def fwd_step(carry, xs):
        a_prev, s_prev, ll = carry
        w_t, c_t, t = xs
        ea, ma = _shift_exp(a_prev)                     # (B,S), (B,)
        asel = jnp.einsum("bks,bs->bk", g.src_oh, ea,
                          precision=_PREC)              # exp(a[src]-ma)
        contrib = asel * w_t                            # (B, K)
        a_lin = jnp.einsum("bks,bk->bs", g.dst_oh, contrib,
                           precision=_PREC)
        a_t = _add_scale(safe_log(a_lin), ma + c_t - s_prev)
        s_t = jax.nn.logsumexp(a_t, axis=1)
        active = t <= lengths
        ll = ll + jnp.where(t < lengths, s_t, 0.0)
        a_new = jnp.where(active[:, None], a_t, a_prev)
        s_new = jnp.where(active, s_t, s_prev)
        return (a_new, s_new, ll), (a_new, s_new)

    (_, _, ll), (a_ys, s_ys) = jax.lax.scan(
        fwd_step, (a0, s0, jnp.zeros((B,), x.dtype)),
        (warc_tm, c_tm, ts))

    alpha = jnp.concatenate([a0[None], a_ys], axis=0)   # (T+1, B, S)
    alpha_sums = jnp.concatenate([s0[None], s_ys], axis=0)

    a_last = jnp.take_along_axis(
        alpha, lengths[None, :, None], axis=0)[0]
    tlp = jax.nn.logsumexp(a_last + g.final, axis=1)    # (B,)
    objf = ll + tlp

    # ---------------- backward + posteriors ---------------------------
    b_final = g.final - tlp[:, None]
    ts_rev = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    xs = (warc_tm[::-1], c_tm[::-1], alpha[:T][::-1],
          alpha_sums[:T][::-1], ts_rev)

    def bwd_step(b_next, xs):
        w_t, c_t, a_t, s_t, t = xs
        inject = (lengths == t + 1)
        b_eff = jnp.where(inject[:, None], b_final, b_next)
        eb, mb = _shift_exp(b_eff)
        bsel = jnp.einsum("bks,bs->bk", g.dst_oh, eb,
                          precision=_PREC)              # exp(b[dst]-mb)
        vf_lin = w_t * bsel                             # exp(vf-mb-c+s)
        b_lin = jnp.einsum("bks,bk->bs", g.src_oh, vf_lin,
                           precision=_PREC)
        b_t = _add_scale(safe_log(b_lin), mb + c_t - s_t)

        ea, ma = _shift_exp(a_t)
        asel = jnp.einsum("bks,bs->bk", g.src_oh, ea,
                          precision=_PREC)
        # occ = exp(vf + a[src]); assembled in log space so large
        # per-factor magnitudes cannot overflow before cancelling
        occ = jnp.exp(_add_scale(safe_log(vf_lin) + safe_log(asel),
                                 ma + mb + c_t - s_t))
        active = (t < lengths)
        b_new = jnp.where(active[:, None], b_t, b_eff)
        occ = jnp.where(active[:, None], occ, 0.0)
        ab = jax.nn.logsumexp(a_t + b_new, axis=1)
        return b_new, (occ, ab)

    _, (occ_rev, ab_rev) = jax.lax.scan(
        bwd_step, jnp.full((B, S), NEG_INF, x.dtype), xs)
    occ = jnp.swapaxes(occ_rev[::-1], 0, 1)             # (B, T, K)
    alpha_beta = jnp.swapaxes(jnp.exp(ab_rev[::-1]), 0, 1)

    # Deterministic gamma: one one-hot contraction arcs -> pdfs.
    gamma = _gamma_from_occ(occ, g, P)                  # (B, T, P)
    gamma_sum = gamma.sum(axis=2)
    ok = _ok_flags(objf, alpha_beta, gamma_sum)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum)

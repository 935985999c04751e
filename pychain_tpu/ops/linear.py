"""Closed-form numerator path for linear supervision graphs.

The standard chain numerator FST is a linear chain (forced-alignment
supervision: state t --pdf_t--> state t+1, reference consumers build
these per utterance).  For a linear graph the log-domain
forward-backward collapses to a closed form — there is exactly ONE path:

    objf_b = sum_{t < T_b} (x[b, t, pdf_t] + logp_t) + final_b
    gamma[b, t, pdf_t] = 1            (t < T_b)

with objf = -inf when the sequence length differs from the chain length
(no accepting path), matching the general recurrence exactly.  This
removes the T-step sequential scan entirely: two whole-batch ops
instead of ~500 masked gather/logsumexp steps.

Detection lives in ChainGraphBatch; semantics are tested against the
generic log-domain engine and the float64 oracle.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .fwdbwd import FwdBwdResult

NEG_INF = float("-inf")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LinearArrays:
    """Batched linear numerator graphs (log domain)."""
    pdf_seq: jax.Array    # (B, Kmax) int32, padded with 0
    logp_seq: jax.Array   # (B, Kmax) float32, padded with 0
    final: jax.Array      # (B,) float32 log final prob of the end state
    graph_len: jax.Array  # (B,) int32 number of arcs per graph


def is_linear_graph(g) -> bool:
    """True if a log-domain ChainGraph is a single linear chain.
    Cached on the graph: ChainGraphs are immutable after construction
    and re-batched every minibatch."""
    cached = getattr(g, "_is_linear_cache", None)
    if cached is None:
        cached = _is_linear_graph(g)
        try:
            g._is_linear_cache = cached
        except AttributeError:
            pass
    return cached


def _is_linear_graph(g) -> bool:
    if not g.log_domain:
        return False
    S, K = g.num_states, g.num_transitions
    if K != S - 1 or g.start_state != 0:
        return False
    t = g.forward_transitions
    if not (np.all(t[:, 0] == np.arange(K))
            and np.all(t[:, 1] == np.arange(1, K + 1))):
        return False
    # only the last state may be final; initial mass only at state 0
    if np.isfinite(g.final_probs[:-1]).any():
        return False
    if not np.isfinite(g.final_probs[-1]):
        return False
    init = np.asarray(g.initial_probs)
    return bool(init[0] == 0.0 and np.all(np.isneginf(init[1:])))


def linear_arrays(graphs, max_k: int) -> LinearArrays:
    B = len(graphs)
    pdf = np.zeros((B, max_k), np.int32)
    logp = np.zeros((B, max_k), np.float32)
    final = np.zeros(B, np.float32)
    glen = np.zeros(B, np.int32)
    for i, g in enumerate(graphs):
        k = g.num_transitions
        pdf[i, :k] = g.forward_transitions[:, 2]
        logp[i, :k] = g.forward_transition_probs
        final[i] = g.final_probs[-1]
        glen[i] = k
    dev = jax.device_put(dict(pdf=pdf, logp=logp, final=final,
                              glen=glen))
    return LinearArrays(pdf_seq=dev["pdf"], logp_seq=dev["logp"],
                        final=dev["final"], graph_len=dev["glen"])


def forward_backward_linear(x, lengths, g: LinearArrays) -> FwdBwdResult:
    """Closed-form objf + posteriors.  x: (B, T, P) clamped log-probs."""
    B, T, P = x.shape
    K = g.pdf_seq.shape[1]
    lengths = lengths.astype(jnp.int32)

    kmax = min(K, T)
    pdf = g.pdf_seq[:, :kmax]
    ts = jnp.arange(kmax, dtype=jnp.int32)
    mask = ts[None, :] < lengths[:, None]                 # (B, kmax)

    emis = jnp.take_along_axis(
        x[:, :kmax, :], pdf[:, :, None].astype(jnp.int32), axis=2)[..., 0]
    objf = jnp.where(mask, emis + g.logp_seq[:, :kmax], 0.0).sum(1) \
        + g.final
    # no accepting path unless the sequence length equals the chain length
    feasible = (lengths == g.graph_len) & (g.graph_len <= T)
    objf = jnp.where(feasible, objf, NEG_INF)

    gamma_k = jnp.where(mask[:, :, None] & feasible[:, None, None],
                        jax.nn.one_hot(pdf, P, dtype=x.dtype), 0.0)
    gamma = jnp.zeros((B, T, P), x.dtype).at[:, :kmax, :].set(gamma_k)

    frame_mask = jnp.arange(T, dtype=jnp.int32)[None, :] < lengths[:, None]
    alpha_beta = jnp.where(frame_mask & feasible[:, None], 1.0, 0.0)
    gamma_sum = gamma.sum(axis=2)
    ok = feasible & jnp.isfinite(objf)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum)

"""Independent dense float64 oracle for forward-backward, used in tests.

This is deliberately a *different* implementation of the same math as
``pychain_tpu.ops.fwdbwd``: dense (S, S)-style einsums instead of sparse
arc sweeps, float64 instead of float32, torch autograd instead of a
hand-derived VJP, and no arbitrary-scale renormalisation (which is
mathematically invisible — chain-computation.h:89-107).  Agreement
between the two is therefore strong evidence of correctness.

The math being checked is the reference's "version 3" recurrence
(chain-computation.h:109-155) for the probability domain with leaky HMM,
and the plain log-semiring recurrence for the log domain
(chain-log-domain-computation.cc).
"""

from __future__ import annotations

import numpy as np
import torch


def _dense_weights(graph, t_probs, transitions, S, P):
    """Per-arc tensors -> torch dense scatter helpers."""
    src = torch.from_numpy(transitions[:, 0].astype(np.int64))
    dst = torch.from_numpy(transitions[:, 1].astype(np.int64))
    pdf = torch.from_numpy(transitions[:, 2].astype(np.int64))
    p = torch.from_numpy(np.asarray(t_probs, np.float64))
    return src, dst, pdf, p


def oracle_objf_prob(x, lengths, graphs, leaky_coefficient):
    """Probability-domain objective + gamma via torch autograd.

    x: (B, T, P) float numpy (nnet output, NOT exp'd, assumed within the
    clamp range).  graphs: list of B ChainGraph-like objects with numpy
    fields (forward_transitions, forward_transition_probs, initial_probs,
    final_probs, leaky_probs).  Returns (objf (B,), gamma (B, T, P)).
    """
    B, T, P = x.shape
    xt = torch.tensor(np.asarray(x, np.float64), requires_grad=True)
    px = xt.exp()
    objfs = []
    for b in range(B):
        g = graphs[b]
        S = g.num_states
        src, dst, pdf, p = _dense_weights(
            g, g.forward_transition_probs, g.forward_transitions, S, P)
        init = torch.from_numpy(np.asarray(g.initial_probs, np.float64))
        final = torch.from_numpy(np.asarray(g.final_probs, np.float64))
        leaky = torch.from_numpy(np.asarray(g.leaky_probs, np.float64))
        Tb = int(lengths[b])

        alpha = init.clone()
        alpha_dash = alpha + leaky_coefficient * alpha.sum() * leaky
        for t in range(1, Tb + 1):
            w = alpha_dash[src] * p * px[b, t - 1, pdf]
            alpha = torch.zeros(S, dtype=torch.float64).index_add_(0, dst, w)
            alpha_dash = alpha + leaky_coefficient * alpha.sum() * leaky
        objfs.append(torch.log((alpha_dash * final).sum()))
    objf = torch.stack(objfs)
    objf.sum().backward()
    return objf.detach().numpy(), xt.grad.numpy()


def oracle_objf_log(x, lengths, graphs):
    """Log-domain objective + gamma via torch autograd.

    Same contract as :func:`oracle_objf_prob` but graphs carry log-domain
    probs and no leaky component.
    """
    B, T, P = x.shape
    xt = torch.tensor(np.asarray(x, np.float64), requires_grad=True)
    objfs = []
    for b in range(B):
        g = graphs[b]
        S = g.num_states
        src, dst, pdf, p = _dense_weights(
            g, g.forward_transition_probs, g.forward_transitions, S, P)
        init = torch.from_numpy(np.asarray(g.initial_probs, np.float64))
        final = torch.from_numpy(np.asarray(g.final_probs, np.float64))
        Tb = int(lengths[b])

        alpha = init.clone()
        for t in range(1, Tb + 1):
            terms = alpha[src] + p + xt[b, t - 1, pdf]
            # torch lacks scatter-logsumexp; do it stably by hand:
            m = torch.full((S,), -float("inf"), dtype=torch.float64)
            m = m.scatter_reduce(0, dst, terms.detach(), reduce="amax")
            finite = torch.isfinite(m)
            msafe = torch.where(finite, m, torch.zeros(()))
            e = torch.zeros(S, dtype=torch.float64).index_add_(
                0, dst, (terms - msafe[dst]).exp())
            # guard log(0) so autograd does not produce 0 * inf = NaN
            e_safe = torch.where(finite & (e > 0), e, torch.ones(()))
            alpha = torch.where(
                finite & (e > 0), e_safe.log() + msafe,
                torch.full((), -float("inf"), dtype=torch.float64))
        objfs.append(torch.logsumexp(alpha + final, dim=0))
    objf = torch.stack(objfs)
    objf.sum().backward()
    return objf.detach().numpy(), xt.grad.numpy()


def brute_force_objf_log(x_b, T_b, graph):
    """Exact path enumeration for tiny log-domain graphs: sums
    exp(score) over every length-T_b path from the start distribution to
    a final state.  Exponential cost — only for S, T <= ~8 tests."""

    S = graph.num_states
    trans = graph.forward_transitions
    probs = graph.forward_transition_probs
    init = np.asarray(graph.initial_probs, np.float64)
    final = np.asarray(graph.final_probs, np.float64)
    arcs_from = {s: [] for s in range(S)}
    for k in range(trans.shape[0]):
        arcs_from[int(trans[k, 0])].append(
            (int(trans[k, 1]), int(trans[k, 2]), float(probs[k])))

    total = -np.inf
    start_states = [s for s in range(S) if np.isfinite(init[s])]

    def rec(state, t, score):
        nonlocal total
        if t == T_b:
            if np.isfinite(final[state]):
                total = np.logaddexp(total, score + final[state])
            return
        for (dst, pdf, lp) in arcs_from[state]:
            rec(dst, t + 1, score + lp + float(x_b[t, pdf]))

    for s in start_states:
        rec(s, 0, float(init[s]))
    return total

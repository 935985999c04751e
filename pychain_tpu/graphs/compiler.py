"""Graph compiler: lower an FST into flat transition tensors.

TPU-native equivalent of the reference's ``fst_to_tensor`` and
``set_leaky_probs`` (/root/reference/openfst_binding/src/fstext.cc:19-117
and :120-171).  Semantics match the reference exactly:

* ``pdf_id = ilabel - 1`` (fstext.cc:41); ilabel 0 (epsilon) is invalid,
* arc log-prob = negated tropical weight (fstext.cc:43),
* per-state final log-prob = negated final weight (fstext.cc:37),
* forward arc list grouped by source state, backward list grouped by
  destination state, each with CSR ``[begin, end)`` index pairs,
* when not ``log_domain``, probs and final probs are exponentiated
  (fstext.cc:89-107).

The output is a :class:`CompiledGraph` of numpy arrays — a static-shape,
device-agnostic encoding that the JAX forward-backward consumes directly.
A C++ implementation with identical output lives in ``pychain_tpu/csrc``
for bulk offline compilation; tests assert parity between the two.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .fst import FST, n_arcs, n_states


@dataclass
class CompiledGraph:
    """Flat tensor encoding of one decoding/training graph.

    ``forward_transitions``  (K, 3) int32 rows ``[src, dst, pdf]`` sorted by src.
    ``forward_transition_probs``  (K,) float32 (prob or log-prob domain).
    ``forward_transition_indices``  (S, 2) int32 CSR ``[begin, end)`` per src.
    ``backward_*``  same, sorted/indexed by destination state.
    ``final_probs``  (S,) float32.
    ``leaky_probs``  (S,) float32 (prob domain only, else None).
    ``initial_probs``  (S,) float32.
    """

    num_states: int
    start_state: int
    log_domain: bool
    forward_transitions: np.ndarray
    forward_transition_probs: np.ndarray
    forward_transition_indices: np.ndarray
    backward_transitions: np.ndarray
    backward_transition_probs: np.ndarray
    backward_transition_indices: np.ndarray
    final_probs: np.ndarray
    initial_probs: np.ndarray | None = None
    leaky_probs: np.ndarray | None = None

    @property
    def num_transitions(self) -> int:
        return int(self.forward_transitions.shape[0])


def _csr_indices(sort_keys: np.ndarray, num_states: int) -> np.ndarray:
    """[begin, end) per state for arcs sorted by ``sort_keys``."""
    counts = np.bincount(sort_keys, minlength=num_states).astype(np.int64)
    ends = np.cumsum(counts)
    begins = ends - counts
    return np.stack([begins, ends], axis=1).astype(np.int32)


def compile_fst(fst: FST, log_domain: bool = False) -> CompiledGraph:
    """Lower ``fst`` to flat transition tensors (fst_to_tensor parity)."""
    S = n_states(fst)
    K = n_arcs(fst)
    if S == 0 or K == 0:
        raise ValueError("cannot compile an empty FST")

    src = np.repeat(
        np.arange(S, dtype=np.int64), np.diff(fst.arc_offsets)
    )  # arcs are already stored grouped by source state
    dst = fst.nextstates.astype(np.int64)
    pdf = fst.ilabels.astype(np.int64) - 1
    if pdf.min() < 0:
        raise ValueError("FST has epsilon (ilabel=0) arcs; pdf_id = ilabel - 1 "
                         "requires ilabel >= 1 (fstext.cc:41-42)")
    log_probs = (-fst.weights).astype(np.float32)
    final_log = (-fst.final).astype(np.float32)  # non-final -> -inf

    fwd_transitions = np.stack([src, dst, pdf], axis=1).astype(np.int32)
    fwd_probs = log_probs.copy()
    fwd_indices = _csr_indices(src, S)

    order = np.argsort(dst, kind="stable")
    bwd_transitions = fwd_transitions[order]
    bwd_probs = log_probs[order]
    bwd_indices = _csr_indices(dst[order], S)

    final_probs = final_log
    if not log_domain:
        fwd_probs = np.exp(fwd_probs)
        bwd_probs = np.exp(bwd_probs)
        final_probs = np.exp(final_log)

    return CompiledGraph(
        num_states=S,
        start_state=fst.start,
        log_domain=log_domain,
        forward_transitions=fwd_transitions,
        forward_transition_probs=fwd_probs,
        forward_transition_indices=fwd_indices,
        backward_transitions=bwd_transitions,
        backward_transition_probs=bwd_probs,
        backward_transition_indices=bwd_indices,
        final_probs=final_probs,
    )


def leaky_probs(fst: FST, num_iters: int = 100) -> np.ndarray:
    """Leaky-HMM state priors by power iteration (set_leaky_probs parity,
    fstext.cc:120-171).

    Each state's outgoing mass (arc probs + final prob) is normalised to
    one, then the chain is run ``num_iters`` steps from a one-hot start
    distribution, renormalising and averaging the occupancies.
    """
    S = n_states(fst)
    src = np.repeat(np.arange(S), np.diff(fst.arc_offsets))
    dst = fst.nextstates.astype(np.int64)
    arc_prob = np.exp(-fst.weights.astype(np.float64))
    final_prob = np.exp(-fst.final.astype(np.float64))

    tot = final_prob + np.bincount(src, weights=arc_prob, minlength=S)
    if not np.all((tot > 0.0) & (tot < 100.0)):
        raise ValueError("state probability mass out of range (fstext.cc:140)")
    nf = 1.0 / tot

    cur = np.zeros(S, np.float64)
    cur[fst.start] = 1.0
    avg = np.zeros(S, np.float64)
    for _ in range(num_iters):
        avg += cur / num_iters
        flow = cur[src] * nf[src] * arc_prob
        nxt = np.bincount(dst, weights=flow, minlength=S)
        cur = nxt / nxt.sum()
    return avg.astype(np.float32)

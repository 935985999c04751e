"""Graph structure analyzer: lower an FST to MXU-friendly dense algebra.

The generic forward-backward update is an arc sweep
``alpha_t[dst] += alpha'[src] * p * x_t[pdf]`` — a gather/segment-sum
per frame, which on TPU is memory-bound on (K, B)-sized HBM
intermediates.  This module removes the K-sized gathers entirely by
exploiting structure every Kaldi-style chain graph has:

* each arc's pdf is (almost always) a function of its destination state
  (self-loops, cross-phone arcs) or of its source state (within-phone
  forward arcs).

Split the arcs into three sets:

* **W1** (dst-attached): ``alpha_t = x_dst ⊙ (W1 @ alpha')`` where
  ``W1[d, s] = Σ p`` over those arcs and ``x_dst[d] = x_t[f(d)]``,
* **W2** (src-attached): ``alpha_t += W2 @ (x_src ⊙ alpha')``,
* a residual set handled by the generic gather path (empty for HMM
  topologies).

W1/W2 are (S, S) sparse; states are RELABELLED by a structural-role
ordering so the nonzeros cluster into few 128x128 tiles, stored as
block-sparse tile lists that run as batched MXU matmuls.  Emission
lookups shrink from K-sized to S-sized gathers, and the occupation
posteriors become S-sized segment-sums over ``f``/``g`` instead of
K-sized atomics (chain-kernels.cu:54-87 in the reference).

This is the TPU-native analogue of the reference compiling FSTs to flat
CSR lists (fstext.cc:19-117): same input, but lowered to dense semiring
algebra instead of scalar arc loops.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .compiler import CompiledGraph

TILE = 128


@dataclass
class FactorizedGraph:
    """Block-sparse factorized form of one prob-domain graph.

    All state-indexed quantities live in the PERMUTED numbering (see
    ``perm``: ``new = perm_inv[old]``); pdf-indexed quantities are
    untouched.  S_pad is a multiple of TILE.
    """

    num_states: int          # original S (un-padded)
    s_pad: int
    perm: np.ndarray         # (S,) old index of each new slot
    # W1: dst-attached arcs.  Tiles (n1, TILE, TILE); block row/col ids.
    w1_tiles: np.ndarray
    w1_rows: np.ndarray
    w1_cols: np.ndarray
    f_dst: np.ndarray        # (S_pad,) pdf per (new) state for the W1 term
    # W2: src-attached arcs.
    w2_tiles: np.ndarray
    w2_rows: np.ndarray
    w2_cols: np.ndarray
    g_src: np.ndarray        # (S_pad,)
    # Residual arcs in new numbering (generic gather path); may be empty.
    res_src: np.ndarray
    res_dst: np.ndarray
    res_pdf: np.ndarray
    res_prob: np.ndarray

    @property
    def num_tiles(self) -> int:
        return int(self.w1_tiles.shape[0] + self.w2_tiles.shape[0])


def _classify_arcs(src, dst, pdf):
    """Greedy pdf attachment: returns (cls, f_dst, g_src) where cls[a] in
    {1 (dst-attached), 2 (src-attached), 0 (residual)}."""
    S = max(src.max(), dst.max()) + 1
    f = np.full(S, -1, np.int64)
    g = np.full(S, -1, np.int64)
    cls = np.zeros(len(src), np.int8)
    # pass 1: bind f(dst) first (covers self-loops + cross arcs)
    for a in range(len(src)):
        d, n = dst[a], pdf[a]
        if f[d] == -1 or f[d] == n:
            f[d] = n
            cls[a] = 1
    # pass 2: remaining arcs try g(src)
    for a in range(len(src)):
        if cls[a]:
            continue
        s, n = src[a], pdf[a]
        if g[s] == -1 or g[s] == n:
            g[s] = n
            cls[a] = 2
    return cls, np.maximum(f, 0), np.maximum(g, 0)


def _role_order(src, dst, pdf, S, final_mask):
    """Order states by structural role so W tiles cluster.

    Buckets by (log2 in-degree, log2 out-degree, final?) — for phone-HMM
    graphs this separates phone-start / phone-middle / phone-end states,
    which is exactly the split that makes the cross-phone block compact.
    """
    ind = np.bincount(dst, minlength=S)
    outd = np.bincount(src, minlength=S)
    key_in = np.clip(np.log2(np.maximum(ind, 1)).astype(np.int64), 0, 12)
    key_out = np.clip(np.log2(np.maximum(outd, 1)).astype(np.int64), 0, 12)
    keys = (key_in * 32 + key_out) * 2 + final_mask.astype(np.int64)
    return np.argsort(keys, kind="stable")  # (S,) old id per new slot


def _build_tiles(rows, cols, vals, s_pad):
    """Scatter COO entries into dense TILExTILE blocks; return the
    nonzero blocks sorted by (block_row, block_col)."""
    if len(rows) == 0:
        return (np.zeros((0, TILE, TILE), np.float32),
                np.zeros(0, np.int32), np.zeros(0, np.int32))
    br, bc = rows // TILE, cols // TILE
    nbt = s_pad // TILE
    bid = br * nbt + bc
    order = np.argsort(bid, kind="stable")
    rows, cols, vals, bid = rows[order], cols[order], vals[order], bid[order]
    uniq, start = np.unique(bid, return_index=True)
    tiles = np.zeros((len(uniq), TILE, TILE), np.float32)
    t_of_arc = np.searchsorted(uniq, bid)
    # accumulate duplicates (parallel arcs between the same state pair)
    np.add.at(tiles, (t_of_arc, rows % TILE, cols % TILE), vals)
    return tiles, (uniq // nbt).astype(np.int32), (uniq % nbt).astype(np.int32)


def factorize(graph: CompiledGraph) -> FactorizedGraph:
    """Factorize a prob-domain compiled graph for the MXU path."""
    if graph.log_domain:
        raise ValueError("factorized path is for the probability domain")
    S = graph.num_states
    trans = graph.forward_transitions
    src = trans[:, 0].astype(np.int64)
    dst = trans[:, 1].astype(np.int64)
    pdf = trans[:, 2].astype(np.int64)
    probs = graph.forward_transition_probs.astype(np.float32)

    cls, f, g = _classify_arcs(src, dst, pdf)
    final_mask = graph.final_probs > 0
    perm = _role_order(src, dst, pdf, S, final_mask)   # old id per new slot
    inv = np.empty(S, np.int64)
    inv[perm] = np.arange(S)

    s_pad = ((S + TILE - 1) // TILE) * TILE
    nsrc, ndst = inv[src], inv[dst]

    f_new = np.zeros(s_pad, np.int64)
    g_new = np.zeros(s_pad, np.int64)
    f_new[:S] = f[perm]
    g_new[:S] = g[perm]

    m1 = cls == 1
    m2 = cls == 2
    m0 = cls == 0
    w1_tiles, w1_rows, w1_cols = _build_tiles(
        ndst[m1], nsrc[m1], probs[m1], s_pad)
    w2_tiles, w2_rows, w2_cols = _build_tiles(
        ndst[m2], nsrc[m2], probs[m2], s_pad)

    return FactorizedGraph(
        num_states=S,
        s_pad=s_pad,
        perm=perm.astype(np.int32),
        w1_tiles=w1_tiles, w1_rows=w1_rows, w1_cols=w1_cols,
        f_dst=f_new.astype(np.int32),
        w2_tiles=w2_tiles, w2_rows=w2_rows, w2_cols=w2_cols,
        g_src=g_new.astype(np.int32),
        res_src=nsrc[m0].astype(np.int32),
        res_dst=ndst[m0].astype(np.int32),
        res_pdf=pdf[m0].astype(np.int32),
        res_prob=probs[m0],
    )


def permute_state_vector(fg: FactorizedGraph, v: np.ndarray,
                         pad_value: float = 0.0) -> np.ndarray:
    """Map a (S,) state vector into the padded permuted numbering."""
    out = np.full(fg.s_pad, pad_value, v.dtype)
    out[: fg.num_states] = v[fg.perm]
    return out

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
class WParts:
    """One transition matrix stratified for the MXU:

    ``W = diag(diag) + dense (a single dense sub-block) + tiles``.

    * ``diag`` (S_pad,): self-loop-like entries (dst == src); None for
      rectangular matrices,
    * ``dense`` (R, C) covering rows [r0, r0+R) x cols [c0, c0+C) — used
      when the off-diagonal arcs cluster into a mostly-full rectangle
      (the cross-phone block of a denominator graph); None otherwise,
    * ``tiles`` (n, TILE, TILE) block-sparse remainder with block
      row/col ids.
    """
    diag: np.ndarray | None
    dense: np.ndarray | None
    dense_r0: int
    dense_c0: int
    tiles: np.ndarray
    rows: np.ndarray
    cols: np.ndarray

    @property
    def num_tiles(self) -> int:
        return int(self.tiles.shape[0])


@dataclass
class FactorizedGraph:
    """Stratified factorized form of one prob-domain graph.

    All state-indexed quantities live in the PERMUTED numbering (see
    ``perm``: ``new = perm_inv[old]``); pdf-indexed quantities are
    untouched.  S_pad is a multiple of TILE.
    """

    num_states: int          # original S (un-padded)
    s_pad: int
    p_pad: int               # padded pdf-space width for the E matrices
    perm: np.ndarray         # (S,) old index of each new slot
    w1: WParts               # dst-attached arcs
    f_dst: np.ndarray        # (S_pad,) pdf per (new) state for the W1 term
    e_f: WParts              # one-hot (S_pad x P_pad): x_dst = E_f @ x_t
    w2: WParts               # src-attached arcs
    g_src: np.ndarray        # (S_pad,)
    e_g: WParts
    # Residual arcs in new numbering (generic gather path); may be empty.
    res_src: np.ndarray
    res_dst: np.ndarray
    res_pdf: np.ndarray
    res_prob: np.ndarray
    # How a kernel can obtain x_src from the x_dst stream without a
    # second emission gather (see ops/pallas_fact.py):
    #   "identity": g == f on W2's support, so x_src = x_dst,
    #   "matrix":   x_src = E_h @ x_dst for the one-hot state->state
    #               map h with f(h(s)) = g(s),
    #   "stream":   some g pdf is unreachable through f; x_src must be
    #               gathered/streamed separately.
    xsrc_mode: str = "stream"

    @property
    def num_tiles(self) -> int:
        return self.w1.num_tiles + self.w2.num_tiles


def _classify_arcs(src, dst, pdf):
    """Greedy pdf attachment: returns (cls, f_dst, g_src) where cls[a] in
    {1 (dst-attached), 2 (src-attached), 0 (residual)}.

    Self-loops bind ``f(dst)`` first — they are the canonical
    dst-attachment in HMM topologies — so that within-phone forward arcs
    (whose pdf belongs to the SOURCE state) don't steal the binding and
    fragment the factorization."""
    S = max(src.max(), dst.max()) + 1
    f = np.full(S, -1, np.int64)
    g = np.full(S, -1, np.int64)
    cls = np.zeros(len(src), np.int8)
    # pass 0: self-loops bind f(dst)
    for a in np.nonzero(src == dst)[0]:
        d, n = dst[a], pdf[a]
        if f[d] == -1 or f[d] == n:
            f[d] = n
            cls[a] = 1
    # pass 1: remaining arcs join f(dst) where consistent
    for a in range(len(src)):
        if cls[a]:
            continue
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
    return cls, f, g  # -1 where undefined


def _role_order(src, dst, pdf, S, final_mask):
    """Order states by structural role so W tiles cluster.

    Buckets by the log in/out-degree RATIO (robust to per-state degree
    variance) plus finality — for phone-HMM graphs this separates
    phone-start states (fan-in heavy), phone-middle (balanced), and
    phone-end states (fan-out heavy, usually final), which is exactly
    the split that makes the cross-phone block one compact rectangle.
    """
    ind = np.bincount(dst, minlength=S).astype(np.float64)
    outd = np.bincount(src, minlength=S).astype(np.float64)
    ratio = np.clip(np.round(np.log2((ind + 1.0) / (outd + 1.0))), -4, 4)
    keys = (ratio.astype(np.int64) + 4) * 2 + final_mask.astype(np.int64)
    return np.argsort(keys, kind="stable")  # (S,) old id per new slot


def _build_tiles(rows, cols, vals, cols_pad):
    """Scatter COO entries into dense TILExTILE blocks; return the
    nonzero blocks sorted by (block_row, block_col)."""
    if len(rows) == 0:
        return (np.zeros((0, TILE, TILE), np.float32),
                np.zeros(0, np.int32), np.zeros(0, np.int32))
    br, bc = rows // TILE, cols // TILE
    nbt = cols_pad // TILE
    bid = br * nbt + bc
    order = np.argsort(bid, kind="stable")
    rows, cols, vals, bid = rows[order], cols[order], vals[order], bid[order]
    uniq, start = np.unique(bid, return_index=True)
    tiles = np.zeros((len(uniq), TILE, TILE), np.float32)
    t_of_arc = np.searchsorted(uniq, bid)
    # accumulate duplicates (parallel arcs between the same state pair)
    np.add.at(tiles, (t_of_arc, rows % TILE, cols % TILE), vals)
    return tiles, (uniq // nbt).astype(np.int32), (uniq % nbt).astype(np.int32)


def _build_wparts(rows, cols, vals, s_pad, cols_pad=None, square=True,
                  dense_min_fill=0.4, dense_max_area=4 << 21) -> WParts:
    """Stratify one matrix's COO entries into diag + dense box + tiles.

    * exact-diagonal entries become a vector (elementwise, no matmul;
      square matrices only),
    * if the remaining entries' TILE-aligned bounding box is at least
      ``dense_min_fill`` full of nonzero tiles (and not absurdly large),
      they become one dense sub-block — a single MXU matmul per frame
      with no per-tile gather/scatter intermediates,
    * anything left becomes block-sparse tiles.
    """
    cols_pad = s_pad if cols_pad is None else cols_pad
    diag = np.zeros(s_pad, np.float32)
    if square:
        on_diag = rows == cols
        np.add.at(diag, rows[on_diag], vals[on_diag])
        rows, cols, vals = rows[~on_diag], cols[~on_diag], vals[~on_diag]

    dense = None
    dense_r0 = dense_c0 = 0
    if len(rows):
        r0 = int(rows.min()) // TILE * TILE
        r1 = (int(rows.max()) // TILE + 1) * TILE
        c0 = int(cols.min()) // TILE * TILE
        c1 = (int(cols.max()) // TILE + 1) * TILE
        area_tiles = ((r1 - r0) // TILE) * ((c1 - c0) // TILE)
        nz_tiles = len(set(zip(rows // TILE, cols // TILE)))
        if (nz_tiles / area_tiles >= dense_min_fill
                and (r1 - r0) * (c1 - c0) <= dense_max_area):
            dense = np.zeros((r1 - r0, c1 - c0), np.float32)
            np.add.at(dense, (rows - r0, cols - c0), vals)
            dense_r0, dense_c0 = r0, c0
            rows = np.zeros(0, np.int64)
            cols = np.zeros(0, np.int64)
            vals = np.zeros(0, np.float32)

    tiles, trows, tcols = _build_tiles(rows, cols, vals, cols_pad)
    return WParts(diag=diag if square else None, dense=dense,
                  dense_r0=dense_r0, dense_c0=dense_c0, tiles=tiles,
                  rows=trows, cols=tcols)


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

    cls, f_raw, g_raw = _classify_arcs(src, dst, pdf)
    f = np.maximum(f_raw, 0)
    g = np.maximum(g_raw, 0)
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

    # Emission-attachment structure.  "identity" (g == f wherever g is
    # defined, i.e. on W2's support) lets the kernels alias
    # x_src = x_dst and merge the two gamma scatters into one E_f^T.
    # The "matrix"/"stream" labels record how g relates to f for
    # diagnostics; both compute x_src = E_g @ px in-kernel.
    xsrc_mode = "stream"
    g_def = np.nonzero(g_raw[perm] >= 0)[0]            # new ids, < S
    if len(g_def) == 0:
        xsrc_mode = "identity"
    else:
        finv = {}
        for s_new in range(S):
            if f_raw[perm[s_new]] >= 0:
                finv.setdefault(int(f_new[s_new]), s_new)
        f_def_new = f_raw[perm] >= 0
        h = np.array([s if (f_def_new[s] and f_new[s] == g_new[s])
                      else finv.get(int(g_new[s]), -1) for s in g_def],
                     np.int64)
        if np.all(h >= 0):
            if np.all(h == g_def):
                xsrc_mode = "identity"
            else:
                xsrc_mode = "matrix"

    m1 = cls == 1
    m2 = cls == 2
    m0 = cls == 0
    w1 = _build_wparts(ndst[m1], nsrc[m1], probs[m1], s_pad)
    w2 = _build_wparts(ndst[m2], nsrc[m2], probs[m2], s_pad)

    # One-hot emission maps as block-sparse matrices: x_dst = E_f @ x_t
    # replaces an S-sized gather, and gamma += E_f^T @ c replaces an
    # S-sized scatter — both become MXU matmuls.
    p_pad = ((int(pdf.max()) + 1 + TILE - 1) // TILE) * TILE
    all_states = np.arange(s_pad, dtype=np.int64)
    ones = np.ones(s_pad, np.float32)
    e_f = _build_wparts(all_states, f_new, ones, s_pad, cols_pad=p_pad,
                        square=False)
    e_g = _build_wparts(all_states, g_new, ones, s_pad, cols_pad=p_pad,
                        square=False)

    return FactorizedGraph(
        num_states=S,
        s_pad=s_pad,
        p_pad=p_pad,
        perm=perm.astype(np.int32),
        w1=w1,
        f_dst=f_new.astype(np.int32),
        e_f=e_f,
        w2=w2,
        g_src=g_new.astype(np.int32),
        e_g=e_g,
        res_src=nsrc[m0].astype(np.int32),
        res_dst=ndst[m0].astype(np.int32),
        res_pdf=pdf[m0].astype(np.int32),
        res_prob=probs[m0],
        xsrc_mode=xsrc_mode,
    )


def permute_state_vector(fg: FactorizedGraph, v: np.ndarray,
                         pad_value: float = 0.0) -> np.ndarray:
    """Map a (S,) state vector into the padded permuted numbering."""
    out = np.full(fg.s_pad, pad_value, v.dtype)
    out[: fg.num_states] = v[fg.perm]
    return out

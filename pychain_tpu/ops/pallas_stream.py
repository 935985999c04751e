"""Weight-streaming Pallas kernels: beyond-VMEM denominator graphs.

The VMEM-resident kernels (ops/pallas_fact.py) require the whole
stratified graph to sit on-chip; past ``fits_vmem`` dispatch used to
drop to the XLA factorized engine, which re-reads the weights from HBM
per frame AND materialises ~20 (S_pad, B) intermediates per frame —
measured ~5x off the HBM-bandwidth roofline at S=8000 (361 utts/s,
docs/DESIGN.md).  These kernels close that gap for graphs whose BULK is
W1's sparse tiles (the cross-phone mass of a big denominator — 1024 of
1538 tiles at the S=8000 bench graph):

* W2 / E_f (+E_g) and W1's diag/dense strata stay VMEM-resident as in
  the resident kernels (they are small: ~10 MB at S=8000),
* W1's tile stream rides a THIRD grid dimension: grid = (nb, T, G)
  with the frame's tiles split into G fixed-size chunks; each chunk is
  one double-buffered ``BlockSpec`` block, so Mosaic prefetches chunk
  g+1 from HBM while the MXU contracts chunk g — the weight stream
  overlaps compute exactly like an activation stream would,
* chunk tile coordinates are STATIC: the kernel body carries one
  ``pl.when(g == i)`` branch per chunk (the same total unroll the
  resident kernel pays), and same-column tile runs execute as one tall
  MXU dot with CONTIGUOUS-ROW result slices coalesced into single
  accumulator adds,
* the per-frame recurrence math is IDENTICAL to the resident kernels
  (normalised linear domain, exact {0,1} multiply-add boundary masking,
  no lane-varying selects): a frame's W1 @ alpha' accumulates into a
  VMEM scratch across the G chunk steps and the frame boundary (the
  g == G-1 step) runs the resident kernel's frame-update verbatim.

Per frame the stream traffic is exactly one copy of W1's tiles (bf16),
so throughput is bounded by tiles_bytes * T * 2(sweeps) / HBM_BW --
the speed-of-light for a graph that cannot live on-chip.  Semantics
(and the fwd -> bwd aux streams) match ops/pallas_fact.py "full" mode;
reference recurrences are chain-computation.h:109-155.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .factorized import FactorizedArrays, WArrays, px_time_major
from .fwdbwd import FwdBwdResult
from .pallas_fact import (BF, VMEM_LIMIT, _WK, _interpret, _length_masks,
                          _end_flags_of, _objf_pallas, _package_result,
                          supports)

def stream_hbm_budget() -> int:
    """HBM byte budget for the fwd->bwd aux streams of ONE stream-engine
    call: 40% of the device's memory capacity when the backend reports
    it, else 6 GiB (v5e-class).  The remainder holds the activations
    (x, exp(x), the (T, P, B) posterior, the input gradient) plus the
    graph itself.  Round-4's fixed 4 GiB budget silently cut the stream
    engine off at s_pad 8448 (B=128, T=500, bf16: 4 streams cross
    4 GiB between s_pad 8320 and 8448) — measured as a cliff from 1351
    to 228 utts/s that was actually the XLA fallback running."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        cap = stats.get("bytes_limit") or stats.get(
            "bytes_reservable_limit")
        if cap:
            return int(cap * 0.40)
    except Exception:  # noqa: BLE001 — backend without memory_stats
        pass
    return 6 * 1024 ** 3


_stream_fallback_warned = False


def _warn_stream_fallback(T, s_pad, B, stream_bytes):
    global _stream_fallback_warned
    from ..utils.diagnostics import get_verbose_level
    msg = (f"pychain_tpu: stream engine fwd->bwd aux streams "
           f"({stream_bytes / 1e9:.1f} GB at T={T}, s_pad={s_pad}, "
           f"B={B}) exceed the HBM budget "
           f"({stream_hbm_budget() / 1e9:.1f} GB); falling back to the "
           "XLA factorized engine (typically ~6x slower at this "
           "scale).  Reduce the batch or frame count per call to "
           "re-enter the weight-streaming kernels.")
    if get_verbose_level() >= 1:
        import sys as _sys
        print(msg, file=_sys.stderr)
    if not _stream_fallback_warned:
        _stream_fallback_warned = True
        import warnings
        warnings.warn(msg, RuntimeWarning, stacklevel=3)


# tiles per streamed chunk: 128 x (128, 128) bf16 = 4 MiB per buffer.
# Measured on chip at the S=8000 bench graph (B=64 T=300, ms/batch):
# 32 -> 67.8, 64 -> 60.2, 128 -> 57.2, 256 -> 59.5 — a shallow optimum
# at 128: big enough to amortise per-step pipeline overhead, small
# enough that the double buffer leaves VMEM for the carries.
CHUNK_TILES = 128


def _coalesce_rows(rows):
    """[(local_j, row)] runs with consecutive rows -> (j0, r0, run_len):
    one accumulator slice-add per run instead of per tile."""
    runs = []
    j0 = r0 = None
    n = 0
    for j, r in enumerate(rows):
        if n and r == r0 + n:
            n += 1
        else:
            if n:
                runs.append((j0, r0, n))
            j0, r0, n = j, r, 1
    if n:
        runs.append((j0, r0, n))
    return runs


class _WKStream:
    """Streamed view of one stratified matrix.

    Tiles are re-sorted by (block col, block row) and split into
    fixed-size chunks (same-column runs may span a chunk boundary);
    ``chunks[g]`` is the static metadata of chunk g: a list of
    (col, rows_tuple, local_start).  ``tiles`` is the reordered,
    zero-padded (G * chunk, 128, 128) device array that streams one
    chunk per grid step.  Diag/dense strata stay resident (passed like
    a _WK's arrays)."""

    def __init__(self, w: WArrays, mm_dtype=BF, chunk_tiles=CHUNK_TILES):
        self.mm = jnp.dtype(mm_dtype)
        self.prec = (jax.lax.Precision.DEFAULT if self.mm == jnp.bfloat16
                     else jax.lax.Precision.HIGHEST)
        self.has_diag = w.diag is not None
        self.has_dense = w.dense is not None
        self.r0, self.c0 = w.dense_r0, w.dense_c0
        self.resident = []
        if self.has_diag:
            self.resident.append(jnp.asarray(w.diag, jnp.float32)[:, None])
        if self.has_dense:
            self.resident.append(jnp.asarray(w.dense, self.mm))

        order = sorted(range(len(w.rows)),
                       key=lambda k: (w.cols[k], w.rows[k]))
        self.chunk_tiles = chunk_tiles
        self.chunks = []          # [ [(col, rows, local_start), ...] ]
        cur, cur_n = [], 0
        k = 0
        while k < len(order):
            c = w.cols[order[k]]
            rows = []
            while k < len(order) and w.cols[order[k]] == c:
                rows.append(int(w.rows[order[k]]))
                k += 1
            # split this column run across chunk boundaries
            pos = 0
            while pos < len(rows):
                if cur_n == chunk_tiles:
                    self.chunks.append(cur)
                    cur, cur_n = [], 0
                take = min(chunk_tiles - cur_n, len(rows) - pos)
                cur.append((int(c), tuple(rows[pos:pos + take]), cur_n))
                cur_n += take
                pos += take
        if cur:
            self.chunks.append(cur)
        self.n_chunks = max(1, len(self.chunks))
        if not self.chunks:
            self.chunks = [[]]

        # The reorder permutation and per-chunk destination slots depend
        # only on STATIC metadata (w.rows/w.cols tuples), so compute them
        # on host; the padded stream array is then built with device ops
        # so w.tiles may be a tracer (the graph pytree is routinely a jit
        # argument — ChainLoss._jitted, bench.py's jitted grad_fn).
        dst = np.empty(len(order), np.int32)
        oi = 0                   # walk the sorted order in chunk order
        for ci, chunk in enumerate(self.chunks):
            base = ci * chunk_tiles
            for c, rows, start in chunk:
                for j in range(len(rows)):
                    dst[oi] = base + start + j
                    oi += 1
        tiles = jnp.asarray(w.tiles, self.mm)
        padded = jnp.zeros((self.n_chunks * chunk_tiles, 128, 128),
                           self.mm)
        if len(order):
            src = jnp.asarray(np.asarray(order, np.int32))
            padded = padded.at[jnp.asarray(dst)].set(tiles[src])
        self.tiles = padded

    @property
    def n_resident(self) -> int:
        return len(self.resident)

    def apply_resident(self, refs, v, acc_ref):
        """acc <- diag * v (+ dense block) — the chunk-0 initialisation
        of the accumulator (everything not streamed)."""
        i = 0
        if self.has_diag:
            acc_ref[:] = refs[i][:] * v[: acc_ref.shape[0]]
            i += 1
        else:
            acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)
        if self.has_dense:
            dref = refs[i]
            R, C = dref.shape
            blk = jnp.dot(dref[:], v[self.c0:self.c0 + C].astype(self.mm),
                          preferred_element_type=jnp.float32,
                          precision=self.prec)
            acc_ref[self.r0:self.r0 + R, :] += blk

    def apply_chunk(self, tref, g, v, acc_ref):
        """acc += W1_chunk_g @ v, one pl.when branch per chunk (static
        tile coordinates; Mosaic executes exactly one branch per step).
        """
        for gi, chunk in enumerate(self.chunks):
            if not chunk:
                continue

            @pl.when(g == gi)
            def _(chunk=chunk):
                for c, rows, start in chunk:
                    nk = len(rows)
                    tall = tref[start:start + nk].reshape(nk * 128, 128)
                    blk = jnp.dot(
                        tall, v[c * 128:(c + 1) * 128].astype(self.mm),
                        preferred_element_type=jnp.float32,
                        precision=self.prec)
                    for j0, r0, n in _coalesce_rows(rows):
                        acc_ref[r0 * 128:(r0 + n) * 128, :] += \
                            blk[j0 * 128:(j0 + n) * 128]


def _resident_bytes(wks) -> int:
    tot = 0
    for w in wks:
        tot += sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in w.arrays)
    return tot


def fits_stream(fa: FactorizedArrays, b_tile: int = 128,
                itemsize: int = None,
                chunk_tiles: int = None) -> bool:
    """Can the streamed kernels run this graph?  Requires a fully
    factorized graph whose NON-W1 operands (W2, E matrices, W1's
    diag/dense strata) plus ~8 (s_pad, b_tile) f32 scratches plus the
    chunk double-buffers fit the VMEM plan, with a non-trivial W1 tile
    stream to hide them behind.  The fwd and bwd sweeps hold
    near-mirror resident sets, so either bounds the estimate.

    With an explicit ``chunk_tiles`` the estimate prices exactly what
    the kernel will allocate (forward_backward_prob_stream re-checks
    against the same budget).  With ``chunk_tiles=None`` the question
    is DISPATCH ELIGIBILITY — "can ANY admissible chunk run this
    graph?" — so the estimate uses the MINIMUM chunk auto_chunk_tiles
    can clamp to (8).  Gating dispatch at the default CHUNK_TILES
    instead cost a measured 2.7x: the S=5000 graph's resident set
    only admits small chunks, fits_stream(=128) said no, dispatch fell
    to the XLA scan at 1047 utts/s while the stream kernels at the
    auto-clamped chunk 8 run 2802 (tools/vmem_boundary round-4 vs
    docs/ab/stream_chunk_s5k.txt).
    All operands (including the float32-stored one-hot E matrices) are
    cast to W1's tile dtype by _WK/_WKStream before entering the
    kernel, so W1's itemsize prices the WHOLE resident set correctly in
    both bf16 fast mode and f32 parity mode."""
    if not supports(fa):
        return False
    if itemsize is None:
        itemsize = jnp.dtype(fa.w1.tiles.dtype).itemsize
    if chunk_tiles is None:
        chunk_tiles = 8           # dispatch gate: the minimum chunk
    n_w1 = int(fa.w1.tiles.shape[0])
    if n_w1 == 0:
        return False          # nothing to stream: resident or XLA
    def _side(ws):
        tiles = sum(int(w.tiles.shape[0]) for w in ws)
        dense = sum(int(w.dense.shape[0]) * int(w.dense.shape[1])
                    for w in ws if w.dense is not None)
        return tiles * 128 * 128 * 3 * itemsize + dense * 3 * itemsize
    fwd_ws = [fa.w2, fa.e_f]
    bwd_ws = [fa.w2t, fa.e_ft]
    if fa.xsrc_mode != "identity":
        fwd_ws.append(fa.e_g)
        bwd_ws.append(fa.e_gt)
    dense_w1 = (0 if fa.w1.dense is None
                else int(fa.w1.dense.shape[0]) * int(fa.w1.dense.shape[1]))
    # 7 (s_pad, b_tile) f32 units after the round-5 scratch trim
    # (x_dst/x_src copies and the b_next buffer are gone: inputs are
    # read from their VMEM blocks, b_next recomputes from the frozen
    # bd carry) — this is what admits chunk 128 through s_pad 10112
    # (est 82.8 MB; measured 331.5 utts/s vs 169.6 at the c64 clamp).
    est = max(_side(fwd_ws), _side(bwd_ws)) \
        + dense_w1 * 3 * itemsize \
        + 2 * chunk_tiles * 128 * 128 * itemsize \
        + 7 * fa.s_pad * b_tile * 4
    # Budget re-calibrated round 5, twice.  First: the old 80 MB gate
    # clamped auto_chunk to 64 at s_pad 9088 (est 83 MB at chunk 128)
    # and the G=21 grid-step overhead cost 3.4x — measured 368 utts/s
    # clamped vs 1261 at the forced chunk 128
    # (docs/ab/stream_cliff_forced.json).  Second: the s_pad>9300
    # "residual slide" died under LARGE chunks, and the measured
    # efficient band extends to est ~101 MB — at s_pad 10112 chunk 400
    # (est 100.6 MB) runs 1143 utts/s under the default 100 MB vmem
    # limit while chunk 512 (est 108 MB) degrades to 775
    # (docs/ab/stream_chunk_s10k.json).  101 MB admits the measured
    # optimum and rejects the degraded band;
    # tools/vmem_boundary.py re-verifies compile-or-fallback on chip
    # every sweep.
    return est <= 101 * 1024 * 1024


# ----------------------------------------------------------------------
# Forward sweep (streamed W1, full aux emission)
# ----------------------------------------------------------------------

def _fwd_kernel_factory(w1s, w2, ef, eg, T, G, s_pad, b_tile, sd):
    n = [w1s.n_resident, w2.n_args, ef.n_args, eg.n_args if eg else 0]

    def kernel(*refs):
        (lc_ref, m_ref, flag_ref, init_ref, leaky_ref) = refs[:5]
        o = 5
        w1r_refs = refs[o:o + n[0]]; o += n[0]
        w1t_ref = refs[o]; o += 1                     # streamed chunk
        w2_refs = refs[o:o + n[1]]; o += n[1]
        ef_refs = refs[o:o + n[2]]; o += n[2]
        eg_refs = refs[o:o + n[3]]; o += n[3]
        px_ref = refs[o]; o += 1
        (ad_out, s_out, ad_last_out, w1ad_out, xdst_out) = refs[o:o + 5]
        o += 5
        xsrc_out = None
        if eg:
            xsrc_out = refs[o]; o += 1
        ad, acc, acc2, s_scr, xdst_scr = refs[o:o + 5]
        xsrc_scr = refs[o + 5] if eg else None

        t = pl.program_id(1)
        g = pl.program_id(2)
        leaky_c = lc_ref[0, 0]

        @pl.when((t == 0) & (g == 0))
        def _():
            init_col = init_ref[:]                    # (S_pad, 1)
            s0 = jnp.sum(init_col)
            ad0 = init_col + leaky_c * s0 * leaky_ref[:]
            ad[:] = jnp.broadcast_to(ad0, (s_pad, b_tile))
            s_scr[0, :] = jnp.full((b_tile,), s0, jnp.float32)
            ad_last_out[:] = jnp.broadcast_to(ad0, (s_pad, b_tile))

        @pl.when(g == 0)
        def _():
            # resident strata of W1 initialise the frame's accumulator
            w1s.apply_resident(w1r_refs, ad[:], acc)

        # chunk g of the W1 tile stream: acc += W1_g @ alpha'(t-1)
        w1s.apply_chunk(w1t_ref, g, ad[:], acc)

        @pl.when(g == G - 1)
        def _():
            px_t = px_ref[0]                          # (P_eff, Bt)
            ef.apply(ef_refs, px_t, xdst_scr)         # x_dst = E_f px
            xdst = xdst_scr[:]
            xdst_out[0] = xdst.astype(sd)
            if eg:
                eg.apply(eg_refs, px_t, xsrc_scr)
                xsrc = xsrc_scr[:]
                xsrc_out[0] = xsrc.astype(sd)
            else:
                xsrc = xdst
            ad_v = ad[:]
            w1ad = acc[:]
            w1ad_out[0] = w1ad.astype(sd)
            a_part = xdst * w1ad
            w2.apply(w2_refs, xsrc * ad_v, acc2)      # acc2 = W2 @ u
            r = 1.0 / s_scr[0, :][None, :]
            a = (a_part + acc2[:]) * r
            s_t = jnp.sum(a, axis=0)
            ad_t = a + leaky_c * s_t[None, :] * leaky_ref[:]
            ad[:] = ad_t
            s_scr[0, :] = s_t
            ad_out[0] = ad_t.astype(sd)
            s_out[0, 0, :] = s_t

            @pl.when(flag_ref[t] != 0)
            def _():
                eq = m_ref[0, 0:1, :]
                neq = m_ref[0, 1:2, :]
                ad_last_out[:] = ad_last_out[:] * neq + ad_t * eq

    return kernel


def _fwd_stream(fa: FactorizedArrays, px_tm, masks, leaky_coefficient,
                b_tile, mm, sd, chunk_tiles):
    T, p_eff, B = px_tm.shape
    s_pad = fa.s_pad
    nb = B // b_tile
    w1s = _WKStream(fa.w1, mm, chunk_tiles)
    w2, ef = _WK(fa.w2, mm), _WK(fa.e_f, mm)
    eg = None if fa.xsrc_mode == "identity" else _WK(fa.e_g, mm)
    G = w1s.n_chunks
    kernel = _fwd_kernel_factory(w1s, w2, ef, eg, T, G, s_pad, b_tile, sd)

    res_col = lambda: pl.BlockSpec((s_pad, 1), lambda b, t, g: (0, 0),
                                   memory_space=pltpu.VMEM)
    stream = lambda rows: pl.BlockSpec((1, rows, b_tile),
                                       lambda b, t, g: (t, 0, b),
                                       memory_space=pltpu.VMEM)
    w_spec = lambda a: pl.BlockSpec(a.shape, lambda b, t, g: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)
    block_sb = lambda: pl.BlockSpec((s_pad, b_tile), lambda b, t, g: (0, b),
                                    memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1), lambda b, t, g: (0, 0),
                     memory_space=pltpu.SMEM),            # leaky coeff
        stream(8),                                        # mask rows
        pl.BlockSpec(memory_space=pltpu.SMEM),            # end flags (T,)
        res_col(), res_col(),                             # init, leaky
        *[w_spec(a) for a in w1s.resident],               # W1 diag/dense
        pl.BlockSpec((chunk_tiles, 128, 128),
                     lambda b, t, g: (g, 0, 0),
                     memory_space=pltpu.VMEM),            # W1 tile stream
        *[w_spec(a) for w in ([w2, ef] + ([eg] if eg else []))
          for a in w.arrays],
        stream(p_eff),                                    # px
    ]
    operands = [
        jnp.asarray(leaky_coefficient, jnp.float32).reshape(1, 1),
        masks, _end_flags_of(masks),
        fa.initial[:, None], fa.leaky[:, None],
        *w1s.resident, w1s.tiles,
        *[a for w in ([w2, ef] + ([eg] if eg else [])) for a in w.arrays],
        px_tm,
    ]
    out_specs = [
        stream(s_pad),                                    # alpha' rows
        pl.BlockSpec((1, 8, b_tile), lambda b, t, g: (t, 0, b),
                     memory_space=pltpu.VMEM),            # s rows
        block_sb(),                                       # alpha'(T_b)
        stream(s_pad), stream(s_pad),                     # W1@alpha', x_dst
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, s_pad, B), sd),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
        jax.ShapeDtypeStruct((s_pad, B), jnp.float32),
        jax.ShapeDtypeStruct((T, s_pad, B), sd),
        jax.ShapeDtypeStruct((T, s_pad, B), sd),
    ]
    if eg:
        out_specs.append(stream(s_pad))                   # x_src
        out_shape.append(jax.ShapeDtypeStruct((T, s_pad, B), sd))
    scratch = [
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # ad carry
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # acc (W1 @ ad)
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # acc2 (W2 term)
        pltpu.VMEM((8, b_tile), jnp.float32),             # s carry
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # x_dst
    ]
    if eg:
        scratch.append(pltpu.VMEM((s_pad, b_tile), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(nb, T, G),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(*operands)


# ----------------------------------------------------------------------
# Backward sweep (streamed W1^T, aux streams from the forward)
# ----------------------------------------------------------------------

def _bwd_kernel_factory(w1ts, w2t, eft, egt, identity, T, G, s_pad,
                        p_pad, b_tile, sd, debug=True):
    n = [w1ts.n_resident, w2t.n_args, eft.n_args, egt.n_args if egt else 0]

    def kernel(*refs):
        (lc_ref, m_ref, flag_ref, bdfin_ref, init_ref, leaky_ref,
         s_all_ref) = refs[:7]
        o = 7
        w1r_refs = refs[o:o + n[0]]; o += n[0]
        w1t_ref = refs[o]; o += 1                     # streamed chunk
        w2t_refs = refs[o:o + n[1]]; o += n[1]
        eft_refs = refs[o:o + n[2]]; o += n[2]
        egt_refs = refs[o:o + n[3]]; o += n[3]
        ad_prev_ref = refs[o]; o += 1
        w1ad_ref = refs[o]; o += 1
        xdst_ref = refs[o]; o += 1
        xsrc_ref = None
        if not identity:
            xsrc_ref = refs[o]; o += 1
        gamma_out, ab_out, gs_out = refs[o:o + 3]
        o += 3
        bd, acc, acc2, gacc, xb_scr = refs[o:o + 5]

        def b_next_of(bd_eff):
            # beta'(u+1) with the leaky term: recomputed from the bd
            # carry (frozen across the frame's chunk steps) instead of
            # held in its own (s_pad, b_tile) scratch — scoped VMEM is
            # the scarce resource past s_pad~9000 (round-5 trim)
            return bd_eff + leaky_c * jnp.sum(
                bd_eff * leaky_col, axis=0, keepdims=True)

        t = pl.program_id(1)
        g = pl.program_id(2)
        u = T - 1 - t
        leaky_c = lc_ref[0, 0]
        leaky_col = leaky_ref[:]

        @pl.when((t == 0) & (g == 0))
        def _():
            bd[:] = jnp.zeros((s_pad, b_tile), jnp.float32)

        @pl.when(g == 0)
        def _():
            # frame prologue: beta' injection, leaky, xb — everything
            # the chunk accumulation needs
            @pl.when(flag_ref[u] != 0)
            def _():
                eq = m_ref[0, 0:1, :]
                neq = m_ref[0, 1:2, :]
                bd[:] = bd[:] * neq + bdfin_ref[:] * eq
            # x_dst (x_src) are read straight from their input blocks
            # (resident in VMEM for the whole frame's chunk steps),
            # and b_next is recomputed from the frozen bd carry at the
            # frame epilogue — scratch copies of either cost
            # (s_pad, b_tile) f32 buffers of scoped VMEM for nothing
            # (round-5 trim)
            xb_scr[:] = xdst_ref[0].astype(jnp.float32) * b_next_of(bd[:])
            w1ts.apply_resident(w1r_refs, xb_scr[:], acc)

        # chunk g of the W1^T tile stream: acc += W1^T_g @ xb
        w1ts.apply_chunk(w1t_ref, g, xb_scr[:], acc)

        @pl.when(g == G - 1)
        def _():
            b_next = b_next_of(bd[:])
            xb = xb_scr[:]
            xsrc = (xsrc_ref[0] if xsrc_ref is not None
                    else xdst_ref[0]).astype(jnp.float32)
            init_col = init_ref[:]
            s0 = jnp.sum(init_col)
            ad0 = jnp.broadcast_to(init_col + leaky_c * s0 * leaky_col,
                                   (s_pad, b_tile))
            ad_u = jnp.where(u == 0, ad0,
                             ad_prev_ref[0].astype(jnp.float32))
            w1fwd = w1ad_ref[0].astype(jnp.float32)
            s_u = s_all_ref[pl.ds(u, 1), :]
            inv = 1.0 / s_u

            bd_part = acc[:]
            w2t.apply(w2t_refs, b_next, acc2)         # W2^T @ b_next
            sw = xsrc * acc2[:]
            bd_t = (bd_part + sw) * inv

            c1 = xb * w1fwd
            c2 = sw * ad_u
            if identity:
                eft.apply(eft_refs, c1 + c2, gacc)
            else:
                eft.apply(eft_refs, c1, gacc)
                egt.apply(egt_refs, c2, gacc, accumulate=True)
            gamma_out[0] = (gacc[:] * inv).astype(sd)
            bd[:] = bd_t

            if debug:
                gs_out[0, 0, :] = jnp.sum(gacc[:], axis=0) * inv[0]
                ab_out[0, 0, :] = jnp.sum(ad_u * bd_t, axis=0)
            else:
                one = jnp.ones((b_tile,), jnp.float32)
                gs_out[0, 0, :] = one
                ab_out[0, 0, :] = one

                @pl.when(u == 0)
                def _():
                    gs_out[0, 0, :] = jnp.sum(gacc[:], axis=0) * inv[0]
                    ab_out[0, 0, :] = jnp.sum(ad_u * bd_t, axis=0)

    return kernel


def _bwd_stream(fa: FactorizedArrays, ad_ys, w1ad_ys, xdst_ys, xsrc_ys,
                s_all, masks, tot_prob, leaky_coefficient, b_tile, mm,
                sd, chunk_tiles, debug=True):
    T, _, B = ad_ys.shape
    s_pad, p_pad = fa.s_pad, fa.p_pad
    nb = B // b_tile
    identity = fa.xsrc_mode == "identity"
    w1ts = _WKStream(fa.w1t, mm, chunk_tiles)
    w2t, eft = _WK(fa.w2t, mm), _WK(fa.e_ft, mm)
    egt = None if identity else _WK(fa.e_gt, mm)
    G = w1ts.n_chunks
    kernel = _bwd_kernel_factory(w1ts, w2t, eft, egt, identity, T, G,
                                 s_pad, p_pad, b_tile, sd, debug=debug)

    res_col = lambda: pl.BlockSpec((s_pad, 1), lambda b, t, g: (0, 0),
                                   memory_space=pltpu.VMEM)
    rev = lambda rows: pl.BlockSpec((1, rows, b_tile),
                                    lambda b, t, g: (T - 1 - t, 0, b),
                                    memory_space=pltpu.VMEM)
    rev_shift = pl.BlockSpec(
        (1, s_pad, b_tile),
        lambda b, t, g: (jnp.maximum(T - 2 - t, 0), 0, b),
        memory_space=pltpu.VMEM)
    w_spec = lambda a: pl.BlockSpec(a.shape, lambda b, t, g: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)
    block_sb = lambda: pl.BlockSpec((s_pad, b_tile), lambda b, t, g: (0, b),
                                    memory_space=pltpu.VMEM)

    wks_res = [w2t, eft] + ([egt] if egt else [])
    in_specs = [
        pl.BlockSpec((1, 1), lambda b, t, g: (0, 0),
                     memory_space=pltpu.SMEM),            # leaky coeff
        rev(8),                                           # mask rows (u)
        pl.BlockSpec(memory_space=pltpu.SMEM),            # end flags (T,)
        block_sb(),                                       # bd_fin
        res_col(), res_col(),                             # init, leaky
        pl.BlockSpec((s_all.shape[0], b_tile), lambda b, t, g: (0, b),
                     memory_space=pltpu.VMEM),            # s_all
        *[w_spec(a) for a in w1ts.resident],              # W1^T strata
        pl.BlockSpec((chunk_tiles, 128, 128),
                     lambda b, t, g: (g, 0, 0),
                     memory_space=pltpu.VMEM),            # W1^T stream
        *[w_spec(a) for w in wks_res for a in w.arrays],
        rev_shift,                                        # alpha'(u-1)
        rev(s_pad), rev(s_pad),                           # W1@alpha', x_dst
    ]
    operands = [
        jnp.asarray(leaky_coefficient, jnp.float32).reshape(1, 1),
        masks, _end_flags_of(masks),
        fa.final[:, None] / tot_prob.reshape(1, B).astype(jnp.float32),
        fa.initial[:, None], fa.leaky[:, None], s_all,
        *w1ts.resident, w1ts.tiles,
        *[a for w in wks_res for a in w.arrays],
        ad_ys, w1ad_ys, xdst_ys,
    ]
    if not identity:
        in_specs.append(rev(s_pad))                       # x_src(u)
        operands.append(xsrc_ys)
    out_specs = [
        rev(p_pad),                                       # gamma
        pl.BlockSpec((1, 8, b_tile), lambda b, t, g: (T - 1 - t, 0, b),
                     memory_space=pltpu.VMEM),            # alpha*beta
        pl.BlockSpec((1, 8, b_tile), lambda b, t, g: (T - 1 - t, 0, b),
                     memory_space=pltpu.VMEM),            # gamma sums
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, p_pad, B), sd),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # bd carry
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # acc (W1^T)
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # acc2 (W2^T)
        pltpu.VMEM((p_pad, b_tile), jnp.float32),         # gamma acc
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # xb
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # b_next
    ]
    return pl.pallas_call(
        kernel,
        grid=(nb, T, G),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(*operands)


# ----------------------------------------------------------------------
# Fused fwd+bwd entry
# ----------------------------------------------------------------------

# Above this state width the per-grid-step overhead dominates the
# stream and the chunk must MINIMIZE grid steps; below it the chunk
# basin is measured flat (s5k: 22.6-23.3 ms across chunks 8-256, s8k:
# 55.6 ms at 128).  Measured at s_pad 10112 (B=128 T=500 bf16,
# docs/ab/stream_chunk_s10k.json): chunk 128 (G=13) 331 utts/s, 192
# (G=9) 436, 224 (G=8) 476, 256 (G=7) 549, 320 (G=5) 1096, 400 (G=4)
# 1143, 512 (G=4, est 108 MB) 775 — the slide is pure grid-step
# overhead until the VMEM plan saturates.
STREAM_BIG_SPAD = 9216

# Mosaic's remote compile helper crashes (HTTP 500, helper exit 1) on
# large chunk x wide-pdf kernels: measured at s_pad 10112 / p_pad 10112
# (79 pdf tiles), chunk 320 compiles and runs 953 utts/s while chunk
# 400 kills the helper deterministically at EITHER batch width; the
# same chunk 400 compiles fine at p_pad 4096 (32 tiles).  The VMEM
# estimate does not discriminate (both ~84-101 MB), so the gate is the
# measured product boundary: chunk_tiles * pdf_tiles <= 320 * 79.
STREAM_CHUNK_P_CAP = 320 * 79


def auto_chunk_tiles(fa: FactorizedArrays, b_tile: int = 128) -> int:
    """Chunk size adapted to the graph.

    Small/medium graphs (s_pad <= STREAM_BIG_SPAD): ~1/8 of the
    streamed tiles (the measured S=8000 optimum — 1024 tiles -> 128 —
    sits at that ratio with a shallow basin, docs/DESIGN.md), as a
    power of two clamped to [32, CHUNK_TILES], then halved until the
    double buffer fits the same VMEM budget that admits the graph (so
    the estimate that admitted it and the buffers the kernel
    allocates agree).

    Large graphs (s_pad > STREAM_BIG_SPAD): per-grid-step overhead
    dominates (see STREAM_BIG_SPAD), so pick the LARGEST admissible
    chunk that minimizes the grid-step count G — try G=4,5,6,... and
    return the first whose double buffer the budget admits (measured
    3.5x at s_pad 10112: 1143 utts/s at the G=4 chunk vs 331 at the
    old power-of-two 128)."""
    n = max(1, int(fa.w1.tiles.shape[0]))
    s_pad = int(fa.s_pad)
    p_tiles = max(1, int(fa.p_pad) // 128)
    if s_pad > STREAM_BIG_SPAD:
        for g in range(4, 33):
            per_step = (n + g - 1) // g
            c = ((per_step + 7) // 8) * 8       # ceil(n/g), mult of 8
            if c <= 0:
                break
            if (c <= CHUNK_TILES * 4
                    and c * p_tiles <= STREAM_CHUNK_P_CAP
                    and fits_stream(fa, b_tile, chunk_tiles=c)):
                return c
        # nothing admissible in the large-chunk band: fall through to
        # the clamping policy below
    c = 1 << max(5, min(int(CHUNK_TILES).bit_length() - 1,
                        (n // 8).bit_length() - 1))
    while c > 8 and not fits_stream(fa, b_tile, chunk_tiles=c):
        c //= 2
    return c


def forward_backward_prob_stream(px, lengths, fa: FactorizedArrays,
                                 leaky_coefficient=1e-5,
                                 b_tile: int = 128,
                                 chunk_tiles: int = None,
                                 debug: bool = True) -> FwdBwdResult:
    """Weight-streaming fused fwd+bwd for beyond-VMEM factorized graphs.

    Semantics match forward_backward_prob_pallas "full" mode exactly
    (same per-frame math, same aux streams); W1's tiles stream from HBM
    through a double-buffered grid dimension instead of residing in
    VMEM.  Falls back to the XLA factorized engine at trace time when
    the fwd->bwd aux streams would blow the HBM budget (very long T x
    very large S together)."""
    from ..utils.diagnostics import get_verbose_level
    debug = debug or get_verbose_level() >= 1
    if not supports(fa):
        raise ValueError("stream path requires a fully factorized graph")
    if chunk_tiles is None:
        chunk_tiles = auto_chunk_tiles(fa, b_tile)
    else:
        # a caller-supplied chunk must not silently invalidate the VMEM
        # budget that admitted the graph at dispatch: clamp it down to
        # the largest power-of-two fraction that still fits
        while chunk_tiles > 8 and not fits_stream(
                fa, b_tile, chunk_tiles=chunk_tiles):
            chunk_tiles //= 2
    B, T, P = px.shape
    if B % b_tile:
        b_tile = min(b_tile, B)
        while B % b_tile:
            b_tile //= 2
    if not fits_stream(fa, b_tile, chunk_tiles=chunk_tiles):
        # even the minimum chunk cannot fit this graph's resident set:
        # a direct (non-dispatch) call would otherwise walk into a
        # Mosaic VMEM OOM (ADVICE r4) — take the ceiling-free XLA
        # engine instead, which is semantics-identical
        from .factorized import forward_backward_prob_fact
        return forward_backward_prob_fact(px, lengths, fa,
                                          leaky_coefficient)
    s_pad = fa.s_pad
    lengths = lengths.astype(jnp.int32)

    mm = jnp.dtype(fa.w1.tiles.dtype)
    sd = BF if mm == BF else jnp.float32

    n_streams = (3 if fa.xsrc_mode == "identity" else 4) + 1  # + px
    stream_bytes = n_streams * T * s_pad * B * jnp.dtype(sd).itemsize
    if stream_bytes > stream_hbm_budget():
        # the fwd->bwd aux streams would not fit HBM next to the
        # activations: fall back to the ceiling-free XLA engine —
        # LOUDLY.  (Rounds 3-4 shipped this fallback silent at a fixed
        # 4 GiB, and the resulting ~6x "collapse" at s_pad >= 8448,
        # B=128, T=500 was mis-diagnosed as a Mosaic-level kernel
        # pathology for two rounds; every "eliminated hypothesis" was
        # flat because the kernels never ran.  docs/DESIGN.md round-5.)
        _warn_stream_fallback(T, s_pad, B, stream_bytes)
        from .factorized import forward_backward_prob_fact
        return forward_backward_prob_fact(px, lengths, fa,
                                          leaky_coefficient)

    px_tm = px_time_major(px, fa, dtype=sd)               # (T, P_eff, B)
    masks = _length_masks(lengths, T)

    fwd_out = _fwd_stream(fa, px_tm, masks, leaky_coefficient, b_tile,
                          mm, sd, chunk_tiles)
    ad_ys, s_ys8, ad_last, w1ad_ys, xdst_ys = fwd_out[:5]
    xsrc_ys = fwd_out[5] if fa.xsrc_mode != "identity" else None

    s_all, objf, tot_prob = _objf_pallas(s_ys8, ad_last, lengths, fa,
                                         T, px.dtype)

    gamma_ys, ab8, gs8 = _bwd_stream(
        fa, ad_ys, w1ad_ys, xdst_ys, xsrc_ys, s_all, masks, tot_prob,
        leaky_coefficient, b_tile, mm, sd, chunk_tiles, debug=debug)

    return _package_result(objf, gamma_ys, ab8, gs8, P, px.dtype)

"""Pallas TPU kernels for the factorized denominator forward-backward.

The XLA factorized path (ops/factorized.py) re-reads the stratified
transition matrices from HBM and materialises several (S_pad, B)
intermediates per frame.  These kernels run each time sweep inside ONE
`pallas_call` with a sequential grid over frames: the graph's dense
block + tiles AND the one-hot emission matrices stay resident in VMEM
across all T steps, the alpha/beta carry lives in VMEM scratch, and
per-frame HBM traffic drops to one streamed emission slice in and the
alpha/posterior rows out.

Numerics: "fast mode" — matmul operands in bfloat16 (transition probs
quantised at ~0.4% relative; the E matrices are one-hot, hence exact in
bf16), float32 accumulation and elementwise updates, streamed
activations stored bfloat16.  The XLA float32 path remains the
parity-grade engine (vs the reference CPU binary); this is the
throughput engine.  Requires a fully factorized graph (no residual
arcs) — see ``supports``.

Work split per sweep:

* outside (XLA): clip+exp and the (B, T, P) -> (T, P_eff, B) relayout
  of the nnet output; the objf reduction over alpha-sums; the exact
  {0,1} length-mask rows (see ``_length_masks``); the step-independent
  ``final/tot`` row the bwd injection uses.
* fwd kernel (consumes the ONE raw px stream): ``x_dst = E_f @ px_t``
  / ``x_src = E_g @ px_t`` as one-hot tile dots (streaming
  pre-gathered emissions instead costs 2-3 extra full XLA memory
  passes per batch), then the alpha recurrence; emits alpha-dash
  rows, alpha-sums, alpha'(T_b), AND the two quantities the bwd sweep
  would otherwise recompute: ``W1 @ alpha'`` and x_dst (x_src).
* bwd kernel: beta recurrence and the posteriors
  ``gamma = E_f^T c1 + E_g^T c2`` emitted directly (the transposed
  one-hot SCATTER stays on the MXU — it has no gather-direction
  equivalent), plus the alpha*beta / sum-gamma invariant traces.
  Both sweeps are MXU-bound after round 2's select fix, so the bwd
  reads ``W1 @ alpha'(u)`` and the emission rows as STREAMS from the
  fwd sweep (spare DMA) instead of recomputing them (serial MXU) —
  the reverse of the round-2 trade, and measured: bwd 14.4 -> 10.0
  us/step with the fwd unchanged at 9.1.

Length handling uses NO lane-varying selects (they serialise the
Mosaic pipeline — docs/DESIGN.md): carries run unfrozen past each
sequence's end (provably cancelled downstream) and the two genuine
per-lane events (alpha'(T_b) capture, beta' injection) use exact
multiply-add masking with precomputed {0,1} rows.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .factorized import FactorizedArrays, WArrays, px_time_major
from .fwdbwd import FwdBwdResult, _ok_flags

BF = jnp.bfloat16
VMEM_LIMIT = 100 * 1024 * 1024


def _interpret() -> bool:
    # Run kernels in Pallas interpreter mode off-TPU (CI on CPU).
    return jax.default_backend() != "tpu"


def supports(fa: FactorizedArrays) -> bool:
    """Pallas path handles fully-factorized graphs (no residual arcs)."""
    return int(fa.res_src.shape[0]) == 0


def fits_vmem(fa: FactorizedArrays, b_tile: int = 128) -> bool:
    """Estimate whether the kernels' scoped VMEM fits on-chip.

    Since the bwd kernel's recomputes became fwd-emitted streams, each
    sweep holds only its own operands: fwd = {W1, W2, E_f (+E_g)},
    bwd = {W1^T, W2^T, E_f^T (+E_g^T)} — near-mirror sets, so either
    bounds the estimate.  Beyond the budget, dispatch tiers to the
    weight-streaming kernels, then the XLA factorized engine (which
    has no VMEM ceiling at all).

    RE-CALIBRATED against measured Mosaic behavior in round 4 (the
    round-3 model — x6 spill pricing per tile + 24 live (s_pad,
    b_tile) scratches — had gone stale: the resident kernels now
    compile and run far past its boundary).  Metric = one side's raw
    operand storage + one (s_pad, b_tile) f32 scratch unit; measured
    separation at B=128, T=500, bigram-fanout-30 denominators:

        bf16  S=5000..8000  23..48 MB  PASS (4154..2647 utts/s)
        bf16  S=10000       71 MB      Mosaic OOM
        f32   S=5000        44 MB      PASS (1171 utts/s)
        f32   S=6000        57 MB      Mosaic OOM (used 144M/128M)
        f32   S=8000        92 MB      Mosaic OOM (used 136M/128M)

    A 50 MB budget classifies every measured point with margin on both
    sides; tools/vmem_boundary.py re-verifies compile-or-fallback on
    chip every sweep, so estimate drift shows up as a stage failure.
    """
    itemsize = jnp.dtype(fa.w1.tiles.dtype).itemsize

    def _side(ws):
        tiles = sum(int(w.tiles.shape[0]) for w in ws)
        dense = sum(int(w.dense.shape[0]) * int(w.dense.shape[1])
                    for w in ws if w.dense is not None)
        return (tiles * 128 * 128 + dense) * itemsize
    fwd_ws = [fa.w1, fa.w2, fa.e_f]
    bwd_ws = [fa.w1t, fa.w2t, fa.e_ft]
    if fa.xsrc_mode != "identity":
        fwd_ws.append(fa.e_g)
        bwd_ws.append(fa.e_gt)
    est = max(_side(fwd_ws), _side(bwd_ws)) + fa.s_pad * b_tile * 4
    return est <= 50 * 1000 * 1000


class _WK:
    """Kernel-side view of one stratified matrix: canonical device
    arrays plus static tile coordinates (python ints -> the tile loop is
    fully unrolled at trace time).  ``mm_dtype`` sets the MXU operand
    precision: bfloat16 fast mode or float32 parity mode.

    Tiles are re-sorted by (block_col, block_row) and same-column runs
    execute as ONE tall ``(k*128, 128) @ (128, Bt)`` dot: a 128^3 dot
    occupies one MXU for ~128 cycles, so a long unrolled chain of
    single-tile dots serializes at ~136 ns each no matter how many MXUs
    the chip has — stacking k tiles into one dot lets Mosaic spread the
    M dimension across MXUs and cuts issue overhead k-fold.  The stack
    is a contiguous reshape of the stored (n, 128, 128) array (free)."""

    def __init__(self, w: WArrays, mm_dtype=BF):
        self.has_diag = w.diag is not None
        self.has_dense = w.dense is not None
        self.r0, self.c0 = w.dense_r0, w.dense_c0
        self.mm = jnp.dtype(mm_dtype)
        # f32 parity mode must not let the MXU round operands to bf16;
        # Mosaic's dot lowering supports DEFAULT and HIGHEST only (HIGH
        # raises NotImplementedError on real TPU), so the kernels pay
        # full 6-pass f32 in parity mode.  bf16 fast mode keeps the
        # native single-pass rate.
        self.prec = (jax.lax.Precision.DEFAULT if self.mm == jnp.bfloat16
                     else jax.lax.Precision.HIGHEST)
        # group tiles by block column: tiles within a group share the
        # same RHS slice v[c*128:(c+1)*128]
        order = sorted(range(len(w.rows)),
                       key=lambda k: (w.cols[k], w.rows[k]))
        self.groups = []                  # (col, rows_in_group, start)
        pos = 0
        k = 0
        while k < len(order):
            c = w.cols[order[k]]
            rows = []
            while k < len(order) and w.cols[order[k]] == c:
                rows.append(int(w.rows[order[k]]))
                k += 1
            self.groups.append((int(c), tuple(rows), pos))
            pos += len(rows)
        self.arrays = []
        if self.has_diag:
            self.arrays.append(jnp.asarray(w.diag, jnp.float32)[:, None])
        if self.has_dense:
            self.arrays.append(jnp.asarray(w.dense, self.mm))
        if self.groups:
            tiles = jnp.asarray(w.tiles, self.mm)
            self.arrays.append(tiles[jnp.asarray(order, jnp.int32)])

    @property
    def n_args(self) -> int:
        return len(self.arrays)

    def apply(self, refs, v, out_ref, accumulate=False):
        """Emit ``out_ref <-(+=) W @ v`` for a (C, Bt) f32 value v."""
        i = 0
        wrote = accumulate
        if self.has_diag:
            term = refs[i][:] * v[: out_ref.shape[0]]
            i += 1
            if wrote:
                out_ref[:] += term
            else:
                out_ref[:] = term
                wrote = True
        if not wrote:
            out_ref[:] = jnp.zeros(out_ref.shape, jnp.float32)
            wrote = True
        if self.has_dense:
            dref = refs[i]
            i += 1
            R, C = dref.shape
            blk = jnp.dot(dref[:], v[self.c0:self.c0 + C].astype(self.mm),
                          preferred_element_type=jnp.float32,
                          precision=self.prec)
            out_ref[self.r0:self.r0 + R, :] += blk
        if self.groups:
            tref = refs[i]
            bt = v.shape[1]
            for c, rows, start in self.groups:
                k = len(rows)
                tall = tref[start:start + k].reshape(k * 128, 128)
                blk = jnp.dot(tall,
                              v[c * 128:(c + 1) * 128].astype(self.mm),
                              preferred_element_type=jnp.float32,
                              precision=self.prec)
                for j, r in enumerate(rows):
                    out_ref[r * 128:(r + 1) * 128, :] += \
                        blk[j * 128:(j + 1) * 128]


# ----------------------------------------------------------------------
# Forward sweep
# ----------------------------------------------------------------------

def _fwd_kernel_factory(w1, w2, ef, eg, T, s_pad, b_tile, sd,
                        emit_aux=True, ext_init=False):
    # ef/eg: one-hot emission maps applied IN-KERNEL to the streamed
    # raw px slice: x_dst = E_f @ px_t, x_src = x_dst (eg is None when
    # g == f on W2's support) or E_g @ px_t.  The tile dots ride the
    # otherwise-idle MXU underneath the stream DMA; streaming
    # pre-gathered x_dst/x_src instead costs 2-3 extra full XLA memory
    # passes per batch (measured 3.6 ms at the headline size) and, in
    # "stream" mode, a whole second (T, S_pad, B) stream.
    #
    # With ``emit_aux`` (the "full" stream mode), the kernel also emits
    # the two quantities the BACKWARD sweep would otherwise recompute
    # on its (MXU-bound) critical path: ``W1 @ alpha'(t)`` and the
    # emission rows x_dst (x_src).  Streaming them costs this kernel
    # only spare DMA bandwidth; recomputing them in the bwd kernel
    # costs ~5 us of serial MXU work per step (docs/DESIGN.md round-3
    # notes).  The "lean" mode drops them to a third of the HBM
    # footprint for long-T batches.
    n = [w1.n_args, w2.n_args, ef.n_args, eg.n_args if eg else 0]

    def kernel(*refs):
        (lc_ref, m_ref, flag_ref, init_ref, leaky_ref) = refs[:5]
        o = 5
        ad_init_ref = s_init_ref = None
        if ext_init:
            ad_init_ref, s_init_ref = refs[o:o + 2]
            o += 2
        w1_refs = refs[o:o + n[0]]; o += n[0]
        w2_refs = refs[o:o + n[1]]; o += n[1]
        ef_refs = refs[o:o + n[2]]; o += n[2]
        eg_refs = refs[o:o + n[3]]; o += n[3]
        px_ref = refs[o]; o += 1
        (ad_out, s_out, ad_last_out) = refs[o:o + 3]
        o += 3
        w1ad_out = xdst_out = xsrc_out = None
        if emit_aux:
            w1ad_out, xdst_out = refs[o:o + 2]
            o += 2
            if eg:
                xsrc_out = refs[o]
                o += 1
        ad, acc, s_scr, xdst_scr = refs[o:o + 4]
        xsrc_scr = refs[o + 4] if eg else None

        t = pl.program_id(1)
        leaky_c = lc_ref[0, 0]

        @pl.when(t == 0)
        def _():
            if ext_init:
                # chunked (checkpointed-backward) re-entry: the carry
                # starts from a streamed snapshot, not the graph init
                ad0_blk = ad_init_ref[:].astype(jnp.float32)
                s0_row = s_init_ref[0, :]
            else:
                init_col = init_ref[:]                    # (S_pad, 1)
                s0 = jnp.sum(init_col)
                ad0 = init_col + leaky_c * s0 * leaky_ref[:]
                ad0_blk = jnp.broadcast_to(ad0, (s_pad, b_tile))
                s0_row = jnp.full((b_tile,), s0, jnp.float32)
            ad[:] = ad0_blk
            s_scr[0, :] = s0_row
            ad_last_out[:] = ad0_blk

        # no f32 cast of the px slice: the one-hot dots cast their
        # operands to the MXU dtype themselves (E has no diag stratum)
        px_t = px_ref[0]                                  # (P_eff, Bt)
        ef.apply(ef_refs, px_t, xdst_scr)                 # x_dst = E_f px
        xdst = xdst_scr[:]
        if xdst_out is not None:
            xdst_out[0] = xdst.astype(sd)
        if eg:
            eg.apply(eg_refs, px_t, xsrc_scr)             # x_src = E_g px
            xsrc = xsrc_scr[:]
            if xsrc_out is not None:
                xsrc_out[0] = xsrc.astype(sd)
        else:
            xsrc = xdst

        ad_v = ad[:]
        w1.apply(w1_refs, ad_v, acc)                      # acc = W1 @ ad
        w1ad = acc[:]
        if w1ad_out is not None:
            w1ad_out[0] = w1ad.astype(sd)
        a_part = xdst * w1ad
        w2.apply(w2_refs, xsrc * ad_v, acc)               # acc = W2 @ u
        # reciprocal once on a (1, Bt) row; a full-matrix divide costs
        # several times a multiply on the VPU
        r = 1.0 / s_scr[0, :][None, :]
        a = (a_part + acc[:]) * r
        s_t = jnp.sum(a, axis=0)
        ad_t = a + leaky_c * s_t[None, :] * leaky_ref[:]
        # NO length freezing of the carry: a lane-varying select here
        # costs ~8 us/step (it breaks the Mosaic DMA/compute overlap —
        # see docs/DESIGN.md), and every past-the-end value is provably
        # cancelled downstream (the beta carry is 0 there, so gamma,
        # alpha*beta and the masked objf terms never see it; the
        # recurrence self-normalises, so the junk stays finite).
        ad[:] = ad_t
        s_scr[0, :] = s_t
        ad_out[0] = ad_t.astype(sd)
        s_out[0, 0, :] = s_t
        # alpha' at each sequence's own final frame, accumulated in a
        # constant-index output block: replaces a take_along_axis over
        # the whole (T, S_pad, B) stream outside the kernel (measured
        # 9 ms at the headline size — it re-read the entire stream).
        # Captured with exact {0,1} float mask rows precomputed outside
        # (eq = [lengths == t+1], neq = 1-eq): multiply-add keeps the
        # overlap that a vector select would destroy, and is exact
        # because one of the two coefficients is always zero.  The
        # whole update is pl.when-skipped (scalar condition: free) on
        # frames where no sequence ends — there it is an exact identity
        # (ad_last * 1 + ad_t * 0) costing three (S_pad, Bt) passes.
        @pl.when(flag_ref[t] != 0)
        def _():
            eq = m_ref[0, 0:1, :]                         # (1, Bt)
            neq = m_ref[0, 1:2, :]
            ad_last_out[:] = ad_last_out[:] * neq + ad_t * eq

    return kernel


def _length_masks(lengths, T):
    """(T, 8, B) f32 stream of exact {0,1} per-frame mask rows:
    row 0 = [lengths == t+1] (final-frame capture / beta injection),
    row 1 = its complement.  Precomputed by XLA so the kernels never
    build lane-varying masks (a vector compare+select inside the kernel
    measurably serialises the Mosaic pipeline)."""
    B = lengths.shape[0]
    ts = jnp.arange(T, dtype=jnp.int32)
    eq = (lengths[None, :] == (ts[:, None] + 1)).astype(jnp.float32)
    rows = jnp.stack([eq, 1.0 - eq], axis=1)              # (T, 2, B)
    return jnp.pad(rows, ((0, 0), (0, 6), (0, 0)))        # (T, 8, B)


def _end_flags_of(masks):
    """(T, 1) int32 scalar-per-frame flags off the mask stream: 1 iff
    ANY sequence ends at frame t (mask row 0 is the exact {0,1} eq
    row).  Read from SMEM by the kernels to pl.when-skip the boundary
    multiply-adds (alpha'(T_b) capture, beta' injection) on frames
    where they are an exact identity — most frames of a bucketed
    batch, every frame but the last for equal lengths.  A scalar
    condition is free where a lane-varying one serialises the
    pipeline.  Derived from the masks (not lengths) so per-chunk
    slices in the ckpt mode stay consistent automatically.  Returned
    as a flat (T,) vector kept WHOLE in SMEM (a (1, 1) per-step block
    violates the Mosaic (8, 128) block-divisibility rule); the kernels
    index it dynamically with the step id."""
    return (masks[:, 0, :].sum(axis=1) > 0).astype(jnp.int32)


def _fwd_pallas(fa: FactorizedArrays, px_tm, masks,
                leaky_coefficient, b_tile, mm, sd, emit_aux=True,
                ad_init=None, s_init=None, snap_every=None):
    """One forward sweep.  Optional knobs for the checkpointed-backward
    ("ckpt") mode: ``ad_init``/``s_init`` re-enter the recurrence from a
    streamed snapshot instead of the graph's initial probs (chunk
    replay); ``snap_every=C`` emits only every C-th alpha row — the
    output block is revisited across each chunk, so the final write
    (alpha' at the chunk's last frame) is what lands in HBM — instead
    of the full (T, S_pad, B) history."""
    T, p_eff, B = px_tm.shape
    s_pad = fa.s_pad
    nb = B // b_tile
    ext_init = ad_init is not None
    w1, w2 = _WK(fa.w1, mm), _WK(fa.w2, mm)
    ef = _WK(fa.e_f, mm)
    eg = None if fa.xsrc_mode == "identity" else _WK(fa.e_g, mm)
    kernel = _fwd_kernel_factory(w1, w2, ef, eg, T, s_pad, b_tile, sd,
                                 emit_aux, ext_init=ext_init)

    res_col = lambda: pl.BlockSpec((s_pad, 1), lambda b, t: (0, 0),
                                   memory_space=pltpu.VMEM)
    stream = lambda rows: pl.BlockSpec((1, rows, b_tile),
                                       lambda b, t: (t, 0, b),
                                       memory_space=pltpu.VMEM)
    w_spec = lambda a: pl.BlockSpec(a.shape, lambda b, t: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)

    wks = [w1, w2, ef] + ([eg] if eg else [])
    block_sb = lambda: pl.BlockSpec((s_pad, b_tile), lambda b, t: (0, b),
                                    memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                     memory_space=pltpu.SMEM),            # leaky coeff
        stream(8),                                        # mask rows
        pl.BlockSpec(memory_space=pltpu.SMEM),            # end flags (T,)
        res_col(), res_col(),                             # init, leaky
    ]
    operands = [jnp.asarray(leaky_coefficient,
                            jnp.float32).reshape(1, 1),
                masks, _end_flags_of(masks),
                fa.initial[:, None], fa.leaky[:, None]]
    if ext_init:
        in_specs += [
            block_sb(),                                   # ad_init
            pl.BlockSpec((1, b_tile), lambda b, t: (0, b),
                         memory_space=pltpu.VMEM),        # s_init
        ]
        operands += [ad_init, s_init.reshape(1, B)]
    in_specs += [
        *[w_spec(a) for w in wks for a in w.arrays],
        stream(p_eff),                                    # px
    ]
    operands += [a for w in wks for a in w.arrays]
    operands.append(px_tm)
    if snap_every is None:
        ad_spec = stream(s_pad)
        ad_shape = jax.ShapeDtypeStruct((T, s_pad, B), sd)
    else:
        # every write within a chunk revisits the SAME output block:
        # Pallas keeps it in VMEM until the index changes, so only the
        # chunk's final alpha' row is flushed to HBM — T//C snapshots.
        C = snap_every
        nc = -(-T // C)
        ad_spec = pl.BlockSpec((1, s_pad, b_tile),
                               lambda b, t: (t // C, 0, b),
                               memory_space=pltpu.VMEM)
        ad_shape = jax.ShapeDtypeStruct((nc, s_pad, B), sd)
    out_specs = [
        ad_spec,                                          # ad_ys / snaps
        pl.BlockSpec((1, 8, b_tile), lambda b, t: (t, 0, b),
                     memory_space=pltpu.VMEM),            # s_ys
        block_sb(),                                       # ad_last
    ]
    out_shape = [
        ad_shape,
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
        jax.ShapeDtypeStruct((s_pad, B), jnp.float32),
    ]
    if emit_aux:
        out_specs += [stream(s_pad), stream(s_pad)]       # W1@alpha', x_dst
        out_shape += [jax.ShapeDtypeStruct((T, s_pad, B), sd)] * 2
        if eg:
            out_specs.append(stream(s_pad))               # x_src
            out_shape.append(jax.ShapeDtypeStruct((T, s_pad, B), sd))
    scratch = [
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # ad carry
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # acc
        pltpu.VMEM((8, b_tile), jnp.float32),             # s carry
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # x_dst
    ]
    if eg:
        scratch.append(pltpu.VMEM((s_pad, b_tile), jnp.float32))  # xsrc
    return pl.pallas_call(
        kernel,
        grid=(nb, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(*operands)


# ----------------------------------------------------------------------
# Backward sweep
# ----------------------------------------------------------------------

def _bwd_kernel_factory(w1t, w2t, eft, egt, identity, T, s_pad,
                        p_pad, b_tile, sd, w1=None, ef=None, eg=None,
                        ext_init=False, chunked=False, debug=True):
    # The bwd kernel is MXU-BOUND (w1t dense + w2t + eft scatter tiles
    # already sum to ~6 us/step of peak-MXU work at the headline size).
    # In the default "full" stream mode, everything the fwd sweep
    # already computed arrives as a STREAM instead of being recomputed:
    # x_dst/x_src (in round 2 these were in-kernel E_f/E_g dots) and
    # ``W1 @ alpha'(u)`` (a dense-block recompute).  Streams cost spare
    # DMA bandwidth; recomputes cost serial MXU time.  This also evicts
    # W1 and E_f from the kernel's VMEM residents, roughly halving the
    # bwd footprint (the fwd kernel is the fits_vmem binding set).
    #
    # The "lean" mode (w1/ef passed in) is the round-2 kernel: only the
    # alpha stream is kept and the bwd recomputes ``W1 @ alpha'`` and
    # the emission rows from a px stream — a third of the HBM footprint,
    # for long-T batches where three (T, S_pad, B) streams don't fit.
    lean = w1 is not None
    n = [w1t.n_args, w2t.n_args, eft.n_args, egt.n_args if egt else 0,
         w1.n_args if lean else 0, ef.n_args if lean else 0,
         eg.n_args if (lean and eg) else 0]

    def kernel(*refs):
        (lc_ref, m_ref, flag_ref, bdfin_ref, init_ref, leaky_ref,
         s_all_ref) = refs[:7]
        o = 7
        ad_init_ref = bd_init_ref = None
        if ext_init:
            ad_init_ref = refs[o]; o += 1
        if chunked:
            bd_init_ref = refs[o]; o += 1
        w1t_refs = refs[o:o + n[0]]; o += n[0]
        w2t_refs = refs[o:o + n[1]]; o += n[1]
        eft_refs = refs[o:o + n[2]]; o += n[2]
        egt_refs = refs[o:o + n[3]]; o += n[3]
        w1_refs = refs[o:o + n[4]]; o += n[4]
        ef_refs = refs[o:o + n[5]]; o += n[5]
        eg_refs = refs[o:o + n[6]]; o += n[6]
        ad_prev_ref = refs[o]; o += 1
        if lean:
            px_ref = refs[o]; o += 1
            w1ad_ref = xdst_ref = xsrc_ref = None
        else:
            w1ad_ref = refs[o]; o += 1
            xdst_ref = refs[o]; o += 1
            xsrc_ref = refs[o] if not identity else None
            o += 0 if identity else 1
        gamma_out, ab_out, gs_out = refs[o:o + 3]
        o += 3
        bd_out_ref = None
        if chunked:
            bd_out_ref = refs[o]; o += 1
        bd, acc, gacc = refs[o:o + 3]
        if lean:
            w1fwd_scr, xdst_scr = refs[o + 3:o + 5]
            xsrc_scr = refs[o + 5] if eg else None

        g = pl.program_id(1)
        u = T - 1 - g
        leaky_c = lc_ref[0, 0]

        @pl.when(g == 0)
        def _():
            if chunked:
                # checkpointed-backward chunk: the beta carry continues
                # from the chunk above (processed earlier in the
                # reverse chunk scan)
                bd[:] = bd_init_ref[:]
            else:
                bd[:] = jnp.zeros((s_pad, b_tile), jnp.float32)

        leaky_col = leaky_ref[:]

        if lean:
            px_t = px_ref[0]                              # (P_eff, Bt)
            ef.apply(ef_refs, px_t, xdst_scr)             # x_dst = E_f px
            xdst = xdst_scr[:]
            if eg:
                eg.apply(eg_refs, px_t, xsrc_scr)         # x_src = E_g px
                xsrc = xsrc_scr[:]
            else:
                xsrc = xdst
        else:
            xdst = xdst_ref[0].astype(jnp.float32)        # (S_pad, Bt)
            xsrc = (xsrc_ref[0].astype(jnp.float32)
                    if xsrc_ref is not None else xdst)

        # alpha'(u): streamed ys block u-1, or — at the sweep's first
        # frame — the entry state: a streamed snapshot (ckpt chunks) or
        # the rebuilt ad0 (scalar-condition select: free, unlike the
        # lane-varying kind)
        if ext_init:
            ad0 = ad_init_ref[:].astype(jnp.float32)
        else:
            init_col = init_ref[:]
            s0 = jnp.sum(init_col)
            ad0 = jnp.broadcast_to(init_col + leaky_c * s0 * leaky_col,
                                   (s_pad, b_tile))
        ad_u = jnp.where(u == 0, ad0, ad_prev_ref[0].astype(jnp.float32))

        # beta' injection at each sequence's final frame, via the exact
        # precomputed {0,1} mask rows (a lane-varying select here would
        # serialise the pipeline; one coefficient is always zero, so
        # the multiply-add form is exact).  No other length handling is
        # needed in this kernel: past a sequence's end bd stays 0, so
        # gamma, alpha*beta and the carried beta' are all exactly 0.
        # The injection mutates the carry IN PLACE under a scalar
        # pl.when so frames where no sequence ends (flag == 0, where
        # the multiply-add is an exact identity) skip all three
        # (S_pad, Bt) passes; bd is overwritten with bd_t at the end
        # of the step either way.
        # bd_fin = final/tot is step-independent: precomputed outside
        # (one XLA pass per batch vs a full-matrix divide per step)
        @pl.when(flag_ref[u] != 0)
        def _():
            eq = m_ref[0, 0:1, :]                         # (1, Bt)
            neq = m_ref[0, 1:2, :]
            bd[:] = bd[:] * neq + bdfin_ref[:] * eq
        bd_eff = bd[:]
        b_next = bd_eff + leaky_c * jnp.sum(
            bd_eff * leaky_col, axis=0, keepdims=True)

        # W1 @ alpha'(u): streamed from the fwd sweep (full mode) or
        # recomputed on the MXU from the alpha stream (lean mode)
        if lean:
            w1.apply(w1_refs, ad_u, w1fwd_scr)
            w1fwd = w1fwd_scr[:]
        else:
            w1fwd = w1ad_ref[0].astype(jnp.float32)
        s_u = s_all_ref[pl.ds(u, 1), :]                   # (1, b_tile)
        inv = 1.0 / s_u

        xb = xdst * b_next
        w1t.apply(w1t_refs, xb, acc)                      # W1^T @ xb
        bd_part = acc[:]
        w2t.apply(w2t_refs, b_next, acc)                  # W2^T @ b_next
        sw = xsrc * acc[:]            # x_src ⊙ W2^T b: shared by bd & c2
        bd_t = (bd_part + sw) * inv

        # inv scaling commutes with the linear E^T scatters: apply it
        # once to gamma (a per-column scalar) instead of to both
        # (S_pad, Bt) masses.
        c1 = xb * w1fwd
        c2 = sw * ad_u
        if identity:
            # identity mode: g == f on W2's support and c2 is zero off
            # that support (w2term = W2^T b vanishes there), so ONE
            # E_f^T scatter of the combined mass replaces both
            eft.apply(eft_refs, c1 + c2, gacc)            # E_f^T (c1+c2)
        else:
            eft.apply(eft_refs, c1, gacc)                 # E_f^T c1
            egt.apply(egt_refs, c2, gacc, accumulate=True)  # += E_g^T c2
        gamma_t = gacc[:] * inv
        gamma_out[0] = gamma_t.astype(sd)
        bd[:] = bd_t

        if debug:
            # full invariant traces: sum gamma(t) and sum alpha'*beta^
            # per frame — two to three (S_pad/P_pad, Bt) passes per
            # step on the serial VPU chain
            gs_out[0, 0, :] = jnp.sum(gacc[:], axis=0) * inv[0]
            ab_out[0, 0, :] = jnp.sum(ad_u * bd_t, axis=0)
        else:
            # reference-default behavior: check the invariants at
            # frame 0 only (chain-computation.cc:337-338 checks every
            # frame only at verbose >= 1); other frames report the
            # nominal 1.0.  Saves the reduction passes on every step.
            one = jnp.ones((b_tile,), jnp.float32)
            gs_out[0, 0, :] = one
            ab_out[0, 0, :] = one

            @pl.when(u == 0)
            def _():
                gs_out[0, 0, :] = jnp.sum(gacc[:], axis=0) * inv[0]
                ab_out[0, 0, :] = jnp.sum(ad_u * bd_t, axis=0)
        if chunked:
            # after the chunk's last step, bd_t is the carry the NEXT
            # chunk down (global frames below this one) resumes from
            @pl.when(g == T - 1)
            def _():
                bd_out_ref[:] = bd_t

    return kernel


def _bwd_pallas(fa: FactorizedArrays, ad_ys, w1ad_ys, xdst_ys, xsrc_ys,
                px_tm, s_all, masks, tot_prob, leaky_coefficient,
                b_tile, mm, sd, ad_init=None, bd_init=None, debug=True):
    """One backward sweep.  ``ad_init`` supplies alpha' at the frame
    below the sweep's first (ckpt chunk replay; defaults to the graph's
    rebuilt ad0); ``bd_init`` resumes the beta carry from the chunk
    above and additionally returns the final carry for the chunk below.
    """
    T, _, B = ad_ys.shape
    s_pad = fa.s_pad
    p_pad = fa.p_pad
    nb = B // b_tile
    lean = w1ad_ys is None
    ext_init = ad_init is not None
    chunked = bd_init is not None
    w1t, w2t = _WK(fa.w1t, mm), _WK(fa.w2t, mm)
    eft = _WK(fa.e_ft, mm)
    identity = fa.xsrc_mode == "identity"
    egt = None if identity else _WK(fa.e_gt, mm)
    w1 = _WK(fa.w1, mm) if lean else None
    ef = _WK(fa.e_f, mm) if lean else None
    eg = _WK(fa.e_g, mm) if (lean and not identity) else None
    kernel = _bwd_kernel_factory(w1t, w2t, eft, egt, identity, T,
                                 s_pad, p_pad, b_tile, sd,
                                 w1=w1, ef=ef, eg=eg,
                                 ext_init=ext_init, chunked=chunked,
                                 debug=debug)

    res_col = lambda: pl.BlockSpec((s_pad, 1), lambda b, t: (0, 0),
                                   memory_space=pltpu.VMEM)
    rev = lambda rows: pl.BlockSpec((1, rows, b_tile),
                                    lambda b, t: (T - 1 - t, 0, b),
                                    memory_space=pltpu.VMEM)
    rev_shift = pl.BlockSpec(
        (1, s_pad, b_tile),
        lambda b, t: (jnp.maximum(T - 2 - t, 0), 0, b),
        memory_space=pltpu.VMEM)
    w_spec = lambda a: pl.BlockSpec(a.shape, lambda b, t: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)

    wks = [w1t, w2t, eft] + ([egt] if egt else []) \
        + ([w1, ef] if lean else []) + ([eg] if eg else [])
    block_sb = lambda: pl.BlockSpec((s_pad, b_tile), lambda b, t: (0, b),
                                    memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                     memory_space=pltpu.SMEM),            # leaky coeff
        rev(8),                                           # mask rows (u)
        pl.BlockSpec(memory_space=pltpu.SMEM),            # end flags (T,)
        block_sb(),                                       # bd_fin
        res_col(), res_col(),                             # init, leaky
        pl.BlockSpec((s_all.shape[0], b_tile), lambda b, t: (0, b),
                     memory_space=pltpu.VMEM),            # s_all
    ]
    operands = [jnp.asarray(leaky_coefficient,
                            jnp.float32).reshape(1, 1),
                masks, _end_flags_of(masks),
                (fa.final[:, None] /
                 tot_prob.reshape(1, B).astype(jnp.float32)),  # bd_fin
                fa.initial[:, None], fa.leaky[:, None], s_all]
    if ext_init:
        in_specs.append(block_sb())                       # ad_init
        operands.append(ad_init)
    if chunked:
        in_specs.append(block_sb())                       # bd_init
        operands.append(bd_init)
    in_specs += [
        *[w_spec(a) for w in wks for a in w.arrays],
        rev_shift,                                        # ad_ys (u-1)
    ]
    operands += [a for w in wks for a in w.arrays]
    if lean:
        in_specs.append(rev(px_tm.shape[1]))              # px(u)
    else:
        in_specs += [rev(s_pad), rev(s_pad)]              # W1@alpha', x_dst
        if not identity:
            in_specs.append(rev(s_pad))                   # x_src(u)
    out_specs = [
        rev(p_pad),                                       # gamma
        pl.BlockSpec((1, 8, b_tile), lambda b, t: (T - 1 - t, 0, b),
                     memory_space=pltpu.VMEM),            # ab
        pl.BlockSpec((1, 8, b_tile), lambda b, t: (T - 1 - t, 0, b),
                     memory_space=pltpu.VMEM),            # gamma sums
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, p_pad, B), sd),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
    ]
    if chunked:
        out_specs.append(block_sb())                      # bd carry out
        out_shape.append(jax.ShapeDtypeStruct((s_pad, B), jnp.float32))
    scratch = [
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # bd carry
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # acc
        pltpu.VMEM((p_pad, b_tile), jnp.float32),         # gamma acc
    ]
    if lean:
        scratch.append(pltpu.VMEM((s_pad, b_tile), jnp.float32))  # W1@ad
        scratch.append(pltpu.VMEM((s_pad, b_tile), jnp.float32))  # x_dst
        if eg:
            scratch.append(pltpu.VMEM((s_pad, b_tile), jnp.float32))
        streams = [ad_ys, px_tm]
    else:
        streams = [ad_ys, w1ad_ys, xdst_ys]
        if not identity:
            streams.append(xsrc_ys)
    operands += streams
    return pl.pallas_call(
        kernel,
        grid=(nb, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(*operands)


# ----------------------------------------------------------------------
# Full fused fwd+bwd
# ----------------------------------------------------------------------

# "full" stream mode keeps three (T, S_pad, B) fwd->bwd streams (alpha,
# W1@alpha', x_dst (+x_src)); beyond this byte budget the "lean" mode
# keeps only alpha and recomputes the rest in the bwd kernel (~30%
# slower per step, a third of the HBM footprint) — long-T batches.
# Beyond LEAN_BUDGET for even the single alpha stream, the "ckpt" mode
# (checkpointed backward) stores only every C-th alpha row and replays
# each chunk's forward during the backward sweep: O(T/C + C) alpha
# residency, one extra forward recompute (~1.5x step time).
STREAM_BUDGET = 4 * 1024 * 1024 * 1024
LEAN_BUDGET = 4 * 1024 * 1024 * 1024


def select_stream_mode(T: int, s_pad: int, B: int, itemsize: int,
                       n_streams: int) -> str:
    """The "auto" stream-mode policy, exposed for tests and sizing:
    cheapest mode whose fwd->bwd streams fit the HBM budgets."""
    row_bytes = T * s_pad * B * itemsize
    if n_streams * row_bytes <= STREAM_BUDGET:
        return "full"
    if row_bytes <= LEAN_BUDGET:
        return "lean"
    return "ckpt"


def forward_backward_prob_pallas(px, lengths, fa: FactorizedArrays,
                                 leaky_coefficient=1e-5,
                                 b_tile: int = 128,
                                 stream_mode: str = "auto",
                                 ckpt_chunk: int = None,
                                 debug: bool = True) -> FwdBwdResult:
    """Fast-mode fused fwd+bwd on a fully-factorized graph.

    px: (B, T, P) exp'd clamped nnet output (float32).  Matches the XLA
    factorized path semantics with bfloat16 matmul/storage quantisation.
    stream_mode: "full" (fwd emits W1@alpha' and the emission rows for
    the bwd sweep — fastest), "lean" (alpha stream only, bwd recomputes
    — a third of the HBM footprint for long T), "ckpt" (checkpointed
    backward: sqrt(T)-spaced alpha snapshots + per-chunk forward replay
    — O(sqrt(T)) alpha residency for very long T, one extra forward
    recompute), or "auto" (cheapest mode whose streams fit the
    budgets).  ckpt_chunk overrides the ckpt chunk length C (default
    ~sqrt(T) rounded to a multiple of 8).
    debug: with True the alpha*beta and sum-gamma invariant traces are
    computed at every frame; with False only at frame 0 (the
    reference's default: chain-computation.cc:337-338 checks every
    frame only at verbose >= 1), which drops two to three reduction
    passes from the backward kernel's serial VPU chain — the other
    frames of the returned traces read exactly 1.0.  Verbose level
    >= 1 forces the full traces.
    """
    from ..utils.diagnostics import get_verbose_level
    debug = debug or get_verbose_level() >= 1
    if not supports(fa):
        raise ValueError("pallas path requires a fully factorized graph")
    B, T, P = px.shape
    if B % b_tile:
        b_tile = min(b_tile, B)
        while B % b_tile:
            b_tile //= 2
    s_pad = fa.s_pad
    lengths = lengths.astype(jnp.int32)

    # precision mode follows the graph's tile dtype: bfloat16 tiles ->
    # fast mode (bf16 MXU operands + bf16 streams); float32 tiles ->
    # parity mode (f32 throughout, ~3x slower matmuls)
    mm = jnp.dtype(fa.w1.tiles.dtype)
    if fa.w1.dense is not None:
        mm = jnp.dtype(fa.w1.dense.dtype)
    sd = BF if mm == BF else jnp.float32

    # ONE raw-emission stream for both sweeps: px time-major, padded to
    # the E matrices' column space.  The emission lookups x_dst/x_src
    # happen IN-KERNEL as one-hot E tile dots on the otherwise-idle MXU
    # (hidden under the stream DMA) — pre-gathered x_dst/x_src streams
    # cost 2-3 extra full XLA memory passes per batch and, for graphs
    # with separate forward pdfs, a second (T, S_pad, B) stream.
    if ckpt_chunk is not None and (not isinstance(ckpt_chunk, int)
                                   or ckpt_chunk <= 0):
        raise ValueError(f"ckpt_chunk must be a positive int, got "
                         f"{ckpt_chunk!r}")
    px_tm = px_time_major(px, fa, dtype=sd)               # (T, P_eff, B)

    if stream_mode == "auto":
        n_streams = 3 if fa.xsrc_mode == "identity" else 4
        stream_mode = select_stream_mode(
            T, s_pad, B, jnp.dtype(sd).itemsize, n_streams)
        if get_verbose_level() >= 1:
            import sys as _sys
            print(f"pychain_tpu: pallas stream_mode auto -> {stream_mode} "
                  f"(T={T}, s_pad={s_pad}, B={B})", file=_sys.stderr)
    if stream_mode == "ckpt":
        return _forward_backward_ckpt(
            px, px_tm, lengths, fa, leaky_coefficient, b_tile, mm, sd,
            ckpt_chunk, debug)
    if stream_mode not in ("full", "lean"):
        raise ValueError(f"unknown stream_mode {stream_mode!r}")
    emit_aux = stream_mode == "full"

    masks = _length_masks(lengths, T)

    fwd_out = _fwd_pallas(
        fa, px_tm, masks, leaky_coefficient, b_tile, mm, sd, emit_aux)
    ad_ys, s_ys8, ad_last = fwd_out[:3]
    w1ad_ys = xdst_ys = xsrc_ys = None
    if emit_aux:
        w1ad_ys, xdst_ys = fwd_out[3:5]
        if fa.xsrc_mode != "identity":
            xsrc_ys = fwd_out[5]

    s_all, objf, tot_prob = _objf_pallas(s_ys8, ad_last, lengths, fa,
                                         T, px.dtype)

    gamma_ys, ab8, gs8 = _bwd_pallas(
        fa, ad_ys, w1ad_ys, xdst_ys, xsrc_ys, px_tm, s_all, masks,
        tot_prob, leaky_coefficient, b_tile, mm, sd, debug=debug)

    return _package_result(objf, gamma_ys, ab8, gs8, P, px.dtype)


def _objf_pallas(s_ys8, ad_last, lengths, fa, T, dtype):
    """objf = sum_{u < T_b} log s_u + log(sum alpha'(T_b) * final).
    Returns (s_all (T+1, B), objf (B,), tot_prob (B,))."""
    s_ys = s_ys8[:, 0, :]                                 # (T, B)
    B = s_ys.shape[1]
    s0 = jnp.full((B,), fa.initial.sum(), dtype)
    s_all = jnp.concatenate([s0[None], s_ys], axis=0)     # (T+1, B)
    ts = jnp.arange(T + 1, dtype=jnp.int32)
    loglike = jnp.where(ts[:, None] < lengths[None, :],
                        jnp.log(jnp.maximum(s_all, 1e-30)), 0.0).sum(0)
    tot_prob = (ad_last * fa.final[:, None]).sum(axis=0)
    return s_all, loglike + jnp.log(tot_prob), tot_prob


def _package_result(objf, gamma_ys, ab8, gs8, P, dtype) -> FwdBwdResult:
    # compact posterior: exactly (T, P, B) in the kernel's storage dtype
    gamma_tm = gamma_ys
    if gamma_tm.shape[1] < P:
        gamma_tm = jnp.pad(gamma_tm,
                           ((0, 0), (0, P - gamma_tm.shape[1]), (0, 0)))
    elif gamma_tm.shape[1] > P:
        gamma_tm = gamma_tm[:, :P, :]
    gamma = jnp.transpose(gamma_tm, (2, 0, 1)).astype(dtype)

    alpha_beta = jnp.transpose(ab8[:, 0, :], (1, 0))      # (B, T)
    gamma_sum = jnp.transpose(gs8[:, 0, :], (1, 0))
    ok = _ok_flags(objf, alpha_beta, gamma_sum)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum,
                        gamma_tm=gamma_tm)


def _forward_backward_ckpt(px, px_tm, lengths, fa: FactorizedArrays,
                           leaky_coefficient, b_tile, mm, sd,
                           ckpt_chunk=None, debug=True) -> FwdBwdResult:
    """Checkpointed backward: the forward sweep stores only every C-th
    alpha row (C ~ sqrt(T)); the backward scan replays each C-frame
    chunk's forward from its snapshot (emitting the full-mode aux
    streams for just that chunk) and carries beta across chunks.  Alpha
    residency drops from O(T) rows to O(T/C + C); the price is one
    extra forward pass.  In float32 parity tiles the result is
    IDENTICAL to the "full" mode (same kernels, same arithmetic); with
    bfloat16 tiles the replayed alphas differ only by the snapshot
    rounding (same class as the full mode's bf16 alpha stream)."""
    B, T, P = px.shape
    s_pad = fa.s_pad
    p_eff = px_tm.shape[1]

    C = (ckpt_chunk if ckpt_chunk is not None
         else max(8, -8 * (-int(T ** 0.5) // 8)))
    C = min(C, T)
    nc = -(-T // C)
    T_pad = nc * C
    if T_pad != T:
        # pad frames with px = 1 (exp(0)): keeps every quantity finite
        # (the kernels rely on px > 0 past sequence end; a 0 would turn
        # the self-normalising junk alpha into NaN via 0/0)
        px_tm = jnp.concatenate(
            [px_tm, jnp.ones((T_pad - T, p_eff, B), px_tm.dtype)], axis=0)
    masks = _length_masks(lengths, T_pad)

    # phase 1: snapshot forward — alpha' at each chunk's last frame
    snaps, s_ys8, ad_last = _fwd_pallas(
        fa, px_tm, masks, leaky_coefficient, b_tile, mm, sd,
        emit_aux=False, snap_every=C)

    s_all, objf, tot_prob = _objf_pallas(s_ys8, ad_last, lengths, fa,
                                         T_pad, px.dtype)

    # phase 2: reverse chunk scan — replay fwd from the snapshot below,
    # then run the chunk's backward with the carried beta
    s0 = fa.initial.sum()
    ad0 = fa.initial + leaky_coefficient * s0 * fa.leaky    # (S_pad,)
    ad0_full = jnp.broadcast_to(ad0[:, None], (s_pad, B)).astype(sd)
    inits = jnp.concatenate([ad0_full[None], snaps[:-1]], axis=0)
    px_chunks = px_tm.reshape(nc, C, p_eff, B)
    mask_chunks = masks.reshape(nc, C, 8, B)
    ks = jnp.arange(nc, dtype=jnp.int32)
    identity = fa.xsrc_mode == "identity"

    def body(bd_carry, xs):
        k, ad_init_k, px_c, m_c = xs
        s_c = jax.lax.dynamic_slice(s_all, (k * C, 0), (C, B))
        fwd_c = _fwd_pallas(fa, px_c, m_c, leaky_coefficient, b_tile,
                            mm, sd, emit_aux=True,
                            ad_init=ad_init_k, s_init=s_c[0])
        ad_c = fwd_c[0]
        w1ad_c, xdst_c = fwd_c[3:5]
        xsrc_c = None if identity else fwd_c[5]
        gamma_c, ab8_c, gs8_c, bd_next = _bwd_pallas(
            fa, ad_c, w1ad_c, xdst_c, xsrc_c, px_c, s_c, m_c,
            tot_prob, leaky_coefficient, b_tile, mm, sd,
            ad_init=ad_init_k, bd_init=bd_carry, debug=debug)
        return bd_next, (gamma_c, ab8_c, gs8_c)

    bd0 = jnp.zeros((s_pad, B), jnp.float32)
    _, (gamma_cs, ab_cs, gs_cs) = jax.lax.scan(
        body, bd0, (ks, inits, px_chunks, mask_chunks), reverse=True)

    gamma_ys = gamma_cs.reshape(T_pad, fa.p_pad, B)[:T]
    ab8 = ab_cs.reshape(T_pad, 8, B)[:T]
    gs8 = gs_cs.reshape(T_pad, 8, B)[:T]
    return _package_result(objf, gamma_ys, ab8, gs8, P, px.dtype)

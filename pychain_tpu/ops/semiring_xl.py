"""XL one-hot log-semiring engine: arbitrary cyclic graphs BEYOND the
dense one-hot budget (ops/semiring.py ONEHOT_BUDGET).

The reference runs *any* log-domain numerator graph through its CUDA
kernels at per-arc-thread speed (chain-log-domain-kernels.cu:86-235).
On TPU the dense one-hot engine covers that capability only while the
(B, K, S) selector tensors fit next to the activations; beyond it the
generic gather engine is ~100-1000x slower (measured 6.1 utts/s at
B=128 T=500 S=1000 K~3100 vs 8770 for the headline denominator).

This engine removes the batch dimension from the selector storage:

* the per-graph arc incidence lives as int32 id vectors (B, K) in HBM
  (~KB per graph instead of K*S floats),
* the Pallas kernels run a (B, T) sequential grid; at each sequence's
  first frame they expand ITS (S_pad, K_pad) source/destination
  one-hot masks from the ids into VMEM scratch (one iota compare,
  ~K*S ops once per sweep) where they stay RESIDENT for all T steps,
* per frame the two semiring contractions are pure VPU multiply+
  reduce over the resident (S_pad, K_pad) masks — no gathers, no
  selects, no per-frame HBM weight traffic,
* layouts are chosen so nothing ever transposes in-kernel: the alpha/
  beta carries are (S, 1) columns, arc-indexed rows are (1, K), and
  the forward saves the arc-gathered alpha rows ``asel`` (the exact
  value the backward's occupancy needs) instead of alpha itself, so
  the backward never touches a state-indexed history,
* numerics are the proven select-free normalised-linear scheme of
  ops/pallas_semiring.py (per-frame max-shifted arc weights, alpha
  normalised to sum 1, beta to max 1 with an explicit log-scale
  carry, exact {0,1} multiply-add injection at each sequence's own
  final frame, dead mass as exact linear zeros), f32 throughout.

Emission lookup and posterior scatter (pdf-indexed, (B, T, K) <->
(B, T, P)) run OUTSIDE the kernels as batch-chunked one-hot MXU
matmuls with T rows — a real matmul per graph, unlike a
take_along_axis gather which measures ~50M elements/s on TPU (2.8 s
for the target size).

Capability target matched against the reference's log-domain CUDA
path (chain-log-domain-kernels.cu:86-235); recurrence semantics are
chain-log-domain-computation.cc (per-frame arbitrary scale, objf at
each sequence's own length, linear-space deterministic gamma).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fwdbwd import FwdBwdResult, _ok_flags
from .pallas_fact import VMEM_LIMIT, _interpret
from .pallas_semiring import TINY, EXP_CLAMP

NEG_INF = float("-inf")

_PREC = jax.lax.Precision.HIGHEST

# The two (S_pad, K_pad) one-hot masks must sit in VMEM next to the
# streamed rows, carries, and double-buffered outputs.  They are
# stored bf16 ({0,1} is exact; contractions cast to f32, so results
# are bit-identical to f32 masks at half the residency).
XL_VMEM_BUDGET = 60 * 1024 * 1024

# Beyond the resident budget, the STREAMED kernels re-expand the masks
# per (frame, arc-chunk) from the id rows; the only VMEM residents are
# one (S_pad, kc) mask pair + carries.  kc is sized so the pair stays
# ~24 MB, leaving room for the streamed rows' double buffers.
XL_STREAM_MASK_BUDGET = 24 * 1024 * 1024
# Streamed-XL eligibility ceiling on the state axis.  Its domain is
# LIST batches (per-sequence graphs); per-frame dense work is O(S*K)
# VPU ops, so the per-arc cost grows with S while the gather engine's
# is flat.  Measured IN-DOMAIN on chip (round 5,
# docs/ab/xl_stream_indomain.json: B=32, S=3500, K=7091, T=150):
# streamed-XL 8.33 ns/arc vs list-gather 61 ns/arc = 7.33x end-to-end
# (objf rel diff 3e-06), putting the measured breakeven at
# S ~ 3500 * 61/8.33 ~ 25.6k; 8192 keeps a ~3x margin.  SHARED
# broadcast graphs never reach this tier — they factorize and dispatch
# to the factorized-log path instead (measured 27.3x gather on chip
# where these dense masks measured 0.2x: shared-index gathers
# vectorize to ~1.9 ns/arc, docs/DESIGN.md).
XL_STREAM_MAX_S = 8192

# Emission/posterior one-hot matmuls are chunked over the batch so the
# transient (bc, K, P) selector stays modest.
CHUNK_BUDGET = 1 << 26


def _ceil(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def fits_xl_budget(max_k: int, max_s: int, itemsize: int = 2) -> bool:
    """Do one graph's two (S_pad, K_pad) masks of ``itemsize`` bytes
    fit the VMEM plan?  (itemsize=2: both this engine and the Pallas
    Viterbi sweep keep their masks bf16.)"""
    return (2 * _ceil(max_s, 8) * _ceil(max_k, 128) * itemsize
            <= XL_VMEM_BUDGET)


def fits_xl_stream(max_k: int, max_s: int) -> bool:
    """Can the STREAMED XL kernels serve this graph class?  The mask
    chunk is re-expanded per frame, so K is unbounded (any chunk count
    streams); the gate is the state axis, where per-frame O(S*K) VPU
    work erodes the advantage over the gather engine."""
    return _ceil(max_s, 8) <= XL_STREAM_MAX_S


def xl_chunk_arcs(max_k: int, max_s: int) -> int:
    """Arc-chunk width for the streamed kernels: the largest multiple
    of 128 whose (S_pad, kc) mask pair fits the stream budget (clamped
    to K_pad — a single chunk degenerates to the resident schedule with
    per-frame expansion)."""
    sp = _ceil(max_s, 8)
    kc = XL_STREAM_MASK_BUDGET // (2 * sp * 4) // 128 * 128
    return max(128, min(_ceil(max_k, 128), kc))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SemiringXLArrays:
    """Batched arbitrary log-domain graphs in arc-id (not one-hot) form.

    src/dst are padded with ``s_pad`` (an out-of-range state: the
    expanded one-hot column is all-zero) and logp with -inf (the arc
    weight becomes an exact linear 0), so padded arcs are inert.
    """
    src: jax.Array      # (B, K_pad) int32
    dst: jax.Array      # (B, K_pad) int32
    pdf: jax.Array      # (B, K_pad) int32 (0 on padding)
    logp: jax.Array     # (B, K_pad) f32 (-inf on padding)
    initial: jax.Array  # (B, S_pad) f32 log initial probs (-inf pad)
    final: jax.Array    # (B, S_pad) f32 log final probs (-inf pad)

    @property
    def num_states(self) -> int:
        return self.initial.shape[1]

    @property
    def k_pad(self) -> int:
        return self.src.shape[1]


def semiring_xl_arrays(batch) -> SemiringXLArrays:
    """Build XL arrays from a list- or broadcast-constructed
    ChainGraphBatch (the broadcast ctor holds the shared graph's
    tensors un-batched; they are tiled to (B, ...) here — the kernels
    index src/dst per batch row).

    Pure device-side padding of tensors the batch already holds — no
    per-graph host loop, so it is cheap enough to build lazily on
    first dispatch."""
    k, s = batch.num_transitions, batch.num_states
    kp, sp = _ceil(k, 128), _ceil(s, 8)
    pk, ps = kp - k, sp - s
    B = batch.batch_size
    bat = lambda a: (a if a.ndim == 2
                     else jnp.broadcast_to(a[None], (B,) + a.shape))
    pad_id = lambda a: jnp.pad(bat(a), ((0, 0), (0, pk)),
                               constant_values=sp)
    return SemiringXLArrays(
        src=pad_id(batch._fwd_src),
        dst=pad_id(batch._fwd_dst),
        pdf=jnp.pad(bat(batch._fwd_pdf), ((0, 0), (0, pk))),
        logp=jnp.pad(bat(batch._fwd_prob), ((0, 0), (0, pk)),
                     constant_values=NEG_INF),
        initial=jnp.pad(bat(batch._initial), ((0, 0), (0, ps)),
                        constant_values=NEG_INF),
        final=jnp.pad(bat(batch._final), ((0, 0), (0, ps)),
                      constant_values=NEG_INF),
    )


# ----------------------------------------------------------------------
# Batch-chunked one-hot MXU contractions (pdf-indexed <-> arc-indexed)
# ----------------------------------------------------------------------

def emissions_chunked(x, pdf):
    """em[b,t,k] = x[b,t,pdf[b,k]] as per-graph (T, P) @ (P, K) one-hot
    matmuls, chunked over the batch to bound the transient selector."""
    B, T, P = x.shape
    K = pdf.shape[1]
    bc = max(1, min(B, CHUNK_BUDGET // max(1, K * P)))
    outs = []
    for i in range(0, B, bc):
        oh = jax.nn.one_hot(pdf[i:i + bc], P, dtype=x.dtype)  # (bc, K, P)
        outs.append(jnp.einsum("btp,bkp->btk", x[i:i + bc], oh,
                               precision=_PREC))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def gamma_chunked(occ, pdf, num_pdfs: int):
    """gamma[b,t,p] = sum_k occ[b,t,k] [pdf[b,k] == p] — the transposed
    one-hot matmul, chunked over the batch."""
    B, T, K = occ.shape
    bc = max(1, min(B, CHUNK_BUDGET // max(1, K * num_pdfs)))
    outs = []
    for i in range(0, B, bc):
        oh = jax.nn.one_hot(pdf[i:i + bc], num_pdfs, dtype=occ.dtype)
        outs.append(jnp.einsum("btk,bkp->btp", occ[i:i + bc], oh,
                               precision=_PREC))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


# ----------------------------------------------------------------------
# Forward sweep
# ----------------------------------------------------------------------

def _mask_dtype(sp: int, kp: int):
    """f32 masks while they fit the VMEM plan (fastest: the per-step
    contractions skip the widening pass — measured 256 vs 212 utts/s
    at S=1000 K=3103 on chip); bf16 beyond (exact for {0,1} masks,
    half the residency, doubling the eligible graph size)."""
    return jnp.float32 if fits_xl_budget(kp, sp, itemsize=4) \
        else jnp.bfloat16


def _expand_onehots(src_row, dst_row, sp, kp, ohs, ohd):
    sid = jax.lax.broadcasted_iota(jnp.int32, (sp, kp), 0)
    ohs[:] = (src_row == sid).astype(ohs.dtype)
    ohd[:] = (dst_row == sid).astype(ohd.dtype)


def _fwd_kernel(lens_ref, src_ref, dst_ref, n0_ref, warc_ref,
                asel_out, raw_out, alast_out, ohs, ohd, nc):
    """Grid (B, T), sequential.  Carry nc: (S, 1) linear alpha
    normalised to sum 1.  Per step: two resident-mask contractions.
    Per-(b, t) streams are (B, T, 1, K): Mosaic requires the block's
    LAST TWO dims to be tile-divisible or whole, so the row lives in
    a trailing (1, K) pair with (b, t) as unconstrained leading dims."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    sp, kp = ohs.shape

    @pl.when(t == 0)
    def _():
        _expand_onehots(src_ref[0], dst_ref[0], sp, kp, ohs, ohd)
        nc[:] = n0_ref[0]

    w = warc_ref[0, 0]                                       # (1, K)
    asel = jnp.sum(ohs[:].astype(jnp.float32) * nc[:],
                   axis=0, keepdims=True)                    # (1, K)
    contrib = asel * w
    a_lin = jnp.sum(ohd[:].astype(jnp.float32) * contrib,
                    axis=1, keepdims=True)                   # (S, 1)
    raw = jnp.sum(a_lin, axis=0, keepdims=True)              # (1, 1)
    n_new = a_lin * (1.0 / jnp.maximum(raw, TINY))
    nc[:] = n_new
    asel_out[0, 0] = asel
    raw_out[0, 0] = jnp.broadcast_to(raw, raw_out.shape[2:])

    # alpha at each sequence's own final frame (ComputeTotLogLike /
    # BetaLastFrame need it; saving it here replaces a whole-history
    # take_along_axis)
    @pl.when(t + 1 == lens_ref[b])
    def _():
        alast_out[0] = n_new


def _fwd_pallas(g: SemiringXLArrays, warc, n0_col, lengths):
    B, T, kp = warc.shape
    sp = g.num_states
    col = pl.BlockSpec((1, sp, 1), lambda b, t: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    ids = pl.BlockSpec((1, 1, kp), lambda b, t: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    row = lambda w: pl.BlockSpec((1, 1, 1, w), lambda b, t: (b, t, 0, 0),
                                 memory_space=pltpu.VMEM)
    asel, raw, alast = pl.pallas_call(
        _fwd_kernel,
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # lengths
            ids, ids,                                        # src, dst
            col,                                             # n0
            row(kp),                                         # warc
        ],
        out_specs=[
            row(kp),                                         # asel
            row(128),                                        # raw sums
            pl.BlockSpec((1, sp, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),           # alpha(T_b)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, 1, kp), jnp.float32),
            jax.ShapeDtypeStruct((B, T, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, sp, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((sp, kp), _mask_dtype(sp, kp)),
                        pltpu.VMEM((sp, kp), _mask_dtype(sp, kp)),
                        pltpu.VMEM((sp, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(lengths, g.src[:, None, :], g.dst[:, None, :], n0_col,
      warc[:, :, None, :])
    return asel[:, :, 0, :], raw[:, :, 0, 0], alast[:, :, 0]


# ----------------------------------------------------------------------
# Backward sweep
# ----------------------------------------------------------------------

def _bwd_kernel(src_ref, dst_ref, rf_ref, warc_ref, asel_ref, rows_ref,
                occ_out, ab_out, ohs, ohd, rc, mc):
    """Grid (B, T), t reversed via the index maps.  Carries: rc (S, 1)
    linear beta normalised to max 1; mc (1, 1) its log scale.
    rows lanes: 0=inject, 1=1-inject, 2=c_t(+lz0 at u=0),
    3=c_t - s_t, 4=mf (final scale)."""
    gi = pl.program_id(1)
    sp, kp = ohs.shape

    @pl.when(gi == 0)
    def _():
        _expand_onehots(src_ref[0], dst_ref[0], sp, kp, ohs, ohd)
        rc[:] = jnp.zeros(rc.shape, jnp.float32)
        mc[:] = jnp.zeros(mc.shape, jnp.float32)

    row = rows_ref[0, 0]                                     # (1, 128)
    inj = row[0:1, 0:1]
    inj_not = row[0:1, 1:2]
    c_row = row[0:1, 2:3]
    c_m_s = row[0:1, 3:4]
    mf = row[0:1, 4:5]

    # beta'(u+1): the carry, or exp(final - max final) at each
    # sequence's own final frame — exact multiply-add injection
    # (per-(b,t) scalars here, not lane-varying masks)
    r_eff = rc[:] * inj_not + rf_ref[0] * inj                # (S, 1)
    m_eff = mc[0:1, 0:1] * inj_not + mf * inj                # (1, 1)

    w = warc_ref[0, 0]                                       # (1, K)
    bsel = jnp.sum(ohd[:].astype(jnp.float32) * r_eff,
                   axis=0, keepdims=True)                    # (1, K)
    vf = w * bsel
    b_lin = jnp.sum(ohs[:].astype(jnp.float32) * vf,
                    axis=1, keepdims=True)                   # (S, 1)

    # occ = alpha(u)[src] * arc * beta'(u+1)[dst], scale e; the clamp
    # only bites below e^-80 overlap (f32 noise).  asel was saved by
    # the forward — bit-identical to recomputing it from alpha(u).
    e = jnp.exp(jnp.minimum(m_eff + c_row, EXP_CLAMP))       # (1, 1)
    occ = asel_ref[0, 0] * vf * e                            # (1, K)
    occ_out[0, 0] = occ
    # sum_s alpha(u,s) beta(u,s) == sum_k occ(u,k) exactly (every
    # surviving path crosses one arc per frame), so the invariant
    # trace is the occupancy row-sum
    ab_out[0, 0] = jnp.broadcast_to(
        jnp.sum(occ, axis=1, keepdims=True), ab_out.shape[2:])

    m = jnp.max(b_lin, axis=0, keepdims=True)                # (1, 1)
    rc[:] = b_lin * (1.0 / jnp.maximum(m, TINY))
    mc[0:1, 0:1] = m_eff + c_m_s + jnp.log(jnp.maximum(m, TINY))


def _bwd_pallas(g: SemiringXLArrays, warc, asel, rows, rf_col):
    B, T, kp = warc.shape
    sp = g.num_states
    rev = lambda w: pl.BlockSpec((1, 1, 1, w),
                                 lambda b, t: (b, T - 1 - t, 0, 0),
                                 memory_space=pltpu.VMEM)
    ids = pl.BlockSpec((1, 1, kp), lambda b, t: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    occ, ab = pl.pallas_call(
        _bwd_kernel,
        grid=(B, T),
        in_specs=[
            ids, ids,                                        # src, dst
            pl.BlockSpec((1, sp, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),           # rf
            rev(kp),                                         # warc
            rev(kp),                                         # asel
            rev(128),                                        # scalar rows
        ],
        out_specs=[rev(kp), rev(128)],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, 1, kp), jnp.float32),   # occ
            jax.ShapeDtypeStruct((B, T, 1, 128), jnp.float32),  # a*b
        ],
        scratch_shapes=[pltpu.VMEM((sp, kp), _mask_dtype(sp, kp)),
                        pltpu.VMEM((sp, kp), _mask_dtype(sp, kp)),
                        pltpu.VMEM((sp, 1), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(g.src[:, None, :], g.dst[:, None, :], rf_col,
      warc[:, :, None, :], asel[:, :, None, :], rows[:, :, None, :])
    return occ[:, :, 0, :], ab[:, :, 0, 0]


# ----------------------------------------------------------------------
# Streamed variant: arc-chunked masks (beyond the resident VMEM budget)
# ----------------------------------------------------------------------
#
# Grid (B, T, G): chunk g covers arcs [g*kc, (g+1)*kc).  The (S_pad, kc)
# mask pair is RE-EXPANDED from the streamed id rows at every step —
# per frame that doubles the VPU element ops vs the resident kernels
# (expand ~= contract), but removes the VMEM ceiling on K entirely:
# the denominator-scale log-domain class (S~3000, K~50k, masks ~600 MB)
# the reference serves with per-arc CUDA threads
# (chain-log-domain-kernels.cu:86-235) runs here instead of falling
# ~100-1000x to the gather engine.  Numerics are IDENTICAL to the
# resident kernels: the chunk accumulator adds the same products in the
# same arc order, and chunk boundaries only split the k-reduction.


def _fwd_kernel_stream(lens_ref, src_ref, dst_ref, n0_ref, warc_ref,
                       asel_out, raw_out, alast_out, ohs, ohd, nc, acc):
    b = pl.program_id(0)
    t = pl.program_id(1)
    g = pl.program_id(2)
    ng = pl.num_programs(2)
    sp, kc = ohs.shape

    @pl.when((t == 0) & (g == 0))
    def _():
        nc[:] = n0_ref[0]

    @pl.when(g == 0)
    def _():
        acc[:] = jnp.zeros(acc.shape, jnp.float32)

    _expand_onehots(src_ref[0], dst_ref[0], sp, kc, ohs, ohd)
    w = warc_ref[0, 0]                                       # (1, kc)
    asel = jnp.sum(ohs[:].astype(jnp.float32) * nc[:],
                   axis=0, keepdims=True)                    # (1, kc)
    contrib = asel * w
    acc[:] += jnp.sum(ohd[:].astype(jnp.float32) * contrib,
                      axis=1, keepdims=True)                 # (S, 1)
    asel_out[0, 0] = asel

    @pl.when(g == ng - 1)
    def _():
        a_lin = acc[:]
        raw = jnp.sum(a_lin, axis=0, keepdims=True)          # (1, 1)
        n_new = a_lin * (1.0 / jnp.maximum(raw, TINY))
        nc[:] = n_new
        raw_out[0, 0] = jnp.broadcast_to(raw, raw_out.shape[2:])

        @pl.when(t + 1 == lens_ref[b])
        def _():
            alast_out[0] = n_new


def _fwd_pallas_stream(g: SemiringXLArrays, warc, n0_col, lengths, kc):
    B, T, kp = warc.shape
    sp = g.num_states
    G = kp // kc
    col = pl.BlockSpec((1, sp, 1), lambda b, t, gi: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    ids = pl.BlockSpec((1, 1, kc), lambda b, t, gi: (b, 0, gi),
                       memory_space=pltpu.VMEM)
    chunk = pl.BlockSpec((1, 1, 1, kc), lambda b, t, gi: (b, t, 0, gi),
                         memory_space=pltpu.VMEM)
    asel, raw, alast = pl.pallas_call(
        _fwd_kernel_stream,
        grid=(B, T, G),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # lengths
            ids, ids,                                        # src, dst
            col,                                             # n0
            chunk,                                           # warc
        ],
        out_specs=[
            chunk,                                           # asel
            pl.BlockSpec((1, 1, 1, 128), lambda b, t, gi: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),           # raw sums
            pl.BlockSpec((1, sp, 1), lambda b, t, gi: (b, 0, 0),
                         memory_space=pltpu.VMEM),           # alpha(T_b)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, 1, kp), jnp.float32),
            jax.ShapeDtypeStruct((B, T, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, sp, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((sp, kc), jnp.float32),
                        pltpu.VMEM((sp, kc), jnp.float32),
                        pltpu.VMEM((sp, 1), jnp.float32),
                        pltpu.VMEM((sp, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(lengths, g.src[:, None, :], g.dst[:, None, :], n0_col,
      warc[:, :, None, :])
    return asel[:, :, 0, :], raw[:, :, 0, 0], alast[:, :, 0]


def _bwd_kernel_stream(src_ref, dst_ref, rf_ref, warc_ref, asel_ref,
                       rows_ref, occ_out, ab_out, ohs, ohd, rc, mc,
                       reff, acc):
    gi = pl.program_id(1)
    g = pl.program_id(2)
    ng = pl.num_programs(2)
    sp, kc = ohs.shape

    @pl.when((gi == 0) & (g == 0))
    def _():
        rc[:] = jnp.zeros(rc.shape, jnp.float32)
        mc[:] = jnp.zeros(mc.shape, jnp.float32)

    row = rows_ref[0, 0]                                     # (1, 128)
    inj = row[0:1, 0:1]
    inj_not = row[0:1, 1:2]
    c_row = row[0:1, 2:3]
    c_m_s = row[0:1, 3:4]
    mf = row[0:1, 4:5]
    m_eff = mc[0:1, 0:1] * inj_not + mf * inj                # (1, 1)

    @pl.when(g == 0)
    def _():
        # frame prologue: beta' injection into a scratch that persists
        # across the chunk steps; zero the b_lin accumulator and the
        # alpha*beta partial (mc lane 1)
        reff[:] = rc[:] * inj_not + rf_ref[0] * inj          # (S, 1)
        acc[:] = jnp.zeros(acc.shape, jnp.float32)
        mc[0:1, 1:2] = jnp.zeros((1, 1), jnp.float32)

    _expand_onehots(src_ref[0], dst_ref[0], sp, kc, ohs, ohd)
    w = warc_ref[0, 0]                                       # (1, kc)
    bsel = jnp.sum(ohd[:].astype(jnp.float32) * reff[:],
                   axis=0, keepdims=True)                    # (1, kc)
    vf = w * bsel
    acc[:] += jnp.sum(ohs[:].astype(jnp.float32) * vf,
                      axis=1, keepdims=True)                 # (S, 1)

    e = jnp.exp(jnp.minimum(m_eff + c_row, EXP_CLAMP))       # (1, 1)
    occ = asel_ref[0, 0] * vf * e                            # (1, kc)
    occ_out[0, 0] = occ
    mc[0:1, 1:2] += jnp.sum(occ, axis=1, keepdims=True)

    @pl.when(g == ng - 1)
    def _():
        b_lin = acc[:]
        ab_out[0, 0] = jnp.broadcast_to(mc[0:1, 1:2], ab_out.shape[2:])
        m = jnp.max(b_lin, axis=0, keepdims=True)            # (1, 1)
        rc[:] = b_lin * (1.0 / jnp.maximum(m, TINY))
        mc[0:1, 0:1] = m_eff + c_m_s + jnp.log(jnp.maximum(m, TINY))


def _bwd_pallas_stream(g: SemiringXLArrays, warc, asel, rows, rf_col, kc):
    B, T, kp = warc.shape
    sp = g.num_states
    G = kp // kc
    rev_chunk = pl.BlockSpec((1, 1, 1, kc),
                             lambda b, t, gi: (b, T - 1 - t, 0, gi),
                             memory_space=pltpu.VMEM)
    ids = pl.BlockSpec((1, 1, kc), lambda b, t, gi: (b, 0, gi),
                       memory_space=pltpu.VMEM)
    occ, ab = pl.pallas_call(
        _bwd_kernel_stream,
        grid=(B, T, G),
        in_specs=[
            ids, ids,                                        # src, dst
            pl.BlockSpec((1, sp, 1), lambda b, t, gi: (b, 0, 0),
                         memory_space=pltpu.VMEM),           # rf
            rev_chunk,                                       # warc
            rev_chunk,                                       # asel
            pl.BlockSpec((1, 1, 1, 128),
                         lambda b, t, gi: (b, T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),           # scalar rows
        ],
        out_specs=[
            rev_chunk,                                       # occ
            pl.BlockSpec((1, 1, 1, 128),
                         lambda b, t, gi: (b, T - 1 - t, 0, 0),
                         memory_space=pltpu.VMEM),           # a*b
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, 1, kp), jnp.float32),   # occ
            jax.ShapeDtypeStruct((B, T, 1, 128), jnp.float32),  # a*b
        ],
        scratch_shapes=[pltpu.VMEM((sp, kc), jnp.float32),
                        pltpu.VMEM((sp, kc), jnp.float32),
                        pltpu.VMEM((sp, 1), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.VMEM((sp, 1), jnp.float32),
                        pltpu.VMEM((sp, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * 3,
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=_interpret(),
    )(g.src[:, None, :], g.dst[:, None, :], rf_col,
      warc[:, :, None, :], asel[:, :, None, :], rows[:, :, None, :])
    return occ[:, :, 0, :], ab[:, :, 0, 0]


# ----------------------------------------------------------------------
# Full fused fwd+bwd
# ----------------------------------------------------------------------

def forward_backward_semiring_xl(x, lengths,
                                 g: SemiringXLArrays) -> FwdBwdResult:
    """Fused log-domain fwd+bwd for XL cyclic graph batches.  Same f32
    semantics as forward_backward_semiring / the gather log engine
    (per-frame arbitrary scale, objf at each sequence's own length,
    -inf and zero posteriors for infeasible sequences).

    Engine tiering is internal: graphs whose (S_pad, K_pad) mask pair
    fits the resident VMEM budget run the resident kernels (masks
    expanded once per sweep); larger graphs run the STREAMED kernels
    (masks re-expanded per arc-chunk per frame — no ceiling on K)."""
    B, T, P = x.shape
    # lengths > T would leave the kernels' final-frame taps unfired
    # (uninitialized alpha(T_b) output); chain_function rejects this at
    # the public entry — repeat the concrete-value check here since
    # this engine is also exported directly
    if not isinstance(lengths, jax.core.Tracer):
        _l = np.asarray(lengths)
        if _l.size and int(_l.max()) > T:
            raise ValueError(
                f"lengths (max {int(_l.max())}) exceed the padded "
                f"frame axis T={T}")
    lengths = lengths.astype(jnp.int32)
    x = x.astype(jnp.float32)

    # engine tier: resident masks when they fit, arc-chunk streaming
    # beyond (kc sized from the stream mask budget; the K axis is
    # padded to a chunk multiple with inert arcs: ids=s_pad -> all-zero
    # mask columns, weight exp(-inf)=0)
    sp, kp = g.num_states, g.k_pad
    streamed = not fits_xl_budget(kp, sp, itemsize=2)
    kc = xl_chunk_arcs(kp, sp)
    if streamed and kp % kc:
        pad = kc - kp % kc
        g = dataclasses.replace(
            g,
            src=jnp.pad(g.src, ((0, 0), (0, pad)), constant_values=sp),
            dst=jnp.pad(g.dst, ((0, 0), (0, pad)), constant_values=sp),
            pdf=jnp.pad(g.pdf, ((0, 0), (0, pad))),
            logp=jnp.pad(g.logp, ((0, 0), (0, pad)),
                         constant_values=NEG_INF),
        )

    # hoisted arc weights, max-shifted per (sequence, frame)
    em = emissions_chunked(x, g.pdf)                         # (B, T, K)
    arc = g.logp[:, None, :] + em
    c = jnp.max(arc, axis=2)
    csafe = jnp.where(jnp.isfinite(c), c, 0.0)               # (B, T)
    warc = jnp.exp(arc - csafe[:, :, None])

    # normalised linear initial state
    ei = jnp.exp(g.initial)                                  # (B, S)
    z0 = jnp.sum(ei, axis=1)
    lz0 = jnp.where(z0 > 0, jnp.log(jnp.maximum(z0, TINY)), 0.0)
    n0_col = (ei / jnp.maximum(z0, TINY)[:, None])[:, :, None]

    if streamed:
        asel, raw, n_last = _fwd_pallas_stream(g, warc, n0_col, lengths,
                                               kc)
    else:
        asel, raw, n_last = _fwd_pallas(g, warc, n0_col, lengths)

    # log alpha-sums recovered host-side; -inf marks dead frames
    s_ys = jnp.where(raw > 0,
                     jnp.log(jnp.maximum(raw, TINY)) + csafe, NEG_INF)
    s_ys = s_ys.at[:, 0].add(lz0)
    ts = jnp.arange(1, T + 1, dtype=jnp.int32)
    ll = jnp.where(ts[None, :] < lengths[:, None], s_ys, 0.0).sum(1)

    s_all = jnp.concatenate([lz0[:, None], s_ys], axis=1)    # (B, T+1)
    s_last = jnp.take_along_axis(s_all, lengths[:, None], axis=1)[:, 0]

    fmax = jnp.max(g.final, axis=1)
    fmaxs = jnp.where(jnp.isfinite(fmax), fmax, 0.0)
    efin = jnp.exp(g.final - fmaxs[:, None])                 # (B, S)
    tsum = jnp.sum(n_last * efin, axis=1)
    tlp = jnp.where(tsum > 0,
                    jnp.log(jnp.maximum(tsum, TINY)) + fmaxs + s_last,
                    NEG_INF)
    objf = ll + tlp

    # ----- backward prep: all selects happen here, outside the kernel
    alive = jnp.isfinite(tlp)
    rf_col = jnp.where(alive[:, None], efin, 0.0)[:, :, None]
    mf = jnp.where(alive, fmaxs - tlp, 0.0)                  # (B,)

    inj = (lengths[:, None] == ts[None, :]).astype(jnp.float32)
    # c_t - s_t with s_0 = 0 (cc:89) and dead frames floored (dead
    # rows carry exact zeros regardless)
    s_scale = jnp.log(jnp.maximum(raw, TINY)) + csafe
    s_shift = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), s_scale[:, :-1]], axis=1)
    c_row = csafe.at[:, 0].add(lz0)
    rows = jnp.stack([inj, 1.0 - inj, c_row, csafe - s_shift,
                      jnp.broadcast_to(mf[:, None], (B, T))], axis=2)
    rows = jnp.pad(rows, ((0, 0), (0, 0), (0, 128 - rows.shape[2])))

    if streamed:
        occ, alpha_beta = _bwd_pallas_stream(g, warc, asel, rows, rf_col,
                                             kc)
    else:
        occ, alpha_beta = _bwd_pallas(g, warc, asel, rows, rf_col)

    # Deterministic gamma: chunked one-hot contraction arcs -> pdfs.
    gamma = gamma_chunked(occ, g.pdf, P)                     # (B, T, P)
    gamma_sum = gamma.sum(axis=2)
    ok = _ok_flags(objf, alpha_beta, gamma_sum)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum)

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

* fwd kernel: emissions (E_f/E_g @ x), alpha recurrence; emits
  alpha-dash rows, alpha-sums, and the ``W1 @ alpha'`` product (reused
  by the backward pass),
* bwd kernel: emissions again (cheaper than streaming them), beta
  recurrence, and the posteriors ``gamma = E_f^T c1 + E_g^T c2``
  emitted directly, plus the alpha*beta / sum-gamma invariant traces,
* outside (XLA): the objf reduction over alpha-sums — a handful of
  whole-batch elementwise ops.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .factorized import FactorizedArrays, WArrays
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

    The sweeps keep every stratified matrix resident (bf16) for all T
    steps; Mosaic additionally charges ~1 f32 copy of each tile in
    register-spill slots for the unrolled tile dots, plus ~24 live
    (s_pad, b_tile) f32 values.  Measured: S_pad=3072 (196 tiles +
    1664x1536 dense) fits with ~30 MB headroom; S_pad=8064 (1538
    tiles) needs ~158 MB and cannot fit in the 128 MB VMEM.  Beyond
    the budget, dispatch falls back to the XLA factorized engine,
    which has no VMEM ceiling (weights re-stream from HBM per frame).
    """
    tiles = 0
    dense = 0
    for w in (fa.w1, fa.w2, fa.e_f, fa.e_g):
        tiles += int(w.tiles.shape[0])
        if w.dense is not None:
            dense += int(w.dense.shape[0]) * int(w.dense.shape[1])
    est = tiles * 128 * 128 * 6 + dense * 3 \
        + 24 * fa.s_pad * b_tile * 4
    return est <= 90 * 1024 * 1024


class _WK:
    """Kernel-side view of one stratified matrix: canonical device
    arrays plus static tile coordinates (python ints -> the tile loop is
    fully unrolled at trace time).  ``mm_dtype`` sets the MXU operand
    precision: bfloat16 fast mode or float32 parity mode."""

    def __init__(self, w: WArrays, mm_dtype=BF):
        self.has_diag = w.diag is not None
        self.has_dense = w.dense is not None
        self.r0, self.c0 = w.dense_r0, w.dense_c0
        self.rows = tuple(w.rows)
        self.cols = tuple(w.cols)
        self.mm = jnp.dtype(mm_dtype)
        # f32 parity mode must not let the MXU round operands to bf16;
        # Mosaic's dot lowering supports DEFAULT and HIGHEST only (HIGH
        # raises NotImplementedError on real TPU), so the kernels pay
        # full 6-pass f32 in parity mode.  bf16 fast mode keeps the
        # native single-pass rate.
        self.prec = (jax.lax.Precision.DEFAULT if self.mm == jnp.bfloat16
                     else jax.lax.Precision.HIGHEST)
        self.arrays = []
        if self.has_diag:
            self.arrays.append(jnp.asarray(w.diag, jnp.float32)[:, None])
        if self.has_dense:
            self.arrays.append(jnp.asarray(w.dense, self.mm))
        if self.rows:
            self.arrays.append(jnp.asarray(w.tiles, self.mm))

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
        if self.rows:
            tref = refs[i]
            for k, (r, c) in enumerate(zip(self.rows, self.cols)):
                blk = jnp.dot(tref[k],
                              v[c * 128:(c + 1) * 128].astype(self.mm),
                              preferred_element_type=jnp.float32,
                              precision=self.prec)
                out_ref[r * 128:(r + 1) * 128, :] += blk


# ----------------------------------------------------------------------
# Forward sweep
# ----------------------------------------------------------------------

def _fwd_kernel_factory(w1, w2, ef, eg, T, s_pad, b_tile, sd):
    n = [w1.n_args, w2.n_args, ef.n_args, eg.n_args]

    def kernel(*refs):
        (lc_ref, len_ref, init_ref, leaky_ref) = refs[:4]
        o = 4
        w1_refs = refs[o:o + n[0]]; o += n[0]
        w2_refs = refs[o:o + n[1]]; o += n[1]
        ef_refs = refs[o:o + n[2]]; o += n[2]
        eg_refs = refs[o:o + n[3]]; o += n[3]
        px_ref = refs[o]; o += 1
        ad_out, s_out, w1fwd_out = refs[o:o + 3]
        ad, acc, xdst, xsrc, s_scr = refs[o + 3:]

        t = pl.program_id(1)
        leaky_c = lc_ref[0, 0]

        @pl.when(t == 0)
        def _():
            init_col = init_ref[:]                        # (S_pad, 1)
            s0 = jnp.sum(init_col)
            ad0 = init_col + leaky_c * s0 * leaky_ref[:]
            ad[:] = jnp.broadcast_to(ad0, (s_pad, b_tile))
            s_scr[0, :] = jnp.full((b_tile,), s0, jnp.float32)

        px = px_ref[0].astype(jnp.float32)                # (p_eff, Bt)
        ef.apply(ef_refs, px, xdst)
        eg.apply(eg_refs, px, xsrc)

        ad_v = ad[:]
        w1.apply(w1_refs, ad_v, acc)                      # acc = W1 @ ad
        w1fwd_out[0] = acc[:].astype(sd)
        a_part = xdst[:] * acc[:]
        w2.apply(w2_refs, xsrc[:] * ad_v, acc)            # acc = W2 @ u
        a = (a_part + acc[:]) / s_scr[0, :][None, :]
        s_t = jnp.sum(a, axis=0)
        ad_t = a + leaky_c * s_t[None, :] * leaky_ref[:]
        active = len_ref[0, :] > t                        # t+1 <= T_b
        ad_new = jnp.where(active[None, :], ad_t, ad_v)
        s_new = jnp.where(active, s_t, s_scr[0, :])
        ad[:] = ad_new
        s_scr[0, :] = s_new
        ad_out[0] = ad_new.astype(sd)
        s_out[0, 0, :] = s_new

    return kernel


def _fwd_pallas(fa: FactorizedArrays, px_bf, lengths, leaky_coefficient,
                b_tile, mm, sd):
    T, p_eff, B = px_bf.shape
    s_pad = fa.s_pad
    nb = B // b_tile
    w1, w2, ef, eg = (_WK(fa.w1, mm), _WK(fa.w2, mm), _WK(fa.e_f, mm),
                      _WK(fa.e_g, mm))
    kernel = _fwd_kernel_factory(w1, w2, ef, eg, T, s_pad, b_tile, sd)

    res_col = lambda: pl.BlockSpec((s_pad, 1), lambda b, t: (0, 0),
                                   memory_space=pltpu.VMEM)
    stream = lambda rows: pl.BlockSpec((1, rows, b_tile),
                                       lambda b, t: (t, 0, b),
                                       memory_space=pltpu.VMEM)
    w_spec = lambda a: pl.BlockSpec(a.shape, lambda b, t: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                     memory_space=pltpu.SMEM),            # leaky coeff
        pl.BlockSpec((1, b_tile), lambda b, t: (0, b),
                     memory_space=pltpu.VMEM),            # lengths
        res_col(), res_col(),                             # init, leaky
        *[w_spec(a) for w in (w1, w2, ef, eg) for a in w.arrays],
        stream(p_eff),                                    # px
    ]
    out_specs = [
        stream(s_pad),                                    # ad_ys
        pl.BlockSpec((1, 8, b_tile), lambda b, t: (t, 0, b),
                     memory_space=pltpu.VMEM),            # s_ys
        stream(s_pad),                                    # w1fwd_ys
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, s_pad, B), sd),
        jax.ShapeDtypeStruct((T, 8, B), jnp.float32),
        jax.ShapeDtypeStruct((T, s_pad, B), sd),
    ]
    scratch = [
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # ad carry
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # acc
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # xdst
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # xsrc
        pltpu.VMEM((8, b_tile), jnp.float32),             # s carry
    ]
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
    )(jnp.asarray(leaky_coefficient, jnp.float32).reshape(1, 1),
      lengths.reshape(1, B).astype(jnp.int32),
      fa.initial[:, None], fa.leaky[:, None],
      *w1.arrays, *w2.arrays, *ef.arrays, *eg.arrays, px_bf)


# ----------------------------------------------------------------------
# Backward sweep
# ----------------------------------------------------------------------

def _bwd_kernel_factory(w1t, w2t, ef, eg, eft, egt, T, s_pad, p_pad,
                        b_tile, sd):
    n = [w1t.n_args, w2t.n_args, ef.n_args, eg.n_args, eft.n_args,
         egt.n_args]

    def kernel(*refs):
        (lc_ref, len_ref, tot_ref, init_ref, leaky_ref, final_ref,
         s_all_ref) = refs[:7]
        o = 7
        w1t_refs = refs[o:o + n[0]]; o += n[0]
        w2t_refs = refs[o:o + n[1]]; o += n[1]
        ef_refs = refs[o:o + n[2]]; o += n[2]
        eg_refs = refs[o:o + n[3]]; o += n[3]
        eft_refs = refs[o:o + n[4]]; o += n[4]
        egt_refs = refs[o:o + n[5]]; o += n[5]
        ad_prev_ref, w1fwd_ref, px_ref = refs[o:o + 3]
        gamma_out, ab_out, gs_out = refs[o + 3:o + 6]
        bd, acc, xdst, xsrc, gacc = refs[o + 6:]

        g = pl.program_id(1)
        u = T - 1 - g
        leaky_c = lc_ref[0, 0]

        @pl.when(g == 0)
        def _():
            bd[:] = jnp.zeros((s_pad, b_tile), jnp.float32)

        lengths_v = len_ref[0, :]
        leaky_col = leaky_ref[:]
        final_col = final_ref[:]

        px = px_ref[0].astype(jnp.float32)
        ef.apply(ef_refs, px, xdst)
        eg.apply(eg_refs, px, xsrc)

        # alpha'(u): streamed ys block u-1, or rebuilt ad0 when u == 0
        init_col = init_ref[:]
        s0 = jnp.sum(init_col)
        ad0 = jnp.broadcast_to(init_col + leaky_c * s0 * leaky_col,
                               (s_pad, b_tile))
        ad_u = jnp.where(u == 0, ad0, ad_prev_ref[0].astype(jnp.float32))

        inject = lengths_v == (u + 1)
        bd_fin = final_col / tot_ref[0, :][None, :]
        bd_eff = jnp.where(inject[None, :], bd_fin, bd[:])
        b_next = bd_eff + leaky_c * jnp.sum(
            bd_eff * leaky_col, axis=0, keepdims=True)

        w1fwd = w1fwd_ref[0].astype(jnp.float32)
        s_u = s_all_ref[pl.ds(u, 1), :]                   # (1, b_tile)
        inv = 1.0 / s_u

        xb = xdst[:] * b_next
        w1t.apply(w1t_refs, xb, acc)                      # W1^T @ xb
        bd_part = acc[:]
        w2t.apply(w2t_refs, b_next, acc)                  # W2^T @ b_next
        w2term = acc[:]
        bd_t = (bd_part + xsrc[:] * w2term) * inv

        active = lengths_v > u
        c1 = jnp.where(active[None, :], xb * w1fwd * inv, 0.0)
        c2 = jnp.where(active[None, :], xsrc[:] * ad_u * w2term * inv, 0.0)
        eft.apply(eft_refs, c1, gacc)                     # E_f^T c1
        egt.apply(egt_refs, c2, gacc, accumulate=True)    # += E_g^T c2
        gamma_out[0] = gacc[:].astype(sd)
        gs_out[0, 0, :] = jnp.sum(gacc[:], axis=0)

        bd_new = jnp.where(active[None, :], bd_t, bd_eff)
        bd[:] = bd_new
        ab_out[0, 0, :] = jnp.sum(ad_u * bd_new, axis=0)

    return kernel


def _bwd_pallas(fa: FactorizedArrays, ad_ys, w1fwd_ys, px_bf, s_all,
                lengths, tot_prob, leaky_coefficient, b_tile, mm, sd):
    T, p_eff, B = px_bf.shape
    s_pad = fa.s_pad
    p_pad = fa.p_pad
    nb = B // b_tile
    w1t, w2t = _WK(fa.w1t, mm), _WK(fa.w2t, mm)
    ef, eg, eft, egt = (_WK(fa.e_f, mm), _WK(fa.e_g, mm),
                        _WK(fa.e_ft, mm), _WK(fa.e_gt, mm))
    kernel = _bwd_kernel_factory(w1t, w2t, ef, eg, eft, egt, T, s_pad,
                                 p_pad, b_tile, sd)

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
    brow = lambda: pl.BlockSpec((1, b_tile), lambda b, t: (0, b),
                                memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, 1), lambda b, t: (0, 0),
                     memory_space=pltpu.SMEM),            # leaky coeff
        brow(), brow(),                                   # lengths, tot
        res_col(), res_col(), res_col(),                  # init, leaky, final
        pl.BlockSpec((T + 1, b_tile), lambda b, t: (0, b),
                     memory_space=pltpu.VMEM),            # s_all
        *[w_spec(a) for w in (w1t, w2t, ef, eg, eft, egt)
          for a in w.arrays],
        rev_shift,                                        # ad_ys (u-1)
        rev(s_pad),                                       # w1fwd_ys
        rev(p_eff),                                       # px
    ]
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
    scratch = [
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # bd carry
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # acc
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # xdst
        pltpu.VMEM((s_pad, b_tile), jnp.float32),         # xsrc
        pltpu.VMEM((p_pad, b_tile), jnp.float32),         # gamma acc
    ]
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
    )(jnp.asarray(leaky_coefficient, jnp.float32).reshape(1, 1),
      lengths.reshape(1, B).astype(jnp.int32),
      tot_prob.reshape(1, B).astype(jnp.float32),
      fa.initial[:, None], fa.leaky[:, None], fa.final[:, None],
      s_all, *w1t.arrays, *w2t.arrays, *ef.arrays, *eg.arrays,
      *eft.arrays, *egt.arrays, ad_ys, w1fwd_ys, px_bf)


# ----------------------------------------------------------------------
# Full fused fwd+bwd
# ----------------------------------------------------------------------

def forward_backward_prob_pallas(px, lengths, fa: FactorizedArrays,
                                 leaky_coefficient=1e-5,
                                 b_tile: int = 128) -> FwdBwdResult:
    """Fast-mode fused fwd+bwd on a fully-factorized graph.

    px: (B, T, P) exp'd clamped nnet output (float32).  Matches the XLA
    factorized path semantics with bfloat16 matmul/storage quantisation.
    """
    if not supports(fa):
        raise ValueError("pallas path requires a fully factorized graph")
    B, T, P = px.shape
    if B % b_tile:
        b_tile = min(b_tile, B)
        while B % b_tile:
            b_tile //= 2
    s_pad = fa.s_pad
    p_eff = max(-(-P // 128) * 128, fa.p_pad)
    lengths = lengths.astype(jnp.int32)

    # precision mode follows the graph's tile dtype: bfloat16 tiles ->
    # fast mode (bf16 MXU operands + bf16 streams); float32 tiles ->
    # parity mode (f32 throughout, ~3x slower matmuls)
    mm = jnp.dtype(fa.w1.tiles.dtype)
    if fa.w1.dense is not None:
        mm = jnp.dtype(fa.w1.dense.dtype)
    sd = BF if mm == BF else jnp.float32

    px_tm = jnp.transpose(px, (1, 2, 0))                  # (T, P, B)
    if p_eff != P:
        px_tm = jnp.pad(px_tm, ((0, 0), (0, p_eff - P), (0, 0)))
    px_bf = px_tm.astype(sd)

    ad_ys, s_ys8, w1fwd_ys = _fwd_pallas(
        fa, px_bf, lengths, leaky_coefficient, b_tile, mm, sd)
    s_ys = s_ys8[:, 0, :]                                 # (T, B)

    s0 = jnp.full((B,), fa.initial.sum(), px.dtype)
    s_all = jnp.concatenate([s0[None], s_ys], axis=0)     # (T+1, B)

    # objf: sum_{u < T_b} log s_u + log(sum alpha'(T_b) * final)
    ts = jnp.arange(T + 1, dtype=jnp.int32)
    loglike = jnp.where(ts[:, None] < lengths[None, :],
                        jnp.log(jnp.maximum(s_all, 1e-30)), 0.0).sum(0)
    idx = (lengths - 1)[None, None, :].astype(jnp.int32)
    ad_last = jnp.take_along_axis(
        ad_ys, jnp.broadcast_to(idx, (1, s_pad, B)), axis=0)[0].astype(
            jnp.float32)
    tot_prob = (ad_last * fa.final[:, None]).sum(axis=0)
    objf = loglike + jnp.log(tot_prob)

    gamma_ys, ab8, gs8 = _bwd_pallas(
        fa, ad_ys, w1fwd_ys, px_bf, s_all, lengths, tot_prob,
        leaky_coefficient, b_tile, mm, sd)

    gamma = jnp.transpose(gamma_ys.astype(px.dtype), (2, 0, 1))
    if gamma.shape[2] < P:
        gamma = jnp.pad(gamma, ((0, 0), (0, 0), (0, P - gamma.shape[2])))
    elif gamma.shape[2] > P:
        gamma = gamma[:, :, :P]

    alpha_beta = jnp.transpose(ab8[:, 0, :], (1, 0))      # (B, T)
    gamma_sum = jnp.transpose(gs8[:, 0, :], (1, 0))
    ok = _ok_flags(objf, alpha_beta, gamma_sum)
    return FwdBwdResult(objf, gamma, ok, alpha_beta, gamma_sum)

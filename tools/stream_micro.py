"""Micro-timing of the streamed kernels: fwd sweep alone vs full
fwd+bwd, to locate where the beyond-VMEM frame time goes.

Usage: python tools/stream_micro.py [--b B] [--t T] [--chunk C]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def _arg(name, default):
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def main():
    B = int(_arg("--b", 64))
    T = int(_arg("--t", 300))
    chunk = int(_arg("--chunk", 64))
    iters = int(_arg("--iters", 10))

    from pychain_tpu import ChainGraph, ChainGraphBatch
    from pychain_tpu.utils.testgraphs import denominator_fst
    from pychain_tpu.ops import pallas_stream as ps
    from pychain_tpu.ops.factorized import px_time_major
    from pychain_tpu.ops.pallas_fact import BF

    rng = np.random.RandomState(0)
    den_fst, P = denominator_fst(num_phones=4000, states_per_phone=2,
                                 seed=0, bigram_fanout=30)
    den = ChainGraph(den_fst, log_domain=False)
    batch = ChainGraphBatch(den, B, tile_dtype="bfloat16")
    fa = batch._fact
    print(f"# S={den_fst.num_states} s_pad={fa.s_pad} "
          f"w1_tiles={fa.w1.tiles.shape[0]} chunk={chunk} B={B} T={T}",
          file=sys.stderr)

    x = np.exp(np.clip(rng.randn(B, T, P).astype(np.float32) * 0.2,
                       -30, 30))
    lengths = jnp.asarray(np.full(B, T, np.int32))
    px = jnp.asarray(x)

    def fwd_only(px):
        px_tm = px_time_major(px, fa, dtype=BF)
        masks = ps._length_masks(lengths, T)
        out = ps._fwd_stream(fa, px_tm, masks, 1e-5, min(B, 128), BF, BF,
                             chunk)
        return out[1][:, 0, :].sum()          # s rows: forces the sweep

    def full(px):
        res = ps.forward_backward_prob_stream(px, lengths, fa,
                                              chunk_tiles=chunk)
        return res.objf.sum() + res.gamma_tm.sum()

    for name, fn in (("fwd", fwd_only), ("full", full)):
        j = jax.jit(fn)
        t0 = time.time()
        v = j(px)
        v.block_until_ready()
        print(f"# [{name}] compile+first {time.time()-t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        for _ in range(iters):
            v = j(px)
        v.block_until_ready()
        dt = (time.time() - t0) / iters
        us = dt / T * 1e6
        print(f"{name}: {dt*1e3:.1f} ms/batch  {us:.1f} us/frame  "
              f"({B/dt:.0f} utts/s)")


if __name__ == "__main__":
    main()

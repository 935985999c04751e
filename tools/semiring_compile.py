#!/usr/bin/env python3
"""Measure WHERE the ~10-minute semiring-kernel cold compile goes
(VERDICT r4 weak #1 / task #2).

SWEEP_r4 bench_semiring: 719.3 s compile+first-run for a TINY graph
(B=128, T=500, S<=16, K<=40) while the far larger resident factorized
kernels compile in 3.4-5 s.  This tool times jit lower+compile of the
fwd kernel alone, the bwd kernel alone, and the full fused path, with
the persistent compilation cache DISABLED, across a T ladder — to pin
whether the cost scales with the (nb, T) grid, and which kernel pays.

Usage: python tools/semiring_compile.py [--ts 50,125,250,500] [--b 128]
Writes /tmp/semiring_compile.json.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _arg(name, default):
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


def main():
    ts_list = [int(t) for t in _arg("--ts", "50,125,250,500").split(",")]
    B = int(_arg("--b", 128))

    import jax
    jax.config.update("jax_enable_compilation_cache", False)
    import jax.numpy as jnp
    from pychain_tpu import ChainGraph, ChainGraphBatch
    from pychain_tpu.loss import dispatch_arrays
    from pychain_tpu.ops import pallas_semiring as ps
    from pychain_tpu.ops.semiring import _emissions
    from pychain_tpu.utils.testgraphs import random_fst

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    S_g, P = 16, 96
    graphs = [ChainGraph(random_fst(num_states=S_g, num_pdfs=P,
                                    max_arcs_per_state=3, seed=s),
                         log_domain=True) for s in range(B)]
    batch = ChainGraphBatch(
        graphs, max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))
    g = batch._semiring
    assert g is not None
    K = g.logp.shape[1]
    S = g.num_states
    rng = np.random.RandomState(0)
    results = []
    for T in ts_list:
        x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
        lengths = jnp.full((B,), T, jnp.int32)
        rec = dict(T=T, B=B, S=S, K=K)

        # full fused path (what bench --semiring pays per sweep stage)
        t0 = time.time()
        f = jax.jit(lambda xx: ps.forward_backward_semiring_pallas(
            xx, lengths, g).objf)
        f(x).block_until_ready()
        rec["full_s"] = round(time.time() - t0, 1)

        # fwd kernel alone
        b_tile = min(128, B)
        em = _emissions(x, g)
        arc = g.logp[:, None, :] + em
        c = jnp.max(arc, axis=2)
        csafe = jnp.where(jnp.isfinite(c), c, 0.0)
        warc_tm = jnp.transpose(jnp.exp(arc - csafe[:, :, None]),
                                (1, 2, 0))
        ei = jnp.exp(g.initial)
        z0 = jnp.sum(ei, axis=1)
        n0_sb = jnp.transpose(
            ei / jnp.maximum(z0, ps.TINY)[:, None], (1, 0))
        t0 = time.time()
        fwd = jax.jit(lambda w: ps._fwd_pallas(g, w, n0_sb, b_tile)[0])
        fwd(warc_tm).block_until_ready()
        rec["fwd_s"] = round(time.time() - t0, 1)

        # bwd kernel alone (dummy aux streams of the right shape)
        n_ys = jnp.zeros((T, S, B), jnp.float32)
        rows = jnp.zeros((T, 8, B), jnp.float32)
        rf_sb = jnp.zeros((S, B), jnp.float32)
        mf = jnp.zeros((B,), jnp.float32)
        t0 = time.time()
        bwd = jax.jit(lambda w: ps._bwd_pallas(
            g, w, n_ys, n0_sb, rows, rf_sb, mf, b_tile)[0])
        bwd(warc_tm).block_until_ready()
        rec["bwd_s"] = round(time.time() - t0, 1)

        print(f"# T={T}: full={rec['full_s']}s fwd={rec['fwd_s']}s "
              f"bwd={rec['bwd_s']}s", file=sys.stderr)
        results.append(rec)

    out = _arg("--out", "/tmp/semiring_compile.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())

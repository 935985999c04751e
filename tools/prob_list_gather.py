#!/usr/bin/env python3
"""Measure the gather engine on a prob-domain LIST batch (VERDICT r4
task #5): per-sequence leaky-HMM graphs — the one reference class
(batched per-sequence prob-domain kernels, chain-kernels.cu:112-127)
with no fast engine here at any size.

The number this records feeds the DESIGN.md decision note: the dense
vmapped-factorized alternative re-reads 2 x (B, S, S) transition
matrices from HBM per frame (no cross-batch weight reuse, unlike the
shared engine's (S,B) matrix-matrix form), so its roofline is
2*B*S^2*itemsize*T*2 bytes of traffic — compare against the measured
gather ns/arc here.

Usage: python tools/prob_list_gather.py [--b 8] [--phones 1000]
                                        [--t 300] [--iters 5]
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
    B = int(_arg("--b", 8))
    phones = int(_arg("--phones", 1000))
    T = int(_arg("--t", 300))
    iters = int(_arg("--iters", 5))

    import jax
    import jax.numpy as jnp
    from pychain_tpu import ChainGraph, ChainGraphBatch
    from pychain_tpu.loss import chain_function, dispatch_arrays
    from pychain_tpu.utils.testgraphs import denominator_fst

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(0)
    graphs = []
    P = 0
    for s in range(B):
        fst, p = denominator_fst(num_phones=phones, states_per_phone=2,
                                 seed=s, bigram_fanout=10)
        graphs.append(ChainGraph(fst, log_domain=False))
        P = max(P, p)
    max_k = max(g.num_transitions for g in graphs)
    max_s = max(g.num_states for g in graphs)
    tile_dtype = _arg("--tile-dtype", "float32")
    batch = ChainGraphBatch(graphs, max_num_transitions=max_k,
                            max_num_states=max_s, tile_dtype=tile_dtype)
    print(f"# B={B} S={max_s} K={max_k} T={T} P={P}", file=sys.stderr)

    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32) * 0.2)
    lengths = jnp.asarray(
        np.clip(rng.randint(T // 2, T + 1, size=B), 1, T).astype(
            np.int32))

    def bench(impl):
        g = dispatch_arrays(batch, impl)
        # the graph pytree must be a jit ARGUMENT: closed-over device
        # arrays become embedded HLO constants, and the dense blocks
        # (hundreds of MB) overflow the remote-compile request
        vg = jax.jit(jax.value_and_grad(
            lambda xx, gg: chain_function(xx, lengths, gg)))
        t0 = time.time()
        loss, grad = vg(x, g)
        _ = float(loss) + float(np.asarray(grad)[0, 0, 0])
        compile_s = round(time.time() - t0, 1)
        t0 = time.time()
        for _ in range(iters):
            l, gr = vg(x, g)
        _ = float(l) + float(np.asarray(gr)[0, 0, 0])
        dt = (time.time() - t0) / iters
        return dt, compile_s, float(loss)

    arcs_total = 2 * B * T * max_k
    dense_bytes = 2 * 2 * B * max_s * max_s * 2 * T  # fwd+bwd, 2 mats, bf16
    dt_g, cs_g, objf_g = bench("gather")
    dt_d, cs_d, objf_d = bench("dense_list")
    rec = dict(B=B, S=max_s, K=max_k, T=T, P=P,
               gather_compile_s=cs_g,
               gather_ms=round(dt_g * 1e3, 1),
               gather_utts_s=round(B / dt_g, 1),
               gather_ns_arc=round(dt_g / arcs_total * 1e9, 2),
               dense_compile_s=cs_d,
               dense_ms=round(dt_d * 1e3, 1),
               dense_utts_s=round(B / dt_d, 1),
               dense_roofline_s=round(dense_bytes / 800e9, 2),
               speedup=round(dt_g / dt_d, 2),
               objf_rel_diff=abs(objf_d - objf_g) / abs(objf_g),
               objf=objf_g)
    print(f"# gather: {rec['gather_ms']} ms/batch = "
          f"{rec['gather_utts_s']} utts/s ({rec['gather_ns_arc']} "
          f"ns/arc); dense_list: {rec['dense_ms']} ms/batch = "
          f"{rec['dense_utts_s']} utts/s -> {rec['speedup']}x "
          f"(roofline {rec['dense_roofline_s']}s/batch, objf rel diff "
          f"{rec['objf_rel_diff']:.2e})", file=sys.stderr)
    out = _arg("--out", "/tmp/prob_list_gather.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""In-domain on-chip A/B for the STREAMED XL semiring tier (VERDICT r4
task #3): a LIST batch of per-sequence cyclic log-domain graphs whose
one-hot masks exceed the 60 MB resident budget (fits_xl_budget False)
but whose state axis is within XL_STREAM_MAX_S — the only class the
streamed tier still claims after round 4 rerouted shared graphs to
factorized-log.  Until now its eligibility rested on extrapolated
micro-measurements (105 ns/arc list-gather, "breakeven ~ S=30k").

Usage: python tools/xl_stream_indomain.py [--b 32] [--s 3500] [--t 150]
                                          [--arcs 3] [--iters 5]
Writes /tmp/xl_stream_indomain.json.
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
    B = int(_arg("--b", 32))
    S = int(_arg("--s", 3500))
    T = int(_arg("--t", 150))
    arcs = int(_arg("--arcs", 3))
    iters = int(_arg("--iters", 5))
    P = int(_arg("--p", 512))

    import jax
    import jax.numpy as jnp
    from pychain_tpu import ChainGraph, ChainGraphBatch
    from pychain_tpu.loss import chain_function, dispatch_arrays
    from pychain_tpu.ops.semiring_xl import (fits_xl_budget,
                                             fits_xl_stream,
                                             xl_chunk_arcs)
    from pychain_tpu.utils.testgraphs import random_fst

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(0)
    t0 = time.time()
    graphs = [ChainGraph(random_fst(num_states=S, num_pdfs=P,
                                    max_arcs_per_state=arcs, seed=s),
                         log_domain=True) for s in range(B)]
    max_k = max(g.num_transitions for g in graphs)
    max_s = max(g.num_states for g in graphs)
    batch = ChainGraphBatch(graphs, max_num_transitions=max_k,
                            max_num_states=max_s)
    print(f"# B={B} S={max_s} K={max_k} T={T} P={P} "
          f"built {time.time()-t0:.1f}s", file=sys.stderr)
    print(f"# fits_xl_budget={fits_xl_budget(max_k, max_s)} "
          f"fits_xl_stream={fits_xl_stream(max_k, max_s)} "
          f"chunk_arcs={xl_chunk_arcs(max_k, max_s)}", file=sys.stderr)
    assert not fits_xl_budget(max_k, max_s), \
        "not in the STREAMED tier's domain (masks fit resident)"
    assert fits_xl_stream(max_k, max_s)

    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = jnp.asarray(
        np.clip(rng.randint(T // 2, T + 1, size=B), 1, T).astype(
            np.int32))

    rec = dict(B=B, S=max_s, K=max_k, T=T, P=P)
    objfs = {}
    for impl in ("semiring_xl", "gather"):
        g = dispatch_arrays(batch, impl)
        print(f"# impl={impl} -> {type(g).__name__}", file=sys.stderr)
        vg = jax.jit(jax.value_and_grad(
            lambda xx, gg=g: chain_function(xx, lengths, gg)))
        t0 = time.time()
        loss, grad = vg(x)
        _ = float(loss) + float(np.asarray(grad)[0, 0, 0])
        rec[f"{impl}_compile_s"] = round(time.time() - t0, 1)
        n = iters if impl != "gather" else max(2, iters // 2)
        t0 = time.time()
        for _ in range(n):
            l, gr = vg(x)
        _ = float(l) + float(np.asarray(gr)[0, 0, 0])
        dt = (time.time() - t0) / n
        rec[f"{impl}_ms"] = round(dt * 1e3, 1)
        rec[f"{impl}_utts_s"] = round(B / dt, 1)
        objfs[impl] = float(loss)
        # per-arc cost of the gather engine on per-row indices: the
        # figure the eligibility gate extrapolates from
        arcs_total = 2 * B * T * max_k         # fwd + bwd sweeps
        rec[f"{impl}_ns_arc"] = round(dt / arcs_total * 1e9, 2)
        print(f"#   {impl}: {rec[f'{impl}_ms']} ms/batch = "
              f"{rec[f'{impl}_utts_s']} utts/s "
              f"({rec[f'{impl}_ns_arc']} ns/arc, compile "
              f"{rec[f'{impl}_compile_s']}s)", file=sys.stderr)
    rec["objf_rel_diff"] = abs(objfs["semiring_xl"] - objfs["gather"]) \
        / max(1e-9, abs(objfs["gather"]))
    rec["speedup"] = round(
        rec["gather_ms"] / rec["semiring_xl_ms"], 2)
    print(f"# speedup={rec['speedup']}x objf_rel_diff="
          f"{rec['objf_rel_diff']:.2e}", file=sys.stderr)

    out = _arg("--out", "/tmp/xl_stream_indomain.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())

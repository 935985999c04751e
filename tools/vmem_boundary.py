#!/usr/bin/env python3
"""Sweep denominator sizes across the Pallas engine-tier boundaries.

For each size: dispatch impl="pallas", which must select one of the
THREE tiers — VMEM-resident kernels under fits_vmem, the
weight-streaming kernels beyond it (W1 tiles streamed through the
grid pipeline, everything else resident), the XLA factorized engine
as the no-VMEM-ceiling fallback — and run one fwd-bwd + a short
amortized timing.  A Mosaic compile error at any size is a failure
(VERDICT r2 weak #6); each entry records which engine served it, so
the report pins the resident->stream handoff in the S=3000-8000 band
(the cliff that used to slide 1052->500->256 utts/s onto the XLA scan
before the stream tier existed, SWEEP_r3 vmem_boundary).

Usage: python tools/vmem_boundary.py [--phones 1500,...,5000]
Writes /tmp/vmem_boundary.json; exit 0 when every size ran clean.
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phones", default="1500,2000,2500,3000,4000,5000")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="/tmp/vmem_boundary.json")
    args = ap.parse_args()

    from pychain_tpu.utils.backend import tpu_tunnel_alive, tunnel_env_set
    if tunnel_env_set() and not tpu_tunnel_alive():
        print("TPU tunnel unreachable", file=sys.stderr)
        return 1

    import jax
    import jax.numpy as jnp
    from pychain_tpu import ChainGraph, ChainGraphBatch
    from pychain_tpu.loss import chain_function, dispatch_arrays
    from pychain_tpu.ops.pallas_fact import fits_vmem
    from pychain_tpu.utils.testgraphs import denominator_fst

    B, T = 128, 500
    results = []
    ok = True
    for phones in [int(p) for p in args.phones.split(",")]:
        t0 = time.time()
        den_fst, P = denominator_fst(num_phones=phones,
                                     states_per_phone=2, seed=0,
                                     bigram_fanout=30)
        den = ChainGraph(den_fst, log_domain=False)
        batch = ChainGraphBatch(den, B, tile_dtype="bfloat16")
        fa = batch._fact
        fits = bool(fits_vmem(fa))
        entry = {"phones": phones, "S": den.num_states,
                 "K": den.num_transitions, "fits_vmem": fits,
                 "build_s": round(time.time() - t0, 1)}
        try:
            g = dispatch_arrays(batch, "pallas")
            engine = getattr(g, "engine", "?")
            entry["engine"] = engine
            x = jax.random.normal(jax.random.PRNGKey(0), (B, T, P),
                                  jnp.float32)
            lengths = jnp.full((B,), T, jnp.int32)
            vg = jax.jit(jax.value_and_grad(chain_function))
            t0 = time.time()
            o, gr = vg(x, lengths, g)
            _ = float(o) + float(gr[0, 0, 0])
            entry["compile_s"] = round(time.time() - t0, 1)
            t0 = time.time()
            for _ in range(args.iters):
                o, gr = vg(x, lengths, g)
            _ = float(o) + float(gr[0, 0, 0])
            per = (time.time() - t0) / args.iters
            entry["ms_batch"] = round(per * 1000, 1)
            entry["utts_s"] = round(B / per, 1)
            entry["objf"] = float(o)
            entry["ok"] = bool(np.isfinite(float(o)))
        except Exception as e:  # a Mosaic error here is the bug
            entry["error"] = repr(e)[:400]
            entry["ok"] = False
        ok &= entry.get("ok", False)
        print(json.dumps(entry), flush=True)
        results.append(entry)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(("BOUNDARY SWEEP OK" if ok else "BOUNDARY SWEEP FAILED")
          + f" -> {args.out}", file=sys.stderr)
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""A/B the prob-domain engines for the impl='auto' TPU tiering decision.

Measures, at a given (B, T, S) denominator config, value+grad through
the custom_vjp core for each parity-grade engine:

* XLA factorized (f32, HIGH precision)        — the current auto default
* Pallas resident (f32 tiles, HIGHEST 6-pass) — candidate auto default
  under fits_vmem
* Pallas stream  (f32 tiles)                  — candidate beyond VMEM
* Pallas resident/stream (bf16 tiles)         — the opt-in fast mode,
  for context

Usage: python tools/auto_ab.py [--s8k | --s5k] [--quick]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pychain_tpu import ChainGraph, ChainGraphBatch  # noqa: E402
from pychain_tpu.loss import chain_function, dispatch_arrays  # noqa: E402
from pychain_tpu.utils.testgraphs import denominator_fst  # noqa: E402

QUICK = "--quick" in sys.argv
if "--s8k" in sys.argv:
    B, T, NP, FO = 64, 300, 4000, 30
elif "--s5k" in sys.argv:
    B, T, NP, FO = 64, 300, 2500, 30
else:
    B, T, NP, FO = 128, 500, 1500, 30
if QUICK:
    B, T, NP, FO = 16, 100, 100, 10

ITERS = 3 if QUICK else 30


def measure(tag, g, x, lengths, iters=ITERS):
    vg = jax.jit(jax.value_and_grad(chain_function))
    t0 = time.time()
    o, gr = vg(x, lengths, g)
    _ = float(o) + float(gr[0, 0, 0])
    compile_s = time.time() - t0
    del o, gr

    def timed(n):
        t0 = time.time()
        for _ in range(n):
            o, gr = vg(x, lengths, g)
        _ = float(o) + float(gr[0, 0, 0])
        return (time.time() - t0) / n

    timed(2)
    best = min(timed(iters) for _ in range(2))
    print(f"# [{tag}] compile {compile_s:.1f}s  {best*1000:.2f} ms/batch "
          f"({B/best:.1f} utts/s)", file=sys.stderr)
    return {"tag": tag, "compile_s": round(compile_s, 1),
            "ms_per_batch": round(best * 1000, 2),
            "utts_per_sec": round(B / best, 1)}


def main():
    import dataclasses
    from pychain_tpu.ops.pallas_fact import fits_vmem, supports
    from pychain_tpu.ops.pallas_stream import fits_stream

    fst, P = denominator_fst(num_phones=NP, states_per_phone=2,
                             bigram_fanout=FO, seed=0)
    den = ChainGraph(fst, log_domain=False)
    b_f32 = ChainGraphBatch(den, B)
    b_bf16 = ChainGraphBatch(den, B, tile_dtype="bfloat16")
    S, K = den.num_states, den.num_transitions
    print(f"# backend={jax.default_backend()} B={B} T={T} S={S} K={K} "
          f"P={P}", file=sys.stderr)
    fa32, fa16 = b_f32._fact, b_bf16._fact
    print(f"# fits_vmem(f32)={fits_vmem(fa32)} "
          f"fits_vmem(bf16)={fits_vmem(fa16)} "
          f"fits_stream(f32)={fits_stream(fa32)} "
          f"fits_stream(bf16)={fits_stream(fa16)}", file=sys.stderr)

    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, P), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)

    results = []
    results.append(measure("xla_f32", fa32, x, lengths))
    if supports(fa32):
        if fits_vmem(fa32):
            results.append(measure(
                "pallas_f32", dataclasses.replace(fa32, engine="pallas"),
                x, lengths))
        elif fits_stream(fa32):
            results.append(measure(
                "stream_f32", dataclasses.replace(fa32, engine="stream"),
                x, lengths))
        if fits_vmem(fa16):
            results.append(measure(
                "pallas_bf16", dataclasses.replace(fa16, engine="pallas"),
                x, lengths))
        elif fits_stream(fa16):
            results.append(measure(
                "stream_bf16", dataclasses.replace(fa16, engine="stream"),
                x, lengths))
    # objf agreement vs the XLA engine
    vg = jax.jit(chain_function)
    ref = float(vg(x, lengths, fa32))
    for eng, fa in (("pallas", fa32), ("stream", fa32)):
        ok = (fits_vmem(fa) if eng == "pallas" else
              (not fits_vmem(fa) and fits_stream(fa)))
        if supports(fa) and ok:
            got = float(vg(x, lengths, dataclasses.replace(fa, engine=eng)))
            print(f"# objf rel diff {eng}_f32 vs xla_f32: "
                  f"{abs(got-ref)/abs(ref):.2e}", file=sys.stderr)
    print(json.dumps({"config": {"B": B, "T": T, "S": S, "K": K, "P": P},
                      "results": results}))


if __name__ == "__main__":
    main()

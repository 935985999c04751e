#!/usr/bin/env python3
"""Localize the S>=9000 weight-stream collapse (VERDICT r4 #1).

Round 4 measured the stream kernels' fast regime ending between
s_pad 8064 (1600 utts/s, B=128 T=500 bf16) and 9088 (206 utts/s), with
chunk size, b_tile and vmem_limit all eliminated as causes.  The
untested cheap hypothesis: the cliff sits exactly at s_pad crossing
8192 = 2^13 — the point where a (s_pad, 128) f32 buffer passes 4 MiB
and a (1, s_pad, 128) bf16 stream block passes 2 MiB, both classic
Mosaic DMA/window granularity constants.

Usage: python tools/stream_cliff.py [--spads 8064,8192,8320,8576,9088]
                                    [--b 128] [--t 500] [--iters 10]
                                    [--engine stream|pallas|xla]
Writes /tmp/stream_cliff.json.
"""
import dataclasses
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
    spads = [int(s) for s in
             _arg("--spads", "8064,8192,8320,8576,9088").split(",")]
    B = int(_arg("--b", 128))
    T = int(_arg("--t", 500))
    iters = int(_arg("--iters", 10))
    engine = _arg("--engine", "stream")
    pdfs = int(_arg("--pdfs", 0))          # 0 = generator default (2*phones)
    b_tile = int(_arg("--btile", 0))       # 0 = engine default
    chunk_arg = int(_arg("--chunk", 0))    # 0 = auto
    vmem_mb = int(_arg("--vmem", 0))       # 0 = module default
    force = "--force" in sys.argv          # bypass fits_stream clamps

    import jax
    import jax.numpy as jnp
    from pychain_tpu import ChainGraph, ChainGraphBatch
    from pychain_tpu.loss import chain_function
    from pychain_tpu.ops import pallas_stream
    from pychain_tpu.utils.testgraphs import denominator_fst

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    if vmem_mb:
        pallas_stream.VMEM_LIMIT = vmem_mb * 1024 * 1024
        print(f"# vmem_limit_bytes -> {vmem_mb} MB", file=sys.stderr)
    if force:
        pallas_stream.fits_stream = lambda *a, **k: True
        print("# fits_stream forced True (measuring Mosaic's real "
              "ceiling)", file=sys.stderr)
    rng = np.random.RandomState(0)
    results = []
    for s_target in spads:
        phones = s_target // 2
        t0 = time.time()
        den_fst, P = denominator_fst(num_phones=phones,
                                     states_per_phone=2, seed=0,
                                     bigram_fanout=30,
                                     num_pdfs=pdfs or None)
        den = ChainGraph(den_fst, log_domain=False)
        batch = ChainGraphBatch(den, B, tile_dtype="bfloat16")
        fa = batch._fact
        chunk = pallas_stream.auto_chunk_tiles(fa)
        rec = dict(s_pad=fa.s_pad, phones=phones, P=P,
                   w1_tiles=int(fa.w1.tiles.shape[0]),
                   chunk=chunk, engine=engine,
                   build_s=round(time.time() - t0, 1))
        print(f"# s_pad={fa.s_pad} tiles={rec['w1_tiles']} "
              f"chunk={chunk} built {rec['build_s']}s", file=sys.stderr)

        if engine == "xla":
            g = fa
        else:
            g = dataclasses.replace(fa, engine=engine)
        x = jnp.asarray(rng.randn(B, T, P).astype(np.float32) * 0.2)
        lengths = jnp.asarray(
            np.clip(rng.randint(T // 2, T + 1, size=B), 1, T).astype(
                np.int32))
        if b_tile or chunk_arg:
            # direct engine call with explicit b_tile/chunk: the fused
            # fwd+bwd primal (gamma_tm materialized by the kernels
            # regardless) — the same kernels the grad path runs
            rec["b_tile"] = b_tile or 128
            rec["chunk"] = chunk_arg or chunk
            rec["fits_stream"] = pallas_stream.fits_stream(
                fa, b_tile or 128, chunk_tiles=chunk_arg or 8)
            print(f"#   fits_stream={rec['fits_stream']} "
                  f"(False would fall back to XLA)", file=sys.stderr)
            from pychain_tpu.ops.pallas_stream import \
                forward_backward_prob_stream as fbs

            def _f(xx):
                res = fbs(jnp.exp(xx), lengths, fa, 1e-5,
                          b_tile=b_tile or 128,
                          chunk_tiles=chunk_arg or None, debug=False)
                return res.objf.sum() + res.gamma_tm[0].sum()
            vg = jax.jit(lambda xx: (_f(xx), xx[:1, :1, :1]))
        else:
            vg = jax.jit(jax.value_and_grad(
                lambda xx: chain_function(xx, lengths, g)))
        try:
            t0 = time.time()
            loss, grad = vg(x)
            _ = float(loss) + float(grad[0, 0, 0])
            rec["compile_s"] = round(time.time() - t0, 1)
            t0 = time.time()
            for _ in range(iters):
                l, gr = vg(x)
            _ = float(l) + float(gr[0, 0, 0])
            dt = (time.time() - t0) / iters
            rec["ms_batch"] = round(dt * 1e3, 1)
            rec["utts_s"] = round(B / dt, 1)
            rec["objf"] = float(loss)
            print(f"#   {engine}: {rec['ms_batch']} ms/batch "
                  f"= {rec['utts_s']} utts/s "
                  f"(compile {rec['compile_s']}s)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — record and continue
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
            print(f"#   {engine}: FAILED {rec['error']}",
                  file=sys.stderr)
        results.append(rec)

    out = _arg("--out", "/tmp/stream_cliff.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Per-kernel diagnosis of the stream collapse: time the fwd and bwd
stream sweeps SEPARATELY across the cliff (s_pad 8320 fast -> 8576
slow), so the serializing kernel is identified before any rewrite.

Usage: python tools/stream_diag.py [--spads 8320,8576] [--b 128]
                                   [--t 500] [--chunk 0=auto]
Writes /tmp/stream_diag.json.
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
    spads = [int(s) for s in _arg("--spads", "8320,8576").split(",")]
    B = int(_arg("--b", 128))
    T = int(_arg("--t", 500))
    chunk_arg = int(_arg("--chunk", 0))
    iters = int(_arg("--iters", 6))

    import jax
    import jax.numpy as jnp
    from pychain_tpu import ChainGraph, ChainGraphBatch
    from pychain_tpu.ops import pallas_stream as ps
    from pychain_tpu.ops.factorized import px_time_major
    from pychain_tpu.ops.pallas_fact import BF, _length_masks
    from pychain_tpu.utils.testgraphs import denominator_fst

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(0)
    results = []
    for s_target in spads:
        den_fst, P = denominator_fst(num_phones=s_target // 2,
                                     states_per_phone=2, seed=0,
                                     bigram_fanout=30)
        den = ChainGraph(den_fst, log_domain=False)
        fa = ChainGraphBatch(den, B, tile_dtype="bfloat16")._fact
        chunk = chunk_arg or ps.auto_chunk_tiles(fa)
        rec = dict(s_pad=fa.s_pad, chunk=chunk,
                   tiles=int(fa.w1.tiles.shape[0]))
        print(f"# s_pad={fa.s_pad} chunk={chunk}", file=sys.stderr)

        x = jnp.asarray(rng.randn(B, T, P).astype(np.float32) * 0.2)
        lengths = jnp.full((B,), T, jnp.int32)
        mm = jnp.dtype(fa.w1.tiles.dtype)
        sd = BF
        px = jnp.exp(x)
        masks = _length_masks(lengths, T)
        s_pad = fa.s_pad

        def fwd_only(pxv):
            px_tm = px_time_major(pxv, fa, dtype=sd)
            out = ps._fwd_stream(fa, px_tm, masks, 1e-5, 128, mm, sd,
                                 chunk)
            # touch every output stream without re-reading them fully
            return sum(o[0].astype(jnp.float32).sum() for o in out[:5])

        dummy_ys = jnp.zeros((T, s_pad, B), sd)
        s_all = jnp.ones((T + 1, B), jnp.float32)
        tot = jnp.ones((B,), jnp.float32)

        def bwd_only(ad_ys):
            out = ps._bwd_stream(fa, ad_ys, dummy_ys, dummy_ys, None,
                                 s_all, masks, tot, 1e-5, 128, mm, sd,
                                 chunk, debug=False)
            return sum(o[0].astype(jnp.float32).sum() for o in out)

        for name, fn, arg in (("fwd", fwd_only, px),
                              ("bwd", bwd_only, dummy_ys)):
            try:
                f = jax.jit(fn)
                t0 = time.time()
                f(arg).block_until_ready()
                rec[f"{name}_compile_s"] = round(time.time() - t0, 1)
                t0 = time.time()
                for _ in range(iters):
                    r = f(arg)
                r.block_until_ready()
                dt = (time.time() - t0) / iters
                rec[f"{name}_ms"] = round(dt * 1e3, 1)
                print(f"#   {name}: {rec[f'{name}_ms']} ms "
                      f"(compile {rec[f'{name}_compile_s']}s)",
                      file=sys.stderr)
            except Exception as e:  # noqa: BLE001
                rec[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:200]}"
                print(f"#   {name}: FAILED {rec[f'{name}_error']}",
                      file=sys.stderr)
        results.append(rec)

    out = _arg("--out", "/tmp/stream_diag.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())

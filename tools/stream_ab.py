"""On-chip A/B: weight-streaming Pallas engine vs the XLA factorized
fallback on a beyond-VMEM denominator (the bench --s8k configuration).

Usage: python tools/stream_ab.py [--iters N] [--chunk C|auto]
                                 [--b B] [--t T] [--phones NP]
Prints per-engine ms/batch and utts/s plus an objf cross-check.
``--chunk auto`` (the default) exercises auto_chunk_tiles; an explicit
C pins the chunk for manual-vs-auto A/Bs (VERDICT r3 weak #4).
"""

import sys
import time
import dataclasses

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    iters = int(_arg("--iters", 20))
    chunk = _arg("--chunk", "auto")
    B = int(_arg("--b", 64))
    T = int(_arg("--t", 300))
    phones = int(_arg("--phones", 4000))

    from pychain_tpu import ChainGraph, ChainGraphBatch
    from pychain_tpu.loss import chain_function, dispatch_arrays
    from pychain_tpu.utils.testgraphs import denominator_fst

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    rng = np.random.RandomState(0)
    t0 = time.time()
    den_fst, P = denominator_fst(num_phones=phones, states_per_phone=2,
                                 seed=0, bigram_fanout=30)
    den = ChainGraph(den_fst, log_domain=False)
    batch = ChainGraphBatch(den, B, tile_dtype="bfloat16")
    fa = batch._fact
    print(f"# graph S={den_fst.num_states} K={den_fst.num_arcs} "
          f"s_pad={fa.s_pad} w1_tiles={fa.w1.tiles.shape[0]} "
          f"built in {time.time()-t0:.1f}s", file=sys.stderr)

    g = dispatch_arrays(batch, "pallas")
    print(f"# dispatch impl=pallas -> engine={g.engine}", file=sys.stderr)

    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32) * 0.2)
    lengths = jnp.asarray(
        np.clip(rng.randint(T // 2, T + 1, size=B), 1, T).astype(np.int32))

    results = {}
    from pychain_tpu.ops import pallas_stream
    if chunk == "auto":
        chunk = pallas_stream.auto_chunk_tiles(fa)
        print(f"# auto_chunk_tiles -> {chunk}", file=sys.stderr)
    else:
        chunk = int(chunk)
        pallas_stream.auto_chunk_tiles = lambda fa_, b_tile=128: chunk
    engines = (("stream",) if "--skip-xla" in sys.argv
               else ("stream", "xla"))
    for engine in engines:
        ge = dataclasses.replace(fa, engine=engine)
        vg = jax.jit(jax.value_and_grad(
            lambda a: chain_function(a, lengths, ge)))
        t0 = time.time()
        v, gr = vg(x)
        v.block_until_ready()
        print(f"# [{engine}] compile+first {time.time()-t0:.1f}s "
              f"objf={float(v):.6f}", file=sys.stderr)
        # amortized async timing
        t0 = time.time()
        for _ in range(iters):
            v, gr = vg(x)
        v.block_until_ready()
        gr.block_until_ready()
        dt = (time.time() - t0) / iters
        results[engine] = (dt, float(v))
        print(f"# [{engine}] {dt*1e3:.1f} ms/batch  "
              f"{B/dt:.1f} utts/s", file=sys.stderr)

    if "xla" in results:
        rel = abs(results["stream"][1] - results["xla"][1]) / abs(
            results["xla"][1])
        speedup = results["xla"][0] / results["stream"][0]
        print(f"stream {results['stream'][0]*1e3:.1f} ms "
              f"({B/results['stream'][0]:.0f} utts/s)  "
              f"xla {results['xla'][0]*1e3:.1f} ms "
              f"({B/results['xla'][0]:.0f} utts/s)  "
              f"speedup {speedup:.2f}x  objf rel diff {rel:.2e}")
    else:
        print(f"stream chunk={chunk} {results['stream'][0]*1e3:.1f} ms "
              f"({B/results['stream'][0]:.0f} utts/s) "
              f"objf={results['stream'][1]:.6f}")


def _arg(name, default):
    if name in sys.argv:
        return sys.argv[sys.argv.index(name) + 1]
    return default


if __name__ == "__main__":
    main()

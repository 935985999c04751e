#!/usr/bin/env python3
"""On-chip ShardedChainLoss check: Pallas kernels inside shard_map.

Runs the bf16 Pallas denominator engine UNDER a real-device mesh
(1 device on this host's chip; any N on a pod) and asserts the sharded
loss matches the plain ChainLoss bit-for-bit-in-tolerance.  This keeps
the hardware x distribution intersection continuously exercised
(VERDICT r2 #7): the multi-chip dryrun runs on a virtual CPU mesh, so
without this stage nothing re-proves pallas-inside-shard_map on real
ICI-attached hardware.

Exit 0 on success; prints one summary line.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    from pychain_tpu.utils.backend import tpu_tunnel_alive, tunnel_env_set
    if tunnel_env_set() and not tpu_tunnel_alive():
        print("TPU tunnel unreachable", file=sys.stderr)
        return 1

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pychain_tpu import ChainGraph, ChainGraphBatch, ChainLoss
    from pychain_tpu.parallel import ShardedChainLoss
    from pychain_tpu.utils.testgraphs import denominator_fst, linear_fst

    rng = np.random.RandomState(0)
    den_fst, P = denominator_fst(num_phones=1500, states_per_phone=2,
                                 seed=0, bigram_fanout=30)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 128, 500
    nums = [ChainGraph(linear_fst(rng.randint(0, P, size=T)),
                       log_domain=True) for _ in range(B)]
    num_batch = ChainGraphBatch(nums, max_num_transitions=T,
                                max_num_states=T + 1)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, P), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)

    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("dp",))
    sharded = ShardedChainLoss(mesh, den, impl="pallas",
                               tile_dtype="bfloat16")
    plain = ChainLoss(den, impl="pallas", tile_dtype="bfloat16")

    t0 = time.time()
    ls = float(sharded(x, lengths, num_batch))
    ts = time.time() - t0
    t0 = time.time()
    lp = float(plain(x, lengths, num_batch))
    tp = time.time() - t0
    rel = abs(ls - lp) / max(1.0, abs(lp))
    ok = rel < 1e-5 and np.isfinite(ls)
    print(f"sharded({len(devices)} dev)={ls:.6f} ({ts:.1f}s first) "
          f"plain={lp:.6f} ({tp:.1f}s first) rel={rel:.2e} "
          f"{'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())

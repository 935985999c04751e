#!/usr/bin/env python3
"""Measure the reference CPU engine on the headline benchmark config and
record it in BASELINE_MEASURED.json.

Headline config (BASELINE.json): denominator-graph forward-backward,
B=128, T=500, trigram-phone-LM-like graph with ~3k states.  The repo
publishes no numbers (BASELINE.md), so the baseline is measured here:
the reference's own CPU path (exact; its GPU path adds randomised
pruning noise), built by tools/build_reference_baseline.py.
"""

import json
import os
import sys
import time

import numpy as np
import torch

sys.path.insert(0, "/tmp/refbuild")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pychain_C  # noqa: E402

from pychain_tpu import ChainGraph, ChainGraphBatch  # noqa: E402
from pychain_tpu.utils.testgraphs import denominator_fst  # noqa: E402

B, T = 128, 500
NUM_PHONES, FANOUT = 1500, 30  # S=3000, K~=49.5k, P=3000


def main():
    rng = np.random.RandomState(0)
    den_fst, P = denominator_fst(num_phones=NUM_PHONES, states_per_phone=2,
                                 seed=0, bigram_fanout=FANOUT)
    den = ChainGraph(den_fst, log_domain=False)
    S, K = den.num_states, den.num_transitions
    print(f"graph: S={S} K={K} P={P}")

    batch = ChainGraphBatch(den, B)
    t = lambda a, dt: torch.from_numpy(np.ascontiguousarray(a)).to(dt)
    fwd_t = t(np.asarray(batch.forward_transitions), torch.int32)
    fwd_i = t(np.asarray(batch.forward_transition_indices), torch.int32)
    fwd_p = t(np.asarray(batch.forward_transition_probs), torch.float32)
    bwd_t = t(np.asarray(batch.backward_transitions), torch.int32)
    bwd_i = t(np.asarray(batch.backward_transition_indices), torch.int32)
    bwd_p = t(np.asarray(batch.backward_transition_probs), torch.float32)
    leaky = t(np.asarray(batch.leaky_probs), torch.float32)
    init = t(np.asarray(batch.initial_probs), torch.float32)
    final = t(np.asarray(batch.final_probs), torch.float32)
    start = t(np.asarray(batch.start_state), torch.long)

    x = torch.from_numpy(
        rng.randn(B, T, P).astype(np.float32)).clamp(-30, 30)
    exp_x = x.exp()
    lengths = torch.full((B,), T, dtype=torch.long)
    batch_sizes = torch.full((T,), B, dtype=torch.long)

    iters = 3
    times = []
    objf = None
    for i in range(iters):
        t0 = time.time()
        objf, grad, ok = pychain_C.forward_backward(
            fwd_t, fwd_i, fwd_p, bwd_t, bwd_i, bwd_p,
            leaky, init, final, start, exp_x, batch_sizes, lengths,
            S, 1e-5)
        dt = time.time() - t0
        times.append(dt)
        print(f"iter {i}: {dt:.2f}s  objf={float(objf):.4f} ok={bool(ok)}")
    best = min(times)
    result = {
        "metric": "utts/sec, den-graph fwd-bwd B=128 T=500",
        "config": {"B": B, "T": T, "S": S, "K": K, "P": P},
        "reference_cpu": {
            "seconds_per_batch": best,
            "utts_per_sec": B / best,
            "threads": torch.get_num_threads(),
            "objf": float(objf),
            "note": ("reference CPU path (exact), built from "
                     "/root/reference/pytorch_binding via "
                     "tools/build_reference_baseline.py; V100 hardware "
                     "is unavailable in this environment"),
        },
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()

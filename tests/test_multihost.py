"""Multi-host (DCN) data parallelism, simulated with 2 CPU processes.

Spawns two real OS processes connected by jax.distributed; together
they form a 4-device ('dp',) mesh (2 CPU devices each).  Each process
feeds only its local half of the global batch; the test asserts the
distributed loss equals the single-process ChainLoss on the full
batch, and that sharded orbax checkpoints round-trip.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pychain_tpu import ChainGraph, ChainGraphBatch, ChainLoss
from pychain_tpu.utils.testgraphs import denominator_fst, linear_fst


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference() -> float:
    """Same deterministic problem as tests/_multihost_worker.py."""
    rng = np.random.RandomState(0)
    B, T = 4, 10
    den_fst, P = denominator_fst(num_phones=8, states_per_phone=2, seed=0)
    den = ChainGraph(den_fst)
    pdf_seqs = [rng.randint(0, P, size=T) for _ in range(B)]
    x = rng.randn(B, T, P).astype(np.float32)
    lengths = np.full((B,), T, np.int32)
    nums = [ChainGraph(linear_fst(s), log_domain=True) for s in pdf_seqs]
    num_b = ChainGraphBatch(nums, max_num_transitions=T,
                            max_num_states=T + 1)
    return float(ChainLoss(den)(jnp.asarray(x), lengths, num_b))


def test_two_process_dp_matches_single_process(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    ckpt_dir = str(tmp_path / "ckpt")

    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, "2", str(pid), ckpt_dir],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env) for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=480)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{err[-3000:]}"
        assert "CKPT-OK" in out

    losses = []
    for _, out, _ in outs:
        for line in out.splitlines():
            if line.startswith("LOSS "):
                losses.append(float(line.split()[1]))
    assert len(losses) == 2
    # both processes see the identical fully-reduced global loss
    assert abs(losses[0] - losses[1]) < 1e-7

    ref = _single_process_reference()
    assert abs(losses[0] - ref) < 1e-5 * max(1.0, abs(ref)), (losses, ref)

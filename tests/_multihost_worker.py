"""Worker process for the multi-host data-parallel test.

Run as: python _multihost_worker.py <coordinator> <num_procs> <pid>
Prints "LOSS <value>" and "CKPT-OK" on success.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

coordinator, num_procs, pid = (sys.argv[1], int(sys.argv[2]),
                               int(sys.argv[3]))
ckpt_dir = sys.argv[4]

from pychain_tpu.parallel import (initialize, global_dp_mesh,  # noqa: E402
                                  host_local_batch_to_global,
                                  restore_sharded, save_sharded,
                                  ShardedChainLoss)

initialize(coordinator, num_procs, pid, local_device_count=2)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pychain_tpu import ChainGraph, ChainGraphBatch  # noqa: E402
from pychain_tpu.loss import dispatch_arrays  # noqa: E402
from pychain_tpu.utils.testgraphs import (denominator_fst,  # noqa: E402
                                          linear_fst)

assert jax.process_count() == num_procs
mesh = global_dp_mesh()
n_dev = len(jax.devices())

# deterministic global problem, identical on every process
rng = np.random.RandomState(0)
B, T = 4, 10
den_fst, P = denominator_fst(num_phones=8, states_per_phone=2, seed=0)
den = ChainGraph(den_fst)
pdf_seqs = [rng.randint(0, P, size=T) for _ in range(B)]
x_global = rng.randn(B, T, P).astype(np.float32)
lengths_global = np.full((B,), T, np.int32)

# this process owns rows [pid*B/np, (pid+1)*B/np)
lo, hi = pid * B // num_procs, (pid + 1) * B // num_procs
local_nums = [ChainGraph(linear_fst(pdf_seqs[i]), log_domain=True)
              for i in range(lo, hi)]
# padding shapes must be agreed globally (here: T arcs / T+1 states)
num_local = dispatch_arrays(ChainGraphBatch(
    local_nums, max_num_transitions=T, max_num_states=T + 1), "auto")

x_g = host_local_batch_to_global(mesh, x_global[lo:hi])
len_g = host_local_batch_to_global(mesh, lengths_global[lo:hi])
num_g = host_local_batch_to_global(mesh, num_local)

loss_mod = ShardedChainLoss(mesh, den)
loss = loss_mod(x_g, len_g, num_g)
print(f"LOSS {float(loss):.8f}", flush=True)

# sharded checkpoint round-trip of a dp-sharded pytree
state = {"x": x_g, "step_scale": jnp.float32(3.0)}
save_sharded(ckpt_dir, 7, state)
step, restored = restore_sharded(ckpt_dir, state)
assert step == 7
for s in restored["x"].addressable_shards:
    np.testing.assert_array_equal(
        np.asarray(s.data), x_global[s.index[0]])
assert float(restored["step_scale"]) == 3.0
print("CKPT-OK", flush=True)

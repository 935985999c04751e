"""Multi-host (DCN) data parallelism.

The reference is a single-device library (SURVEY.md §2); its multi-GPU
story was "use the host trainer".  Here multi-host is first-class, the
JAX way: ``jax.distributed.initialize`` connects the processes, the
mesh spans every chip in the job (``('dp_host', 'dp')`` — hosts on the
outer axis so the batch all-reduce rides DCN once while per-chip
traffic stays on ICI), and each host feeds only its local shard of the
global batch via ``jax.make_array_from_process_local_data``.

The loss itself needs NO changes: :class:`ShardedChainLoss` already
runs shard-local engines inside one ``shard_map`` with a psum — on a
multi-host mesh the same psum spans DCN.  What this module adds is the
process bootstrap, global-batch assembly, and a flat ``dp`` view over
all chips of all hosts.

Sharded checkpointing: ``save_sharded`` / ``restore_sharded`` write a
globally-sharded train state with orbax (each process writes only its
address-local shards; restore reassembles to any target sharding).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str, num_processes: int,
               process_id: int,
               local_device_count: Optional[int] = None) -> None:
    """Connect this process to the JAX distributed job.

    Call ONCE per process, before any other jax API touches a device.
    ``local_device_count`` forces the per-process CPU device count
    (useful for tests and CPU-based multi-host simulation; on real TPU
    hosts leave it None and the runtime discovers local chips).
    """
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_dp_mesh() -> Mesh:
    """A 1-D ``('dp',)`` mesh over every device of every process.

    A flat dp axis is what the chain loss wants (the only collective is
    a scalar psum, so host/chip hierarchy buys nothing); devices are
    ordered process-major, which keeps each host's batch rows on its
    own chips — the data path stays host-local, only the psum crosses
    DCN.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), axis_names=("dp",))


def host_local_batch_to_global(mesh: Mesh, tree: Any) -> Any:
    """Assemble per-process local batch shards into global arrays.

    Every process passes its own rows (global_batch / num_processes of
    them); the result is one global array sharded over ``dp`` whose
    row order follows process index.
    """
    sharding = NamedSharding(mesh, P("dp"))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, tree)


def replicate_to_global(mesh: Mesh, tree: Any) -> Any:
    """Replicate identical per-process data (e.g. the denominator
    graph) onto every device of the mesh."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree.map(put, tree)


# ----------------------------------------------------------------------
# Sharded checkpointing
# ----------------------------------------------------------------------

def _ensure_global(x):
    """Orbax cannot serialize host-local arrays in a multi-process job;
    replicate such leaves (scalars, hyperparams, step counters) onto
    the global device set first.  ShapeDtypeStruct templates (the
    restore path's documented input) pass through: they already carry
    their target sharding and hold no data to replicate."""
    if isinstance(x, jax.ShapeDtypeStruct):
        return x
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return x  # already a global array
    x = np.asarray(x)
    mesh = global_dp_mesh()
    return jax.make_array_from_callback(
        x.shape, NamedSharding(mesh, P()), lambda idx: x[idx])


def save_sharded(path: str, step: int, state: Any) -> None:
    """Save a (possibly globally-sharded) pytree; every process must
    call this collectively.  Each process writes only the shards it
    owns."""
    import os
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        state = jax.tree.map(_ensure_global, state)
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(path, f"step_{step}"), state, force=True)
    ckpt.wait_until_finished()
    if jax.process_index() == 0:
        with open(os.path.join(path, "LATEST"), "w") as f:
            f.write(str(step))
    # all processes must see the finished checkpoint before proceeding
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("pychain_ckpt_save")


def restore_sharded(path: str, template: Any,
                    step: Optional[int] = None) -> tuple[int, Any]:
    """Restore into ``template``'s shardings (pytree of global arrays
    or jax.ShapeDtypeStruct with sharding); collective."""
    import os
    import orbax.checkpoint as ocp
    from ..utils.checkpoint import latest_step

    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
    ckpt = ocp.StandardCheckpointer()
    if jax.process_count() > 1:
        template = jax.tree.map(_ensure_global, template)

    def as_restore_spec(x):
        if hasattr(x, "sharding"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return x

    state = ckpt.restore(
        os.path.join(os.path.abspath(path), f"step_{step}"),
        jax.tree.map(as_restore_spec, template))
    return step, state

"""Regressions for the package-wide review findings (round 2):
stale fast-path engines after reorder, lengths beyond the frame axis,
forced-engine dispatch, torch-free import, multihost template restore,
and the lazy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.loss import chain_function, dispatch_arrays
from pychain_tpu.utils.testgraphs import linear_fst, random_fst, sausage_fst


def _linear_batch(seqs, P):
    graphs = [ChainGraph(linear_fst(s), log_domain=True) for s in seqs]
    mk = max(g.num_transitions for g in graphs)
    ms = max(g.num_states for g in graphs)
    return ChainGraphBatch(graphs, max_num_transitions=mk,
                           max_num_states=ms)


def test_reorder_updates_fast_path_engines():
    """reorder() must permute the compiled linear/leveled/semiring
    pytrees too — a stale copy pairs graphs with the wrong sequences
    under impl='auto' (review finding)."""
    rng = np.random.RandomState(0)
    P, T = 5, 6
    seqs = [rng.randint(0, P, size=T) for _ in range(3)]
    x = jnp.asarray(rng.randn(3, T, P).astype(np.float32))
    lengths = np.full(3, T, np.int32)

    order = [2, 0, 1]
    batch = _linear_batch(seqs, P)
    batch.reorder(order)
    x_perm = x[np.asarray(order)]
    got = chain_function(x_perm, lengths, batch, impl="auto")

    expect_batch = _linear_batch([seqs[i] for i in order], P)
    expect = chain_function(x_perm, lengths, expect_batch, impl="auto")
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-5)
    # and the gather arrays agree with the fast path after reorder
    gat = chain_function(x_perm, lengths, batch, impl="gather")
    np.testing.assert_allclose(float(got), float(gat), rtol=1e-5)


def test_reorder_then_forced_engine():
    """reorder() must also permute the lazy-compile source list, or a
    forced impl='leveled'/'semiring' builds in pre-reorder order."""
    rng = np.random.RandomState(5)
    P, T = 5, 6
    seqs = [rng.randint(0, P, size=T) for _ in range(3)]
    x = jnp.asarray(rng.randn(3, T, P).astype(np.float32))
    lengths = np.full(3, T, np.int32)
    order = [2, 0, 1]
    batch = _linear_batch(seqs, P)
    batch.reorder(order)
    x_perm = x[np.asarray(order)]
    gather = chain_function(x_perm, lengths, batch, impl="gather")
    for impl in ("leveled", "semiring"):
        forced = chain_function(x_perm, lengths, batch, impl=impl)
        np.testing.assert_allclose(float(forced), float(gather),
                                   rtol=1e-4, err_msg=impl)


def test_lengths_beyond_frame_axis_rejected():
    rng = np.random.RandomState(1)
    P, T = 4, 5
    g = ChainGraph(random_fst(num_states=4, num_pdfs=P, seed=0),
                   log_domain=True)
    batch = ChainGraphBatch([g, g], max_num_transitions=g.num_transitions,
                            max_num_states=g.num_states)
    x = jnp.asarray(rng.randn(2, T, P).astype(np.float32))
    with pytest.raises(ValueError, match="exceed the padded frame"):
        chain_function(x, np.array([T, T + 3], np.int32), batch)


def test_forced_leveled_on_linear_batch():
    """Linear chains ARE time-synchronous: forcing impl='leveled' must
    compile the leveled engine lazily instead of raising."""
    rng = np.random.RandomState(2)
    P, T = 4, 6
    seqs = [rng.randint(0, P, size=T) for _ in range(2)]
    batch = _linear_batch(seqs, P)
    assert batch._linear is not None and batch._leveled is None
    x = jnp.asarray(rng.randn(2, T, P).astype(np.float32))
    lengths = np.full(2, T, np.int32)
    lev = chain_function(x, lengths, batch, impl="leveled")
    lin = chain_function(x, lengths, batch, impl="linear")
    np.testing.assert_allclose(float(lev), float(lin), rtol=1e-5)
    assert batch._leveled is not None  # cached for repeat dispatch


def test_forced_semiring_on_leveled_batch():
    rng = np.random.RandomState(3)
    P = 4
    graphs = [ChainGraph(sausage_fst([[0, 1], [2], [1, 3]], seed=s),
                         log_domain=True) for s in range(2)]
    mk = max(g.num_transitions for g in graphs)
    ms = max(g.num_states for g in graphs)
    batch = ChainGraphBatch(graphs, max_num_transitions=mk,
                            max_num_states=ms)
    assert batch._leveled is not None and batch._semiring is None
    T = 3
    x = jnp.asarray(rng.randn(2, T, P).astype(np.float32))
    lengths = np.full(2, T, np.int32)
    sem = chain_function(x, lengths, batch, impl="semiring")
    lev = chain_function(x, lengths, batch, impl="leveled")
    np.testing.assert_allclose(float(sem), float(lev), rtol=1e-4)


def test_multihost_restore_accepts_shapedtypestruct():
    from pychain_tpu.parallel.multihost import _ensure_global
    sds = jax.ShapeDtypeStruct((3, 2), jnp.float32)
    assert _ensure_global(sds) is sds


def test_oracle_is_lazy():
    import subprocess
    import sys
    code = (
        "import builtins\n"
        "real = builtins.__import__\n"
        "def guard(name, *a, **k):\n"
        "    if name == 'torch' or name.startswith('torch.'):\n"
        "        raise ModuleNotFoundError('torch blocked')\n"
        "    return real(name, *a, **k)\n"
        "builtins.__import__ = guard\n"
        "import pychain_tpu\n"
        "import pychain_tpu.utils\n"
        "print('NO-TORCH-IMPORT-OK')\n")
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": "/root/repo"}
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=300,
                          env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "NO-TORCH-IMPORT-OK" in proc.stdout

"""Data-parallel (shard_map) path vs single-device engines.

The distributed design (parallel/data_parallel.py): each device runs the
full single-device engine on its local batch shard inside one jitted
``shard_map``; only the scalar objective crosses the ICI (psum).  The
reference has no distributed layer at all (SURVEY.md §2) — these tests
pin down the new capability: loss/grad parity with the single-device
engines, fast-engine dispatch, and the jit-once contract.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pychain_tpu import ChainGraph, ChainGraphBatch, ChainLoss
from pychain_tpu.loss import chain_function, dispatch_arrays
from pychain_tpu.parallel import (ShardedChainLoss, make_mesh,
                                  pjit_chain_function)
from pychain_tpu.utils.testgraphs import denominator_fst, linear_fst

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup(B=8, T=10, seed=0):
    rng = np.random.RandomState(seed)
    den_fst, P = denominator_fst(num_phones=8, states_per_phone=2,
                                 seed=seed)
    den = ChainGraph(den_fst)
    nums = [ChainGraph(linear_fst(rng.randint(0, P, size=T)),
                       log_domain=True) for _ in range(B)]
    num_b = ChainGraphBatch(nums, max_num_transitions=T,
                            max_num_states=T + 1)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    return den, num_b, x, lengths


def test_sharded_loss_matches_single_device_factorized():
    den, num_b, x, lengths = _setup()
    mesh = make_mesh(n_mp=1)

    ref = float(ChainLoss(den)(x, lengths, num_b))
    sharded = ShardedChainLoss(mesh, den, impl="factorized")
    # the denominator must actually dispatch to the factorized engine
    from pychain_tpu.ops.factorized import FactorizedArrays
    assert isinstance(sharded.den_arrays(1), FactorizedArrays)

    got = float(sharded(x, lengths, num_b))
    assert abs(got - ref) < 1e-4 * max(1.0, abs(ref)), (got, ref)


def test_sharded_loss_grad_matches_single_device():
    den, num_b, x, lengths = _setup(seed=1)
    mesh = make_mesh(n_mp=1)
    sharded = ShardedChainLoss(mesh, den, impl="factorized")
    loss_mod = ChainLoss(den)

    g_ref = jax.grad(lambda xx: loss_mod(xx, lengths, num_b))(x)
    g_dp = jax.grad(lambda xx: sharded(xx, lengths, num_b))(x)
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_sharded_loss_jits_once():
    """Repeated steps with identical bucket shapes must not retrace."""
    den, num_b, x, lengths = _setup(seed=2)
    mesh = make_mesh(n_mp=1)
    sharded = ShardedChainLoss(mesh, den)

    v1 = float(sharded(x, lengths, num_b))
    assert len(sharded._fn_cache) == 1
    fn = next(iter(sharded._fn_cache.values()))
    traces0 = fn._cache_size()
    v2 = float(sharded(x * 1.01, lengths, num_b))
    assert len(sharded._fn_cache) == 1
    assert fn._cache_size() == traces0 == 1
    assert v1 != v2  # values flow, no stale caching


def test_sharded_loss_rejects_indivisible_batch():
    den, num_b, x, lengths = _setup()
    mesh = make_mesh(n_mp=1)
    sharded = ShardedChainLoss(mesh, den)
    with pytest.raises(ValueError, match="divisible"):
        sharded(x[:6], lengths[:6], num_b)


def test_pjit_chain_function_fast_engine():
    den, _, x, lengths = _setup(seed=3)
    mesh = make_mesh(n_mp=1)
    batch = ChainGraphBatch(den, 1)  # shared: per-device B is free
    ref = float(chain_function(x, lengths,
                               dispatch_arrays(batch, "factorized")))
    fn = pjit_chain_function(mesh, batch, impl="factorized")
    got = float(fn(x, lengths))
    assert abs(got - ref) < 1e-4 * max(1.0, abs(ref)), (got, ref)


def test_sharded_loss_unequal_lengths():
    """avg divides by the global length sum, psum'd over shards."""
    den, _, x, _ = _setup(seed=4)
    B, T, P = x.shape
    rng = np.random.RandomState(4)
    lengths = jnp.asarray(np.array([10, 9, 8, 7, 10, 9, 8, 7], np.int32))
    nums = [ChainGraph(linear_fst(rng.randint(0, P, size=int(l))),
                       log_domain=True) for l in lengths]
    num_b = ChainGraphBatch(nums, max_num_transitions=T,
                            max_num_states=T + 1)
    mesh = make_mesh(n_mp=1)
    ref = float(ChainLoss(den)(x, lengths, num_b))
    got = float(ShardedChainLoss(mesh, den)(x, lengths, num_b))
    assert abs(got - ref) < 1e-4 * max(1.0, abs(ref)), (got, ref)


def test_sharded_loss_bf16_pallas_fast_mode():
    """tile_dtype flows into the sharded denominator cache and the
    pallas fast mode matches the f32 reference within the bf16 budget."""
    den, num_b, x, lengths = _setup(seed=2)
    mesh = make_mesh(n_mp=1)
    ref = float(ChainLoss(den)(x, lengths, num_b))
    sharded = ShardedChainLoss(mesh, den, impl="pallas",
                               tile_dtype="bfloat16")
    arrs = sharded.den_arrays(1)
    from pychain_tpu.ops.factorized import FactorizedArrays
    assert isinstance(arrs, FactorizedArrays)
    assert str(arrs.w1.tiles.dtype) == "bfloat16"
    got = float(sharded(x, lengths, num_b))
    assert abs(got - ref) < 2e-2 * max(1.0, abs(ref)), (got, ref)


def test_pjit_chain_function_linear_numerators():
    """Per-sequence engine arrays without a ``shared`` attribute
    (LinearArrays etc.) must shard over dp, not replicate (regression:
    they were treated as shared and broke shard_map broadcasting)."""
    den, num_b, x, lengths = _setup(seed=5)
    from pychain_tpu.ops.linear import LinearArrays
    assert isinstance(dispatch_arrays(num_b, "auto"), LinearArrays)
    ref = float(chain_function(x, lengths, num_b))
    mesh = make_mesh(n_mp=1)
    fn = pjit_chain_function(mesh, num_b)
    got = float(fn(x, lengths))
    assert abs(got - ref) < 1e-4 * max(1.0, abs(ref)), (got, ref)


def test_sharded_loss_shared_numerator_batch():
    """A SHARED numerator batch (broadcast log-domain graph) must be
    replicated across shards, not dp-sharded along its unbatched arc
    axes (regression: the num spec was a fixed P('dp'))."""
    rng = np.random.RandomState(6)
    den_fst, P = denominator_fst(num_phones=8, states_per_phone=2, seed=6)
    den = ChainGraph(den_fst)
    B, T = 8, 10
    # one shared cyclic log-domain "numerator" broadcast across the batch
    num_g = ChainGraph(den_fst, log_domain=True, initial_mode="fst")
    num_b = ChainGraphBatch(num_g, B)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = jnp.full((B,), T, jnp.int32)
    ref = float(ChainLoss(den)(x, lengths, num_b))
    mesh = make_mesh(n_mp=1)
    got = float(ShardedChainLoss(mesh, den)(x, lengths, num_b))
    assert abs(got - ref) < 1e-4 * max(1.0, abs(ref)), (got, ref)


def test_sharded_xent_matches_single_device():
    """xent+l2 regularized sharded loss == chain_loss_xent on one
    device, value and gradients (both heads)."""
    from pychain_tpu import chain_loss_xent
    den, num_b, x, lengths = _setup(seed=7)
    rng = np.random.RandomState(8)
    xent_out = jnp.asarray(rng.randn(*x.shape).astype(np.float32))
    mesh = make_mesh(n_mp=1)
    sharded = ShardedChainLoss(mesh, den, impl="factorized",
                               xent_regularize=0.1, l2_regularize=1e-3)

    ref, _ = chain_loss_xent(x, xent_out, lengths, num_b,
                             ChainGraphBatch(den, x.shape[0]),
                             xent_regularize=0.1, l2_regularize=1e-3)
    got = sharded(x, lengths, num_b, xent_out)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-4)

    g_ref = jax.grad(lambda xx, xo: chain_loss_xent(
        xx, xo, lengths, num_b, ChainGraphBatch(den, x.shape[0]),
        xent_regularize=0.1, l2_regularize=1e-3)[0],
        argnums=(0, 1))(x, xent_out)
    g_dp = jax.grad(lambda xx, xo: sharded(xx, lengths, num_b, xo),
                    argnums=(0, 1))(x, xent_out)
    for a, b in zip(g_dp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_sharded_xent_argument_contract():
    den, num_b, x, lengths = _setup(seed=9)
    mesh = make_mesh(n_mp=1)
    plain = ShardedChainLoss(mesh, den, impl="factorized")
    with pytest.raises(ValueError, match="xent_out"):
        plain(x, lengths, num_b, xent_out=x)
    reg = ShardedChainLoss(mesh, den, impl="factorized",
                           xent_regularize=0.1)
    with pytest.raises(ValueError, match="xent_out"):
        reg(x, lengths, num_b)


def test_sharded_loss_constrained_numerators():
    """Tolerance-constrained supervision (leveled engine, batch-leading
    pytree) shards over dp and matches the single-device loss."""
    from pychain_tpu.graphs.builder import (ChainTopology,
                                            make_constrained_numerator)
    rng = np.random.RandomState(11)
    den_fst, P_den = denominator_fst(num_phones=8, states_per_phone=2,
                                     seed=11)
    den = ChainGraph(den_fst)
    topo = ChainTopology(num_phones=P_den // 2)
    B = 8
    graphs, lengths = [], []
    for _ in range(B):
        phones = [int(p) for p in rng.randint(0, topo.num_phones, size=3)]
        durs = [int(d) for d in rng.randint(2, 5, size=3)]
        graphs.append(ChainGraph(
            make_constrained_numerator(phones, durs, topo, tolerance=1),
            log_domain=True))
        lengths.append(sum(durs))
    lengths = jnp.asarray(np.array(lengths, np.int32))
    T = int(lengths.max())
    mk = max(g.num_transitions for g in graphs)
    ms = max(g.num_states for g in graphs)
    num_b = ChainGraphBatch(graphs, max_num_transitions=mk,
                            max_num_states=ms)
    assert num_b._leveled is not None
    x = jnp.asarray(rng.randn(B, T, P_den).astype(np.float32))

    mesh = make_mesh(n_mp=1)
    sharded = ShardedChainLoss(mesh, den, impl="factorized")
    ref = float(ChainLoss(den)(x, lengths, num_b))
    got = float(sharded(x, lengths, num_b))
    assert abs(got - ref) < 1e-4 * max(1.0, abs(ref)), (got, ref)

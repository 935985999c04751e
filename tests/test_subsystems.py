"""Bucketing, diagnostics, checkpointing, model, and data-parallel tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pychain_tpu import (ChainGraph, ChainGraphBatch, chain_function,
                         chain_function_with_aux, check_result,
                         set_verbose_level)
from pychain_tpu.data import BucketSpec, LengthBucketer, pad_to_bucket
from pychain_tpu.loss import dispatch_arrays
from pychain_tpu.models import TDNN, TDNNConfig
from pychain_tpu.utils.testgraphs import denominator_fst, linear_fst


def test_bucket_spec():
    spec = BucketSpec.geometric(min_t=100, max_t=1000, growth=1.5)
    assert spec.lengths[0] == 100 and spec.lengths[-1] == 1000
    assert spec.bucket_for(1) == 100
    assert spec.bucket_for(101) > 100
    assert spec.bucket_for(99999) == 1000


def test_linear_ladder_covers_max_t():
    # step not dividing max_t: the top bucket must still cover max_t,
    # otherwise pad_to_bucket raises for the longest utterances
    spec = BucketSpec.linear(step=25, max_t=90)
    assert spec.lengths[-1] == 90
    assert spec.bucket_for(82) == 90
    feats = [np.ones((82, 4))]
    out, lens = pad_to_bucket(feats, np.array([0]), t_pad=spec.bucket_for(82))
    assert out.shape == (1, 90, 4)


def test_bucketer_groups_by_length():
    lengths = np.array([10, 500, 13, 480, 15, 470, 11, 490])
    b = LengthBucketer(BucketSpec.linear(step=50, max_t=500), shuffle=False)
    groups = list(b.batches(lengths, batch_size=4))
    assert len(groups) == 2
    for g in groups:
        ls = lengths[g]
        assert ls.max() - ls.min() < 50  # short and long not mixed


def test_pad_to_bucket():
    feats = [np.ones((5, 3)), np.ones((9, 3))]
    out, lens = pad_to_bucket(feats, np.array([0, 1]), t_pad=10)
    assert out.shape == (2, 10, 3)
    assert list(lens) == [5, 9]
    assert out[0, 5:].sum() == 0


def test_diagnostics_report(capsys):
    rng = np.random.RandomState(0)
    P = 5
    den = ChainGraph(denominator_fst(num_phones=6, states_per_phone=2,
                                     seed=0)[0])
    P = 12
    B, T = 2, 6
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = np.array([6, 4], np.int32)
    _, aux = chain_function_with_aux(x, lengths, ChainGraphBatch(den, B))
    set_verbose_level(2)
    rep = check_result(aux, lengths)
    set_verbose_level(0)
    assert rep.all_ok
    assert rep.max_alpha_beta_err < 1e-3
    assert rep.max_gamma_sum_err < 1e-3
    assert rep.bad_sequences.size == 0


def test_checkpoint_roundtrip(tmp_path):
    from pychain_tpu.utils.checkpoint import (latest_step,
                                              restore_checkpoint,
                                              save_checkpoint)
    state = {"w": jnp.arange(6.0).reshape(2, 3), "n": jnp.asarray(3)}
    save_checkpoint(str(tmp_path), 7, state)
    assert latest_step(str(tmp_path)) == 7
    template = jax.tree.map(jnp.zeros_like, state)
    step, got = restore_checkpoint(str(tmp_path), template)
    assert step == 7
    np.testing.assert_allclose(np.asarray(got["w"]),
                               np.asarray(state["w"]))


def test_tdnn_shapes_and_grad():
    cfg = TDNNConfig(num_pdfs=16, hidden_dim=32, kernel_sizes=(3, 3),
                     dilations=(1, 2), strides=(1, 1), dropout=0.0)
    model = TDNN(cfg)
    x = jnp.ones((2, 12, 8))
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(params, x, train=False)
    assert out.shape == (2, 12, 16)
    g = jax.grad(lambda p: model.apply(p, x, train=False).sum())(params)
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(g))


def test_data_parallel_matches_single_device():
    """pjit over an 8-device dp mesh must reproduce single-device loss."""
    from jax.sharding import NamedSharding, PartitionSpec as Pn
    from pychain_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.RandomState(0)
    den_fst, P = denominator_fst(num_phones=8, states_per_phone=2, seed=0)
    den = ChainGraph(den_fst)
    B, T = 8, 10
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = jnp.array([10, 9, 8, 7, 10, 9, 8, 7], jnp.int32)
    g = dispatch_arrays(ChainGraphBatch(den, B))

    ref = float(chain_function(x, lengths, g))

    mesh = make_mesh(n_mp=1)
    dp = NamedSharding(mesh, Pn("dp"))
    xs = jax.device_put(x, dp)
    ls = jax.device_put(lengths, dp)
    gs = jax.device_put(g, NamedSharding(mesh, Pn()))
    with mesh:
        got = float(jax.jit(chain_function)(xs, ls, gs))
    assert abs(got - ref) < 1e-3 * max(1.0, abs(ref))

    # gradients shard with the batch and match
    grad_ref = jax.grad(lambda xx: chain_function(xx, lengths, g))(x)
    with mesh:
        grad_dp = jax.jit(jax.grad(
            lambda xx: chain_function(xx, ls, gs)))(xs)
    np.testing.assert_allclose(np.asarray(grad_dp), np.asarray(grad_ref),
                               rtol=1e-4, atol=1e-6)


def test_log_domain_numerator_batch_sharded():
    """Per-utterance numerator graphs shard over dp alongside the batch."""
    from jax.sharding import NamedSharding, PartitionSpec as Pn
    from pychain_tpu.loss import graph_arrays
    from pychain_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.RandomState(1)
    B, T, P = 8, 8, 6
    graphs = [ChainGraph(linear_fst(rng.randint(0, P, size=8)),
                         log_domain=True) for _ in range(B)]
    batch = ChainGraphBatch(graphs, max_num_transitions=8,
                            max_num_states=9)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    lengths = jnp.full((B,), 8, jnp.int32)
    g = graph_arrays(batch)
    ref = float(chain_function(x, lengths, g))
    mesh = make_mesh(n_mp=1)
    dp = NamedSharding(mesh, Pn("dp"))
    with mesh:
        got = float(jax.jit(chain_function)(
            jax.device_put(x, dp), jax.device_put(lengths, dp),
            jax.device_put(g, dp)))
    assert abs(got - ref) < 1e-3 * max(1.0, abs(ref))

def test_blstm_shapes_grad_and_chain_loss():
    from pychain_tpu.models import BLSTM, BLSTMConfig
    from pychain_tpu.utils.testgraphs import linear_fst

    cfg = BLSTMConfig(num_pdfs=12, hidden_dim=16, num_layers=2,
                      dropout=0.0)
    model = BLSTM(cfg)
    x = jnp.ones((2, 7, 5))
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(params, x, train=False)
    assert out.shape == (2, 7, 12)
    # end-to-end through the chain loss
    rng = np.random.RandomState(0)
    nums = [ChainGraph(linear_fst(rng.randint(0, 12, size=7)),
                       log_domain=True) for _ in range(2)]
    nb = ChainGraphBatch(nums, max_num_transitions=7, max_num_states=8)
    den = ChainGraph(denominator_fst(num_phones=6, states_per_phone=2,
                                     seed=0)[0])
    from pychain_tpu.loss import chain_loss
    db = ChainGraphBatch(den, 2)
    lengths = jnp.array([7, 7], jnp.int32)

    def loss_fn(p):
        return chain_loss(model.apply(p, x, train=False), lengths, nb, db)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(grads))


def test_tdnnf_shapes_grad_and_bypass():
    from pychain_tpu.models import TDNNF, TDNNFConfig

    cfg = TDNNFConfig(num_pdfs=16, hidden_dim=32, bottleneck_dim=8,
                      num_layers=3, dilations=(1, 3), dropout=0.0)
    model = TDNNF(cfg)
    x = jnp.ones((2, 12, 8))
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(params, x, train=False)
    assert out.shape == (2, 12, 16)
    g = jax.grad(lambda p: model.apply(p, x, train=False).sum())(params)
    assert all(np.isfinite(l).all() for l in jax.tree.leaves(g))


def test_tdnnf_semi_orthogonal_constraint_converges():
    """Repeated floating-case updates must drive every bottleneck
    factor M toward M M^T = sigma^2 I, and touch ONLY those kernels."""
    from pychain_tpu.models import (TDNNF, TDNNFConfig,
                                    constrain_semi_orthogonal,
                                    semi_orthogonal_deviation)

    cfg = TDNNFConfig(num_pdfs=10, hidden_dim=24, bottleneck_dim=6,
                      num_layers=2, dropout=0.0)
    model = TDNNF(cfg)
    x = jnp.ones((1, 8, 5))
    params = model.init(jax.random.PRNGKey(3), x, train=False)
    # perturb so the init is far from orthonormal
    params = jax.tree.map(lambda l: l * 1.7 if l.ndim == 3 else l, params)

    d0 = float(semi_orthogonal_deviation(params))
    p = params
    for _ in range(30):
        p = constrain_semi_orthogonal(p)
    d1 = float(semi_orthogonal_deviation(p))
    assert d1 < 1e-3, (d0, d1)
    assert d1 < d0

    # only bottleneck kernels moved
    flat0 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat1 = jax.tree_util.tree_flatten_with_path(p)[0]
    from pychain_tpu.models.tdnnf import BOTTLENECK_KERNEL_NAME
    for (path, a), (_, b) in zip(flat0, flat1):
        names = [getattr(k, "key", "") for k in path]
        is_bneck = BOTTLENECK_KERNEL_NAME in names and names[-1] == "kernel"
        if is_bneck:
            assert not np.allclose(np.asarray(a), np.asarray(b))
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tdnnf_chain_loss_end_to_end():
    from pychain_tpu.models import TDNNF, TDNNFConfig
    from pychain_tpu.utils.testgraphs import linear_fst
    from pychain_tpu.loss import chain_loss

    cfg = TDNNFConfig(num_pdfs=12, hidden_dim=16, bottleneck_dim=4,
                      num_layers=2, dropout=0.0)
    model = TDNNF(cfg)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 7, 5).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    nums = [ChainGraph(linear_fst(rng.randint(0, 12, size=7)),
                       log_domain=True) for _ in range(2)]
    nb = ChainGraphBatch(nums, max_num_transitions=7, max_num_states=8)
    den = ChainGraph(denominator_fst(num_phones=6, states_per_phone=2,
                                     seed=0)[0])
    db = ChainGraphBatch(den, 2)
    lengths = jnp.array([7, 7], jnp.int32)

    def loss_fn(p):
        return chain_loss(model.apply(p, x, train=False), lengths, nb, db)

    l0, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(l0))
    p1 = jax.tree.map(lambda a, g: a - 0.05 * g, params, grads)
    l1 = loss_fn(p1)
    assert float(l1) < float(l0)

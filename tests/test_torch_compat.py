"""Torch-compat shim: the reference's torch surface over the JAX engines.

Checks that ``pychain_tpu.torch_compat.ChainFunction`` / ``ChainLoss``
reproduce the functional JAX API exactly (same objf, same gradients)
and wire correctly into torch autograd (cotangent scaling, an SGD
step through a real torch module).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from pychain_tpu import ChainGraph, ChainGraphBatch, chain_function, \
    chain_loss
from pychain_tpu.torch_compat import ChainFunction, ChainLoss
from pychain_tpu.utils.testgraphs import denominator_fst, linear_fst


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    B, T = 4, 12
    den_fst, P = denominator_fst(num_phones=6, states_per_phone=2, seed=0)
    den = ChainGraph(den_fst, log_domain=False)
    lengths = np.array([T, T, T - 2, T - 5], np.int32)
    # each numerator sized to ITS utterance (a T-arc linear chain is
    # infeasible in fewer than T frames)
    nums = [ChainGraph(linear_fst(rng.randint(0, P, size=int(l))),
                       log_domain=True) for l in lengths]
    num_b = ChainGraphBatch(
        nums, max_num_transitions=max(g.num_transitions for g in nums),
        max_num_states=max(g.num_states for g in nums))
    x = rng.randn(B, T, P).astype(np.float32)
    return den, num_b, x, lengths, B, T, P


def test_chain_function_matches_jax(setup):
    den, num_b, x, lengths, B, T, P = setup
    den_b = ChainGraphBatch(den, B)
    xt = torch.tensor(x, requires_grad=True)
    lt = torch.tensor(lengths)

    objf_t = ChainFunction.apply(xt, lt, den_b)
    objf_t.backward()

    objf_j, grad_j = jax.value_and_grad(
        lambda a: chain_function(a, jnp.asarray(lengths), den_b))(
            jnp.asarray(x))
    np.testing.assert_allclose(float(objf_t.detach()), float(objf_j), rtol=1e-5)
    np.testing.assert_allclose(xt.grad.numpy(), np.asarray(grad_j),
                               rtol=1e-5, atol=1e-6)


def test_chain_function_log_domain_and_cotangent(setup):
    den, num_b, x, lengths, B, T, P = setup
    xt = torch.tensor(x, requires_grad=True)
    lt = torch.tensor(lengths)

    objf_t = ChainFunction.apply(xt, lt, num_b)
    (2.5 * objf_t).backward()  # non-unit cotangent scales the grad

    objf_j, grad_j = jax.value_and_grad(
        lambda a: chain_function(a, jnp.asarray(lengths), num_b))(
            jnp.asarray(x))
    np.testing.assert_allclose(float(objf_t.detach()), float(objf_j), rtol=1e-5)
    np.testing.assert_allclose(xt.grad.numpy(), 2.5 * np.asarray(grad_j),
                               rtol=1e-5, atol=1e-6)


def test_chain_loss_matches_jax(setup):
    den, num_b, x, lengths, B, T, P = setup
    loss_mod = ChainLoss(den)
    xt = torch.tensor(x, requires_grad=True)
    loss_t = loss_mod(xt, torch.tensor(lengths), num_b)
    loss_t.backward()

    den_b = ChainGraphBatch(den, B)
    loss_j, grad_j = jax.value_and_grad(
        lambda a: chain_loss(a, jnp.asarray(lengths), num_b, den_b))(
            jnp.asarray(x))
    np.testing.assert_allclose(float(loss_t.detach()), float(loss_j), rtol=1e-5)
    np.testing.assert_allclose(xt.grad.numpy(), np.asarray(grad_j),
                               rtol=1e-5, atol=1e-7)


def test_chain_loss_no_avg(setup):
    den, num_b, x, lengths, B, T, P = setup
    with_avg = ChainLoss(den)(torch.tensor(x), torch.tensor(lengths),
                              num_b)
    no_avg = ChainLoss(den, avg=False)(torch.tensor(x),
                                       torch.tensor(lengths), num_b)
    np.testing.assert_allclose(float(no_avg),
                               float(with_avg) * lengths.sum(), rtol=1e-5)


def test_torch_training_step(setup):
    """A real torch training loop: Linear model -> ChainLoss -> SGD.

    The loss must be finite and decrease over a few steps (the model
    can trivially fit B=4 utterances)."""
    den, num_b, x, lengths, B, T, P = setup
    torch.manual_seed(0)
    model = torch.nn.Linear(8, P)
    feats = torch.randn(B, T, 8)
    loss_mod = ChainLoss(den)
    opt = torch.optim.SGD(model.parameters(), lr=0.05)
    lt = torch.tensor(lengths)

    losses = []
    for _ in range(8):
        opt.zero_grad()
        loss = loss_mod(model(feats), lt, num_b)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_rejects_bad_inputs(setup):
    den, num_b, x, lengths, B, T, P = setup
    den_b = ChainGraphBatch(den, B)
    with pytest.raises(ValueError, match="B, T, P"):
        ChainFunction.apply(torch.zeros(B, T), torch.tensor(lengths),
                            den_b)
    with pytest.raises(ValueError, match="exceed the padded"):
        ChainFunction.apply(torch.zeros(B, T, P),
                            torch.tensor([T + 1] * B), den_b)
    with pytest.raises(ValueError, match="batch size"):
        ChainFunction.apply(torch.zeros(B + 1, T, P),
                            torch.tensor(lengths), den_b)

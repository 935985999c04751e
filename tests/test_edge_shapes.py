"""Edge shapes through every engine: odd pdf counts, B=1, length-1
sequences, states far from tile multiples."""

import numpy as np
import jax.numpy as jnp
import pytest

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.loss import chain_function_with_aux
from pychain_tpu.utils import oracle
from pychain_tpu.utils.testgraphs import denominator_fst, linear_fst


@pytest.mark.parametrize("impl", ["gather", "factorized", "pallas"])
def test_odd_pdf_count_denominator(impl):
    """P=37 (not a lane multiple), S=14 (tiny): all engines agree."""
    rng = np.random.RandomState(0)
    den_fst, P = denominator_fst(num_phones=7, states_per_phone=2, seed=0)
    assert P == 14
    den = ChainGraph(den_fst)
    B, T, P_model = 3, 5, 37  # model emits more pdfs than the graph uses
    x = jnp.asarray(rng.randn(B, T, P_model).astype(np.float32))
    lengths = np.array([5, 3, 1], np.int32)
    batch = ChainGraphBatch(den, B)
    _, res = chain_function_with_aux(x, lengths, batch, impl=impl)
    ref_objf, ref_gamma = oracle.oracle_objf_prob(
        np.asarray(x), lengths, [den] * B, 1e-5)
    tol = 2e-2 if impl == "pallas" else 2e-4
    np.testing.assert_allclose(np.asarray(res.objf), ref_objf, rtol=tol,
                               atol=tol)
    np.testing.assert_allclose(np.asarray(res.gamma), ref_gamma,
                               rtol=10 * tol, atol=tol)
    # pdfs the graph never references must get zero posterior
    assert np.all(np.asarray(res.gamma)[:, :, P:] == 0.0)


def test_batch_of_one_length_of_one():
    rng = np.random.RandomState(1)
    P = 6
    den = ChainGraph(denominator_fst(num_phones=3, states_per_phone=2,
                                     seed=1)[0])
    x = jnp.asarray(rng.randn(1, 1, P).astype(np.float32))
    lengths = np.array([1], np.int32)
    batch = ChainGraphBatch(den, 1)
    _, res = chain_function_with_aux(x, lengths, batch)
    ref_objf, ref_gamma = oracle.oracle_objf_prob(
        np.asarray(x), lengths, [den], 1e-5)
    np.testing.assert_allclose(np.asarray(res.objf), ref_objf, rtol=1e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.gamma), ref_gamma,
                               rtol=1e-3, atol=1e-6)
    assert bool(res.ok[0])


def test_linear_numerator_length_one():
    rng = np.random.RandomState(2)
    P = 4
    g = ChainGraph(linear_fst([2]), log_domain=True)
    batch = ChainGraphBatch([g], max_num_transitions=1, max_num_states=2)
    x = jnp.asarray(rng.randn(1, 1, P).astype(np.float32))
    _, res = chain_function_with_aux(x, np.array([1], np.int32), batch)
    # objf = x[0,0,2] + final(0) + arc logp(0)
    assert abs(float(res.objf[0]) - float(x[0, 0, 2])) < 1e-5
    gam = np.asarray(res.gamma)
    assert gam[0, 0, 2] == 1.0 and gam.sum() == 1.0

"""Factorized (block-sparse MXU) path vs the generic gather path.

The factorized evaluation must match the gather implementation to f32
noise on identical graphs — same math, different execution plan.
"""

import numpy as np
import jax.numpy as jnp

from pychain_tpu import ChainGraph, ChainGraphBatch
from pychain_tpu.graphs.factorize import factorize
from pychain_tpu.loss import chain_function_with_aux
from pychain_tpu.utils import oracle
from pychain_tpu.utils.testgraphs import denominator_fst, random_fst


def test_factorization_covers_hmm_topology():
    den_fst, P = denominator_fst(num_phones=40, states_per_phone=2, seed=0)
    den = ChainGraph(den_fst, log_domain=False)
    fg = factorize(den)
    # Kaldi-style HMM graphs must factorize completely (no residual arcs)
    assert fg.res_src.shape[0] == 0
    # every arc accounted for (parallel arcs may merge into one entry)
    nnz = 0
    for w in (fg.w1, fg.w2):
        nnz += np.count_nonzero(w.diag) + np.count_nonzero(w.tiles)
        if w.dense is not None:
            nnz += np.count_nonzero(w.dense)
    assert 0 < nnz <= den.num_transitions
    # the cross-phone block must have been recognised as one dense block
    assert fg.w1.dense is not None
    assert fg.w1.num_tiles < 30


def test_factorized_matches_gather_path():
    rng = np.random.RandomState(0)
    den_fst, P = denominator_fst(num_phones=40, states_per_phone=2, seed=1)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 4, 18
    lengths = np.array([18, 15, 9, 3], np.int32)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    batch = ChainGraphBatch(den, B)
    assert batch._fact is not None

    _, res_f = chain_function_with_aux(x, lengths, batch, impl="factorized")
    _, res_g = chain_function_with_aux(x, lengths, batch, impl="gather")

    np.testing.assert_allclose(np.asarray(res_f.objf),
                               np.asarray(res_g.objf), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res_f.gamma),
                               np.asarray(res_g.gamma), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_f.alpha_beta)[:, :3],
                               np.asarray(res_g.alpha_beta)[:, :3],
                               rtol=1e-4)
    assert np.all(np.asarray(res_f.ok))


def test_factorized_matches_oracle():
    rng = np.random.RandomState(1)
    den_fst, P = denominator_fst(num_phones=25, states_per_phone=3, seed=2)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 3, 10
    lengths = np.array([10, 7, 4], np.int32)
    x = rng.randn(B, T, P).astype(np.float32)
    batch = ChainGraphBatch(den, B)
    _, res = chain_function_with_aux(jnp.asarray(x), lengths, batch,
                                     impl="factorized")
    ref_objf, ref_gamma = oracle.oracle_objf_prob(x, lengths, [den] * B,
                                                  1e-5)
    np.testing.assert_allclose(np.asarray(res.objf), ref_objf,
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.gamma), ref_gamma,
                               rtol=1e-3, atol=1e-6)


def test_factorized_random_graph_with_residual():
    """Random graphs don't fully factorize; the residual gather path must
    pick up the leftovers and still match the pure gather path."""
    rng = np.random.RandomState(2)
    P = 6
    fst = random_fst(num_states=9, num_pdfs=P, max_arcs_per_state=4,
                     seed=3)
    den = ChainGraph(fst, log_domain=False)
    B, T = 3, 8
    lengths = np.array([8, 5, 2], np.int32)
    x = jnp.asarray(rng.randn(B, T, P).astype(np.float32))
    batch = ChainGraphBatch(den, B)

    _, res_f = chain_function_with_aux(x, lengths, batch, impl="factorized")
    _, res_g = chain_function_with_aux(x, lengths, batch, impl="gather")
    np.testing.assert_allclose(np.asarray(res_f.objf),
                               np.asarray(res_g.objf), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res_f.gamma),
                               np.asarray(res_g.gamma), rtol=1e-4,
                               atol=1e-6)

"""Numerical parity against the ACTUAL reference implementation.

Requires the reference's CPU engine built via
``python tools/build_reference_baseline.py`` (skipped otherwise).
Feeds byte-identical graph tensors and inputs to both engines and
compares total log-likelihood and occupation-posterior gradients.
Parity target: |delta| <= 1e-4 (BASELINE.json) — the reference CPU path
is exact (no randomised pruning, unlike its CUDA path).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/tmp/refbuild")
_FAIL_MARKER = "/tmp/refbuild/.build_failed"
try:
    import pychain_C
except ImportError:
    # /tmp is ephemeral: rebuild the reference engine rather than
    # silently skipping the strongest oracle in the suite.  A failed
    # build is recorded (marker file) so later runs skip fast with the
    # error instead of re-paying the build timeout every invocation.
    if os.path.exists(_FAIL_MARKER):
        with open(_FAIL_MARKER) as fh:
            pytest.skip("reference build failed earlier: " + fh.read(),
                        allow_module_level=True)
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "build_reference_baseline.py")
    try:
        subprocess.run([sys.executable, tool], check=True, timeout=600,
                       capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        os.makedirs("/tmp/refbuild", exist_ok=True)
        tail = (e.stderr or "")[-800:]
        with open(_FAIL_MARKER, "w") as fh:
            fh.write(tail)
        pytest.skip("reference build failed: " + tail,
                    allow_module_level=True)
    except Exception as e:  # timeout, missing interpreter, ...
        os.makedirs("/tmp/refbuild", exist_ok=True)
        with open(_FAIL_MARKER, "w") as fh:
            fh.write(repr(e))
        pytest.skip(f"reference build failed: {e!r}",
                    allow_module_level=True)
    pychain_C = pytest.importorskip("pychain_C")

import jax.numpy as jnp  # noqa: E402

from pychain_tpu import ChainGraph, ChainGraphBatch  # noqa: E402
from pychain_tpu.loss import chain_function_with_aux  # noqa: E402
from pychain_tpu.utils.testgraphs import (  # noqa: E402
    denominator_fst, linear_fst, random_fst)


def _batch_sizes(lengths, T):
    """Per-frame active-sequence counts (pack_padded_sequence semantics;
    requires sorted non-increasing lengths, which the reference needs)."""
    lengths = np.asarray(lengths)
    assert np.all(np.diff(lengths) <= 0), "reference needs sorted batch"
    return torch.tensor(
        [(lengths > t).sum() for t in range(T)], dtype=torch.long)


def _ref_forward_backward(batch, x, lengths, leaky=1e-5):
    """Call the reference engine on a prob-domain ChainGraphBatch."""
    B, T, P = x.shape
    t = lambda a, dt: torch.from_numpy(np.ascontiguousarray(a)).to(dt)
    fwd_t = t(np.asarray(batch.forward_transitions), torch.int32)
    fwd_i = t(np.asarray(batch.forward_transition_indices), torch.int32)
    fwd_p = t(np.asarray(batch.forward_transition_probs), torch.float32)
    bwd_t = t(np.asarray(batch.backward_transitions), torch.int32)
    bwd_i = t(np.asarray(batch.backward_transition_indices), torch.int32)
    bwd_p = t(np.asarray(batch.backward_transition_probs), torch.float32)
    init = t(np.asarray(batch.initial_probs), torch.float32)
    final = t(np.asarray(batch.final_probs), torch.float32)
    start = t(np.asarray(batch.start_state), torch.long)
    xin = torch.from_numpy(np.clip(x, -30, 30))
    bs = _batch_sizes(lengths, T)
    ls = torch.from_numpy(np.asarray(lengths)).to(torch.long)
    if not batch.log_domain:
        leaky_t = t(np.asarray(batch.leaky_probs), torch.float32)
        objf, grad, ok = pychain_C.forward_backward(
            fwd_t, fwd_i, fwd_p, bwd_t, bwd_i, bwd_p,
            leaky_t, init, final, start, xin.exp(), bs, ls,
            batch.num_states, leaky)
        return float(objf), grad.numpy(), bool(ok)
    objf, log_grad, ok = pychain_C.forward_backward_log_domain(
        fwd_t, fwd_i, fwd_p, bwd_t, bwd_i, bwd_p,
        init, final, start, xin, bs, ls, batch.num_states)
    return float(objf), log_grad.exp().numpy(), bool(ok)


def _ours(batch, x, lengths, leaky=1e-5):
    objf, res = chain_function_with_aux(
        jnp.asarray(x), jnp.asarray(lengths), batch,
        leaky_coefficient=leaky)
    return float(objf), np.asarray(res.gamma), np.asarray(res.ok)


def test_parity_denominator_prob_domain():
    rng = np.random.RandomState(0)
    den_fst, P = denominator_fst(num_phones=30, states_per_phone=2, seed=0)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 8, 50
    lengths = np.array([50, 50, 45, 40, 30, 20, 10, 5], np.int32)
    x = rng.randn(B, T, P).astype(np.float32)
    batch = ChainGraphBatch(den, B)

    ref_objf, ref_grad, ref_ok = _ref_forward_backward(batch, x, lengths)
    objf, gamma, ok = _ours(batch, x, lengths)

    assert ref_ok and np.all(ok)
    assert abs(objf - ref_objf) / max(1.0, abs(ref_objf)) < 1e-4
    np.testing.assert_allclose(gamma, ref_grad, rtol=2e-3, atol=2e-5)


def test_parity_numerator_log_domain():
    rng = np.random.RandomState(1)
    B, T, P = 6, 30, 20
    graphs = [ChainGraph(linear_fst(rng.randint(0, P, size=t)),
                         log_domain=True)
              for t in [30, 28, 25, 20, 15, 10]]
    lengths = np.array([30, 28, 25, 20, 15, 10], np.int32)
    x = rng.randn(B, T, P).astype(np.float32)
    batch = ChainGraphBatch(
        graphs, max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))

    ref_objf, ref_grad, ref_ok = _ref_forward_backward(batch, x, lengths)
    objf, gamma, ok = _ours(batch, x, lengths)

    assert ref_ok and np.all(ok)
    assert abs(objf - ref_objf) / max(1.0, abs(ref_objf)) < 1e-4
    np.testing.assert_allclose(gamma, ref_grad, rtol=2e-3, atol=2e-5)


def test_parity_random_graph_batch_log_domain():
    rng = np.random.RandomState(2)
    B, T, P = 4, 12, 8
    graphs = [ChainGraph(random_fst(num_states=6 + b, num_pdfs=P,
                                    seed=100 + b), log_domain=True)
              for b in range(B)]
    lengths = np.array([12, 9, 6, 3], np.int32)
    x = rng.randn(B, T, P).astype(np.float32)
    batch = ChainGraphBatch(
        graphs, max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))

    ref_objf, ref_grad, _ = _ref_forward_backward(batch, x, lengths)
    objf, gamma, _ = _ours(batch, x, lengths)
    assert abs(objf - ref_objf) / max(1.0, abs(ref_objf)) < 1e-4
    np.testing.assert_allclose(gamma, ref_grad, rtol=2e-3, atol=2e-5)


def test_parity_builder_denominator_and_flat_numerators():
    """LM-estimated denominator + flat-start numerators from
    graphs/builder.py, fed byte-identically to the REFERENCE engine:
    pins the realistic built-graph structures (initial state without
    self-loop, repeated-phone loops, stochastic rows) against the
    actual reference implementation."""
    from pychain_tpu.graphs.builder import (ChainTopology,
                                            estimate_phone_lm,
                                            make_denominator_fst,
                                            make_numerator_fst)
    rng = np.random.RandomState(7)
    num_phones = 10
    transcripts = [[int(p) for p in
                    rng.randint(0, num_phones, size=rng.randint(5, 12))]
                   for _ in range(40)]
    topo = ChainTopology(num_phones=num_phones)
    lm = estimate_phone_lm(transcripts, num_phones=num_phones, order=2)

    den = ChainGraph(make_denominator_fst(lm, topo), log_domain=False)
    B, T, P = 4, 24, topo.num_pdfs
    lengths = np.array([24, 20, 16, 9], np.int32)
    x = rng.randn(B, T, P).astype(np.float32)
    batch = ChainGraphBatch(den, B)
    ref_objf, ref_grad, ref_ok = _ref_forward_backward(batch, x, lengths)
    objf, gamma, ok = _ours(batch, x, lengths)
    assert ref_ok and np.all(ok)
    assert abs(objf - ref_objf) / max(1.0, abs(ref_objf)) < 1e-4
    np.testing.assert_allclose(gamma, ref_grad, rtol=2e-3, atol=2e-5)

    nums = [ChainGraph(make_numerator_fst(transcripts[i], topo, lm=lm),
                       log_domain=True) for i in range(B)]
    nbatch = ChainGraphBatch(
        nums, max_num_transitions=max(g.num_transitions for g in nums),
        max_num_states=max(g.num_states for g in nums))
    ref_objf, ref_grad, ref_ok = _ref_forward_backward(nbatch, x, lengths)
    objf, gamma, ok = _ours(nbatch, x, lengths)
    assert ref_ok and np.all(ok)
    assert abs(objf - ref_objf) / max(1.0, abs(ref_objf)) < 1e-4
    np.testing.assert_allclose(gamma, ref_grad, rtol=2e-3, atol=2e-5)


def test_parity_xl_semiring_log_domain():
    """XL semiring kernels vs the reference log-domain CPU engine on a
    cyclic batch (forced impl — the same engine that serves batches
    beyond the dense one-hot budget; small sizes, interpreter off-TPU).
    Capability target: chain-log-domain-kernels.cu:86-235."""
    rng = np.random.RandomState(4)
    B, T, P = 4, 12, 8
    graphs = [ChainGraph(random_fst(num_states=6 + b, num_pdfs=P,
                                    seed=200 + b), log_domain=True)
              for b in range(B)]
    lengths = np.array([12, 9, 6, 3], np.int32)
    x = rng.randn(B, T, P).astype(np.float32)
    batch = ChainGraphBatch(
        graphs, max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))

    ref_objf, ref_grad, _ = _ref_forward_backward(batch, x, lengths)
    objf, res = chain_function_with_aux(
        jnp.asarray(x), jnp.asarray(lengths), batch, impl="semiring_xl")
    assert abs(float(objf) - ref_objf) / max(1.0, abs(ref_objf)) < 1e-4
    np.testing.assert_allclose(np.asarray(res.gamma), ref_grad,
                               rtol=2e-3, atol=2e-5)


def test_parity_factorized_log_domain():
    """The factorized-log path (shared log-domain graph on the
    factorized engines, normalized-linear, leaky=0 — round 4) vs the
    reference log-domain CPU engine.  This is the path that serves the
    denominator-scale log-domain class at 27.3x the gather engine on
    chip (bench --xlstream); parity target:
    chain-log-domain-computation.{h,cc}."""
    rng = np.random.RandomState(15)
    B, T = 4, 12
    fst, P = _testgraph_denominator(num_phones=5, seed=3)
    shared = ChainGraph(fst, log_domain=True)
    batch = ChainGraphBatch(shared, B)
    from pychain_tpu.ops.factorized import FactorizedArrays
    assert isinstance(batch._fact, FactorizedArrays)
    lengths = np.array([12, 9, 6, 2], np.int32)
    x = rng.randn(B, T, P).astype(np.float32)

    ref_objf, ref_grad, _ = _ref_forward_backward(batch, x, lengths)
    objf, res = chain_function_with_aux(
        jnp.asarray(x), jnp.asarray(lengths), batch, impl="factorized")
    assert abs(float(objf) - ref_objf) / max(1.0, abs(ref_objf)) < 1e-4
    np.testing.assert_allclose(np.asarray(res.gamma), ref_grad,
                               rtol=2e-3, atol=2e-5)


def _testgraph_denominator(num_phones, seed):
    from pychain_tpu.utils.testgraphs import denominator_fst
    return denominator_fst(num_phones=num_phones, states_per_phone=2,
                           seed=seed)


def test_parity_streamed_xl_semiring_log_domain(monkeypatch):
    """STREAMED XL tier (arc-chunk masks, round 4) vs the reference
    log-domain CPU engine: the beyond-resident-budget class the
    reference serves with per-arc CUDA threads
    (chain-log-domain-kernels.cu:86-235).  The resident budget is
    killed so the same graphs run through the streamed kernels with
    multiple arc chunks."""
    import pychain_tpu.ops.semiring_xl as semiring_xl
    monkeypatch.setattr(semiring_xl, "XL_VMEM_BUDGET", 1)
    monkeypatch.setattr(semiring_xl, "XL_STREAM_MASK_BUDGET", 1)
    rng = np.random.RandomState(14)
    B, T, P = 3, 10, 7
    graphs = [ChainGraph(random_fst(num_states=40 + b, num_pdfs=P,
                                    max_arcs_per_state=5,
                                    seed=300 + b), log_domain=True)
              for b in range(B)]
    lengths = np.array([10, 7, 4], np.int32)
    x = rng.randn(B, T, P).astype(np.float32)
    batch = ChainGraphBatch(
        graphs, max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))
    assert batch.num_transitions > 128, "must exercise multiple chunks"

    ref_objf, ref_grad, _ = _ref_forward_backward(batch, x, lengths)
    objf, res = chain_function_with_aux(
        jnp.asarray(x), jnp.asarray(lengths), batch, impl="semiring_xl")
    assert abs(float(objf) - ref_objf) / max(1.0, abs(ref_objf)) < 1e-4
    np.testing.assert_allclose(np.asarray(res.gamma), ref_grad,
                               rtol=2e-3, atol=2e-5)


def test_parity_dense_list_prob_domain():
    """The dense-batched LIST engine (round 5) vs the reference CPU
    engine on per-sequence prob-domain (leaky-HMM) graphs — the
    reference's batched-graph denominator capability
    (chain-kernels.cu:112-169, CPU twin chain-computation.cc), served
    here as per-graph dense MXU blocks (ops/dense_list.py)."""
    rng = np.random.RandomState(21)
    B, T = 4, 15
    graphs = []
    for i in range(B):
        fst, p = _testgraph_denominator(num_phones=4 + i, seed=10 + i)
        graphs.append(ChainGraph(fst, log_domain=False))
    P = max(g.num_pdfs for g in graphs)
    batch = ChainGraphBatch(
        graphs,
        max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))
    lengths = np.array([15, 12, 8, 3], np.int32)
    x = rng.randn(B, T, P).astype(np.float32)

    ref_objf, ref_grad, ref_ok = _ref_forward_backward(batch, x, lengths)
    objf, res = chain_function_with_aux(
        jnp.asarray(x), jnp.asarray(lengths), batch, impl="dense_list")
    from pychain_tpu.ops.dense_list import DenseListArrays
    assert isinstance(batch._dense_list, DenseListArrays)
    assert ref_ok and np.all(np.asarray(res.ok))
    assert abs(float(objf) - ref_objf) / max(1.0, abs(ref_objf)) < 1e-4
    np.testing.assert_allclose(np.asarray(res.gamma), ref_grad,
                               rtol=2e-3, atol=2e-5)

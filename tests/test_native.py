"""Native C++ runtime vs the pure-Python implementations.

Builds libpychain_native.so on the fly if missing (g++ is in the
image); every native entry point must agree with its Python twin.
"""

import numpy as np
import pytest

from pychain_tpu.csrc import native
from pychain_tpu.graphs.compiler import compile_fst, leaky_probs
from pychain_tpu.graphs.fst import FST, write_ark
from pychain_tpu.utils import oracle
from pychain_tpu.utils.testgraphs import denominator_fst, linear_fst, random_fst

if not native.available():
    if not native.build():
        pytest.skip("native library unavailable and build failed",
                    allow_module_level=True)


def test_native_fst_read_roundtrip(tmp_path):
    fst = random_fst(num_states=17, num_pdfs=9, seed=3)
    path = str(tmp_path / "x.fst")
    fst.write(path)
    got = native.read_fst(path)
    np.testing.assert_array_equal(got.ilabels, fst.ilabels)
    np.testing.assert_allclose(got.weights, fst.weights)
    np.testing.assert_allclose(got.final, fst.final)
    assert got.start == fst.start


def test_native_fst_write(tmp_path):
    fst = random_fst(num_states=11, num_pdfs=4, seed=9)
    path = str(tmp_path / "w.fst")
    native.write_fst(fst, path)
    got = FST.read(path)  # python reader on native-written file
    np.testing.assert_array_equal(got.nextstates, fst.nextstates)
    np.testing.assert_allclose(got.weights, fst.weights)


def test_native_ark_offsets(tmp_path):
    fsts = {f"u{i}": random_fst(num_states=6 + i, seed=i) for i in range(3)}
    path = str(tmp_path / "g.ark")
    offsets = write_ark(path, fsts)
    for k, fst in fsts.items():
        got = native.read_fst(path, offsets[k])
        np.testing.assert_array_equal(got.ilabels, fst.ilabels)


@pytest.mark.parametrize("log_domain", [False, True])
def test_native_compile_parity(log_domain):
    fst = random_fst(num_states=23, num_pdfs=11, seed=7)
    a = compile_fst(fst, log_domain=log_domain)
    b = native.compile_fst(fst, log_domain=log_domain)
    np.testing.assert_array_equal(a.forward_transitions,
                                  b.forward_transitions)
    np.testing.assert_allclose(a.forward_transition_probs,
                               b.forward_transition_probs, rtol=1e-6)
    np.testing.assert_array_equal(a.forward_transition_indices,
                                  b.forward_transition_indices)
    np.testing.assert_array_equal(a.backward_transitions,
                                  b.backward_transitions)
    np.testing.assert_allclose(a.backward_transition_probs,
                               b.backward_transition_probs, rtol=1e-6)
    np.testing.assert_array_equal(a.backward_transition_indices,
                                  b.backward_transition_indices)
    np.testing.assert_allclose(a.final_probs, b.final_probs, rtol=1e-6)


def test_native_leaky_parity():
    fst = random_fst(num_states=15, num_pdfs=6, seed=13)
    np.testing.assert_allclose(native.leaky_probs(fst), leaky_probs(fst),
                               rtol=1e-6, atol=1e-8)


def test_native_fwdbwd_prob_vs_oracle():
    from pychain_tpu import ChainGraph
    rng = np.random.RandomState(0)
    den_fst, P = denominator_fst(num_phones=10, states_per_phone=2, seed=0)
    den = ChainGraph(den_fst, log_domain=False)
    B, T = 3, 9
    lengths = np.array([9, 6, 2], np.int32)
    x = rng.randn(B, T, P).astype(np.float32)
    px = np.exp(np.clip(x, -30, 30))
    objf, gamma, ok = native.fwdbwd_prob(
        px, lengths, den.forward_transitions, den.forward_transition_probs,
        den.backward_transitions, den.backward_transition_probs,
        den.initial_probs, den.final_probs, den.leaky_probs)
    ref_objf, ref_gamma = oracle.oracle_objf_prob(x, lengths, [den] * B,
                                                  1e-5)
    assert ok
    np.testing.assert_allclose(objf, ref_objf, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(gamma, ref_gamma, rtol=1e-3, atol=1e-6)


def test_native_fwdbwd_log_vs_oracle():
    from pychain_tpu import ChainGraph, ChainGraphBatch
    rng = np.random.RandomState(1)
    B, T, P = 3, 8, 5
    graphs = [ChainGraph(linear_fst(rng.randint(0, P, size=t)),
                         log_domain=True) for t in [8, 6, 4]]
    lengths = np.array([8, 6, 4], np.int32)
    x = rng.randn(B, T, P).astype(np.float32)
    batch = ChainGraphBatch(
        graphs, max_num_transitions=max(g.num_transitions for g in graphs),
        max_num_states=max(g.num_states for g in graphs))
    objf, gamma, ok = native.fwdbwd_log(
        x, lengths, np.asarray(batch.forward_transitions),
        np.asarray(batch.forward_transition_probs),
        np.asarray(batch.backward_transitions),
        np.asarray(batch.backward_transition_probs),
        np.asarray(batch.initial_probs), np.asarray(batch.final_probs))
    ref_objf, ref_gamma = oracle.oracle_objf_log(x, lengths, graphs)
    assert ok
    np.testing.assert_allclose(objf, ref_objf, rtol=2e-4)
    np.testing.assert_allclose(gamma, ref_gamma, rtol=2e-3, atol=2e-6)


def test_native_feature_decode_parity(tmp_path):
    """C++ feature decoder (pc_feats_read) matches the Python spec on
    every wire format, and the native ark scanner finds all entries."""
    import io
    from pychain_tpu.csrc import native
    from pychain_tpu.data.kaldi_features import (
        load_scp_entry, scan_feats_ark, write_compressed_matrix,
        write_matrix)
    if not native.available() and not native.build():
        pytest.skip("native library not built")

    rng = np.random.RandomState(0)
    mats = {f"u{i}": (rng.randn(7 + 3 * i, 5) * 2).astype(np.float32)
            for i in range(4)}
    ark = str(tmp_path / "mixed.ark")
    offsets = {}
    with open(ark, "wb") as f:
        for i, (k, m) in enumerate(mats.items()):
            f.write(k.encode() + b" ")
            offsets[k] = f.tell()
            f.write(b"\x00B")
            if i == 0:
                write_matrix(f, m)
            else:
                write_compressed_matrix(f, m, fmt=i)  # CM, CM2, CM3

    for k, off in offsets.items():
        nat = native.read_feats(ark, off)
        ref = load_scp_entry(ark, off, use_native=False)
        np.testing.assert_allclose(nat, ref, rtol=0, atol=0)

    scanned = scan_feats_ark(ark)
    assert scanned == [(k, off) for k, off in offsets.items()]


def test_native_scan_grows_key_buffer(tmp_path):
    """Keys beyond the initial key-buffer capacity must grow the buffer,
    not silently drop/misalign keys (the C++ side returns -2; regression
    for the skip-one-write-next misalignment)."""
    from pychain_tpu.csrc import native
    from pychain_tpu.data.kaldi_features import write_matrix
    if not native.available() and not native.build():
        pytest.skip("native library not built")

    rng = np.random.RandomState(0)
    keys = [f"utterance-{i:04d}-with-a-deliberately-long-identifier"
            for i in range(8)]
    ark = str(tmp_path / "longkeys.ark")
    offsets = {}
    with open(ark, "wb") as f:
        for k in keys:
            f.write(k.encode() + b" ")
            offsets[k] = f.tell()
            f.write(b"\x00B")
            write_matrix(f, rng.randn(3, 2).astype(np.float32))

    # initial capacity fits ~1.5 keys: forces several -2 growth rounds
    scanned = native.scan_feats_ark(ark, _initial_keys_cap=64)
    assert scanned == [(k, off) for k, off in offsets.items()]

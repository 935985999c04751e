"""FST container and I/O round-trips (binary, text, ark)."""

import numpy as np
import pytest

from pychain_tpu.graphs.fst import FST, read_ark_sequential, write_ark
from pychain_tpu.utils.testgraphs import random_fst


def assert_fst_equal(a: FST, b: FST):
    assert a.start == b.start
    assert a.num_states == b.num_states
    np.testing.assert_allclose(a.final, b.final)
    np.testing.assert_array_equal(a.arc_offsets, b.arc_offsets)
    np.testing.assert_array_equal(a.ilabels, b.ilabels)
    np.testing.assert_array_equal(a.olabels, b.olabels)
    np.testing.assert_allclose(a.weights, b.weights)
    np.testing.assert_array_equal(a.nextstates, b.nextstates)


def test_linear_builder():
    fst = FST.linear([3, 1, 4, 1])
    assert fst.num_states == 5
    assert fst.num_arcs == 4
    assert fst.start == 0
    il, ol, w, ns = fst.state_arcs(0)
    assert list(il) == [4]  # pdf 3 -> ilabel 4
    assert np.isfinite(fst.final[4]) and not np.isfinite(fst.final[0])


def test_binary_roundtrip(tmp_path):
    fst = random_fst(num_states=13, num_pdfs=7, seed=3)
    path = str(tmp_path / "a.fst")
    assert fst.write(path)
    got = FST.read(path)
    assert_fst_equal(fst, got)


def test_text_roundtrip():
    fst = random_fst(num_states=9, num_pdfs=5, seed=7)
    got = FST.from_text(fst.to_text())
    # text order starts at the start state; start=0 here so layout matches
    assert_fst_equal(fst, got)


def test_text_parse_standard_format():
    text = """0 1 1 1 0.5
1 2 2 2
2 1.5
"""
    fst = FST.from_text(text)
    assert fst.num_states == 3
    assert fst.start == 0
    assert fst.num_arcs == 2
    assert fst.final[2] == pytest.approx(1.5)
    assert not np.isfinite(fst.final[0])


def test_ark_roundtrip(tmp_path):
    fsts = {f"utt{i}": random_fst(num_states=5 + i, seed=i) for i in range(4)}
    path = str(tmp_path / "graphs.ark")
    offsets = write_ark(path, fsts)
    # random access by offset (reference read_ark semantics, fstext.cc:7-17)
    for key, fst in fsts.items():
        got = FST.read_ark(path, offsets[key])
        assert_fst_equal(fst, got)
    # sequential scan
    seq = dict(read_ark_sequential(path))
    assert set(seq) == set(fsts)
    for key in fsts:
        assert_fst_equal(fsts[key], seq[key])


def test_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "junk.fst")
    with open(path, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        FST.read(path)

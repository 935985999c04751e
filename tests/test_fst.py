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


# ----------------------------------------------------------------------
# ConstFst + embedded symbol tables (formats OpenFST reads transparently
# for the reference; see graphs/fst.py:_read_const_body)
# ----------------------------------------------------------------------

def _write_symbol_table(f, symbols):
    import struct
    f.write(struct.pack("<i", 2125658996))
    name = b"syms"
    f.write(struct.pack("<i", len(name)) + name)
    f.write(struct.pack("<q", len(symbols)))      # available_key
    f.write(struct.pack("<q", len(symbols)))      # size
    for i, s in enumerate(symbols):
        b = s.encode()
        f.write(struct.pack("<i", len(b)) + b + struct.pack("<q", i))


def _write_const_fst(f, fst: FST, aligned: bool, symbols=False):
    import struct
    f.write(struct.pack("<i", 2125659606))
    f.write(struct.pack("<i", 5) + b"const")
    f.write(struct.pack("<i", 8) + b"standard")
    f.write(struct.pack("<i", 1 if aligned else 2))   # version
    flags = 0x3 if symbols else 0
    f.write(struct.pack("<i", flags))
    f.write(struct.pack("<Q", 0))                     # properties
    f.write(struct.pack("<q", fst.start))
    f.write(struct.pack("<q", fst.num_states))
    f.write(struct.pack("<q", fst.num_arcs))
    if symbols:
        _write_symbol_table(f, ["<eps>", "a", "b"])
        _write_symbol_table(f, ["<eps>", "x"])

    def align():
        if aligned:
            pad = (-f.tell()) % 16
            f.write(b"\0" * pad)

    align()
    for s in range(fst.num_states):
        lo, hi = int(fst.arc_offsets[s]), int(fst.arc_offsets[s + 1])
        f.write(struct.pack("<fIIII", float(fst.final[s]), lo, hi - lo,
                            0, 0))
    align()
    for k in range(fst.num_arcs):
        f.write(struct.pack("<iifi", int(fst.ilabels[k]),
                            int(fst.olabels[k]), float(fst.weights[k]),
                            int(fst.nextstates[k])))


@pytest.mark.parametrize("aligned", [False, True])
def test_const_fst_read(tmp_path, aligned):
    ref = random_fst(num_states=9, num_pdfs=5, seed=3)
    p = str(tmp_path / "c.fst")
    with open(p, "wb") as f:
        _write_const_fst(f, ref, aligned=aligned)
    assert_fst_equal(FST.read(p), ref)


def test_embedded_symbol_tables_skipped(tmp_path):
    ref = random_fst(num_states=6, num_pdfs=4, seed=4)
    p = str(tmp_path / "s.fst")
    with open(p, "wb") as f:
        _write_const_fst(f, ref, aligned=False, symbols=True)
    assert_fst_equal(FST.read(p), ref)


def test_vector_fst_with_symbol_tables(tmp_path):
    """Symbol tables on a plain VectorFst file too."""
    import io
    import struct
    ref = random_fst(num_states=5, num_pdfs=4, seed=5)
    buf = io.BytesIO()
    ref.write_stream(buf)
    raw = bytearray(buf.getvalue())
    # header layout: magic, len+type(6), len+arctype(8), version, flags
    flags_off = 4 + 4 + 6 + 4 + 8 + 4
    raw[flags_off:flags_off + 4] = struct.pack("<i", 0x3)
    hdr_end = flags_off + 4 + 8 + 8 + 8 + 8
    syms = io.BytesIO()
    _write_symbol_table(syms, ["<eps>", "a"])
    _write_symbol_table(syms, ["<eps>"])
    patched = bytes(raw[:hdr_end]) + syms.getvalue() + bytes(raw[hdr_end:])
    p = str(tmp_path / "v.fst")
    with open(p, "wb") as f:
        f.write(patched)
    assert_fst_equal(FST.read(p), ref)

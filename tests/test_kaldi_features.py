"""Kaldi feature ark/scp round-trips."""

import numpy as np
import pytest

from pychain_tpu.data import (load_scp_entry, read_feats_ark, read_scp,
                              write_feats_ark, write_scp)


def test_feats_ark_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    feats = {f"utt{i}": rng.randn(10 + i, 13).astype(np.float32)
             for i in range(4)}
    ark = str(tmp_path / "feats.ark")
    offsets = write_feats_ark(ark, feats)
    got = dict(read_feats_ark(ark))
    assert set(got) == set(feats)
    for k in feats:
        np.testing.assert_allclose(got[k], feats[k])


def test_scp_random_access(tmp_path):
    rng = np.random.RandomState(1)
    feats = {f"u{i}": rng.randn(5, 8).astype(np.float32) for i in range(3)}
    ark = str(tmp_path / "f.ark")
    scp = str(tmp_path / "f.scp")
    offsets = write_feats_ark(ark, feats)
    write_scp(scp, ark, offsets)
    entries = read_scp(scp)
    assert len(entries) == 3
    # access out of order
    for key, path, off in reversed(entries):
        np.testing.assert_allclose(load_scp_entry(path, off), feats[key])


def test_compressed_matrix_roundtrip(tmp_path):
    """CM (col-header uint8) / CM2 (uint16) / CM3 (uint8) payloads
    decode within their quantisation budgets."""
    import io
    from pychain_tpu.data.kaldi_features import (read_matrix,
                                                 write_compressed_matrix)
    rng = np.random.RandomState(0)
    mat = (rng.randn(50, 13) * 3.0 + 1.5).astype(np.float32)
    rng_v = float(mat.max() - mat.min())
    budgets = {1: rng_v / 40, 2: rng_v / 65000, 3: rng_v / 200}
    for fmt, budget in budgets.items():
        buf = io.BytesIO()
        write_compressed_matrix(buf, mat, fmt=fmt)
        buf.seek(0)
        got = read_matrix(buf)
        assert got.shape == mat.shape
        err = np.abs(got - mat).max()
        assert err <= budget, (fmt, err, budget)


def test_compressed_matrix_in_ark(tmp_path):
    """A compressed entry embedded in an ark reads through the normal
    ark/scp path."""
    from pychain_tpu.data.kaldi_features import write_compressed_matrix
    rng = np.random.RandomState(1)
    mat = rng.randn(12, 6).astype(np.float32)
    ark = str(tmp_path / "c.ark")
    with open(ark, "wb") as f:
        f.write(b"utt1 ")
        off = f.tell()
        f.write(b"\x00B")
        write_compressed_matrix(f, mat, fmt=1)
    got = dict(read_feats_ark(ark))
    assert np.abs(got["utt1"] - mat).max() < 0.2
    np.testing.assert_allclose(load_scp_entry(ark, off), got["utt1"])


def test_compressed_matrix_constant_max_column():
    """A column pinned at the global max used to wrap the uint16
    percentile bump (pu[i-1]+1 -> 0), voiding the strictly-increasing
    grid and emitting divide-by-zero warnings (regression)."""
    import io
    import warnings
    from pychain_tpu.data.kaldi_features import (read_matrix,
                                                 write_compressed_matrix)
    rng = np.random.RandomState(1)
    mat = rng.randn(40, 4).astype(np.float32)
    mat[:, 2] = mat.max() + 5.0  # nearly-constant column at the max
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any overflow/0-div warning fails
        buf = io.BytesIO()
        write_compressed_matrix(buf, mat, fmt=1)
    buf.seek(0)
    got = read_matrix(buf)
    rng_v = float(mat.max() - mat.min())
    assert np.abs(got - mat).max() <= rng_v / 40


def test_cm_golden_kaldi_layout():
    """Decode a CM payload constructed BY HAND per the Kaldi wire
    format (compressed-matrix.cc): global header, then ALL per-column
    headers (cols x 4 uint16), then all code bytes column after column
    (cols x rows uint8).  Pins the layout independently of our own
    writer, which round-trip tests alone cannot do."""
    import io
    import struct
    from pychain_tpu.data.kaldi_features import read_matrix

    rows, cols = 3, 2
    minv, rng = -1.0, 2.0

    def to_u16(v):
        return int(round((v - minv) / rng * 65535.0))

    # column percentiles chosen on the grid so expectations are exact
    col_p = [(-1.0, -0.5, 0.5, 1.0), (-0.8, 0.0, 0.2, 0.6)]
    headers = b"".join(struct.pack("<4H", *(to_u16(p) for p in ps))
                       for ps in col_p)
    # codes: 0 -> p0, 64 -> p25, 192 -> p75, 255 -> p100
    codes = bytes([0, 64, 192] + [64, 255, 128])
    payload = (b"CM " + struct.pack("<ffii", minv, rng, rows, cols)
               + headers + codes)
    mat = read_matrix(io.BytesIO(payload))
    expect = np.array([
        [-1.0, 0.0],                      # code 0 -> p0 ; 64 -> p25
        [-0.5, 0.6],                      # 64 -> p25 ; 255 -> p100
        [0.5, 0.1],                       # 192 -> p75; 128 -> p25+(p75-p25)*0.5
    ], np.float32)
    np.testing.assert_allclose(mat, expect, atol=2e-4)

    # the C++ reader agrees on the same bytes
    from pychain_tpu.csrc import native
    if native.available():
        import os
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "g.ark")
            with open(path, "wb") as f:
                f.write(b"utt \x00B" + payload)
            got = native.read_feats(path, 4)
            np.testing.assert_allclose(got, expect, atol=2e-4)

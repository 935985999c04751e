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


def test_compressed_matrix_rejected(tmp_path):
    ark = str(tmp_path / "c.ark")
    with open(ark, "wb") as f:
        f.write(b"utt \x00BCM garbage")
    with pytest.raises(NotImplementedError, match="CompressedMatrix"):
        dict(read_feats_ark(ark))

"""Wire-format robustness fuzz: the Python and C++ readers must make
the SAME accept/reject decision on mutated buffers, never crash, and
decode identical payloads whenever both accept (VERDICT r2 item 8).

Mutations cover random byte flips, truncations, extensions, and
adversarial 4-byte count splices (oversized/negative header counts)
over every wire format the package reads: OpenFST VectorFst binaries,
ConstFst binaries (aligned + unaligned, with symbol tables), and Kaldi
feature matrices (FM/DM/CM/CM2/CM3) addressed through scp offsets.

The C++ reader (csrc/pychain_native.cc pc_fst_read / pc_feats_read)
runs IN-PROCESS via ctypes, so any memory-safety bug (OOB read,
bad_alloc abort from a corrupted count) kills the test run — that is
the point.
"""

import os

import numpy as np
import pytest

from pychain_tpu.csrc import native
from pychain_tpu.data.kaldi_features import (load_scp_entry,
                                             write_feats_ark)
from pychain_tpu.graphs.fst import FST
from pychain_tpu.utils.testgraphs import linear_fst, random_fst

if not native.available():          # pragma: no cover
    pytest.skip("native library not built", allow_module_level=True)

N_MUTATIONS = 400                   # per corpus family; 3 families


# ----------------------------------------------------------------------
# harness
# ----------------------------------------------------------------------

def _read_fst_python(path):
    try:
        return FST.read(path)
    except Exception:
        return None


def _read_fst_native(path):
    try:
        return native.read_fst(path)
    except Exception:
        return None


def _fsts_equal(a: FST, b: FST) -> bool:
    if (a.start != b.start or a.num_states != b.num_states
            or a.num_arcs != b.num_arcs):
        return False
    return (np.array_equal(a.final, b.final, equal_nan=True)
            and np.array_equal(a.arc_offsets, b.arc_offsets)
            and np.array_equal(a.ilabels, b.ilabels)
            and np.array_equal(a.olabels, b.olabels)
            and np.array_equal(a.weights, b.weights, equal_nan=True)
            and np.array_equal(a.nextstates, b.nextstates))


def _mutate(rng, buf: bytes) -> bytes:
    """One random corruption of `buf`."""
    b = bytearray(buf)
    kind = rng.randint(5)
    if kind == 0 and len(b):                      # flip 1-8 bytes
        for _ in range(rng.randint(1, 9)):
            b[rng.randint(len(b))] = rng.randint(256)
    elif kind == 1 and len(b) > 1:                # truncate
        del b[rng.randint(1, len(b)):]
    elif kind == 2:                               # extend with junk
        b += bytes(rng.randint(0, 256, size=rng.randint(1, 64),
                               dtype=np.uint8))
    elif kind == 3 and len(b) >= 4:               # splice extreme i32
        off = rng.randint(len(b) - 3)
        val = rng.choice(np.array([0x7FFFFFFF, -1, -2**31, 0x40000000,
                                   1 << 24, 0], np.int64))
        b[off:off + 4] = int(np.int32(val)).to_bytes(4, "little",
                                                     signed=True)
    else:                                         # flip bits in header
        if len(b):
            off = rng.randint(min(len(b), 64))
            b[off] ^= 1 << rng.randint(8)
    return bytes(b)


def _fuzz_fst_corpus(tmp_path, seeds, n_mutations):
    """Both readers must agree accept/reject (and payload on accept)
    over `n_mutations` corruptions of each seed buffer."""
    path = str(tmp_path / "fuzz.fst")
    rng = np.random.RandomState(12345)
    n_accept = n_reject = 0
    for name, buf in seeds:
        # sanity: the unmutated seed must be accepted identically
        with open(path, "wb") as f:
            f.write(buf)
        py0, nat0 = _read_fst_python(path), _read_fst_native(path)
        assert py0 is not None and nat0 is not None, name
        assert _fsts_equal(py0, nat0), name
        for i in range(n_mutations):
            with open(path, "wb") as f:
                f.write(_mutate(rng, buf))
            py = _read_fst_python(path)
            nat = _read_fst_native(path)
            assert (py is None) == (nat is None), (
                f"{name} mutation {i}: python "
                f"{'rejected' if py is None else 'accepted'} but native "
                f"{'rejected' if nat is None else 'accepted'}")
            if py is None:
                n_reject += 1
            else:
                n_accept += 1
                assert _fsts_equal(py, nat), f"{name} mutation {i}"
    return n_accept, n_reject


# ----------------------------------------------------------------------
# corpora
# ----------------------------------------------------------------------

def _vector_fst_seeds():
    out = []
    for tag, fst in (("linear", linear_fst([1, 0, 2, 1])),
                     ("cyclic", random_fst(num_states=7, num_pdfs=5,
                                           max_arcs_per_state=3,
                                           seed=3))):
        import io
        f = io.BytesIO()
        fst.write_stream(f)
        out.append((f"vector-{tag}", f.getvalue()))
    return out


def _const_fst_seeds():
    import io
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_fst import _write_const_fst
    fst = random_fst(num_states=6, num_pdfs=4, max_arcs_per_state=3,
                     seed=11)
    out = []
    for aligned in (True, False):
        f = io.BytesIO()
        _write_const_fst(f, fst, aligned=aligned, symbols=not aligned)
        out.append((f"const-a{int(aligned)}", f.getvalue()))
    return out


def test_fuzz_fst_readers_agree(tmp_path):
    n_acc, n_rej = _fuzz_fst_corpus(
        tmp_path, _vector_fst_seeds() + _const_fst_seeds(), N_MUTATIONS)
    # the corpus must actually exercise both outcomes
    assert n_rej > 100
    assert n_acc > 10, (n_acc, n_rej)


# ----------------------------------------------------------------------
# feature matrices
# ----------------------------------------------------------------------

def _feats_seed_buffers():
    """One ark per format; returns [(name, ark_bytes, offset)]."""
    import io
    rng = np.random.RandomState(7)
    mat = (rng.randn(13, 8) * 4).astype(np.float32)
    out = []
    for fmt, kwargs in (
            ("FM", dict(compress=False)),
            ("CM", dict(compress=True, compression_format=1)),
            ("CM2", dict(compress=True, compression_format=2)),
            ("CM3", dict(compress=True, compression_format=3))):
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".ark",
                                         delete=False) as tf:
            tmp = tf.name
        try:
            offsets = write_feats_ark(tmp, [("utt1", mat)], **kwargs)
            with open(tmp, "rb") as f:
                buf = f.read()
        finally:
            os.unlink(tmp)
        out.append((fmt, buf, offsets["utt1"]))
    return out


def _read_feats_python(path, offset):
    try:
        return load_scp_entry(path, offset, use_native=False)
    except Exception:
        return None


def _read_feats_native(path, offset):
    try:
        return native.read_feats(path, offset)
    except Exception:
        return None


def test_fuzz_feats_readers_agree(tmp_path):
    path = str(tmp_path / "fuzz.ark")
    rng = np.random.RandomState(54321)
    n_accept = n_reject = 0
    for name, buf, offset in _feats_seed_buffers():
        with open(path, "wb") as f:
            f.write(buf)
        py0 = _read_feats_python(path, offset)
        nat0 = _read_feats_native(path, offset)
        assert py0 is not None and nat0 is not None, name
        np.testing.assert_allclose(nat0, py0, rtol=1e-6, atol=1e-6)
        for i in range(N_MUTATIONS):
            mut = bytearray(buf)
            # mutate only at/after the scp offset so the offset stays
            # meaningful (scp consumers seek straight to it)
            tail = _mutate(rng, bytes(mut[offset:]))
            with open(path, "wb") as f:
                f.write(bytes(mut[:offset]) + tail)
            py = _read_feats_python(path, offset)
            nat = _read_feats_native(path, offset)
            assert (py is None) == (nat is None), (
                f"{name} mutation {i}: python "
                f"{'rejected' if py is None else 'accepted'} but native "
                f"{'rejected' if nat is None else 'accepted'}")
            if py is None:
                n_reject += 1
            else:
                n_accept += 1
                assert py.shape == nat.shape, f"{name} mutation {i}"
                np.testing.assert_allclose(
                    np.nan_to_num(nat, nan=0.0, posinf=1e30,
                                  neginf=-1e30),
                    np.nan_to_num(py, nan=0.0, posinf=1e30,
                                  neginf=-1e30),
                    rtol=1e-5, atol=1e-5,
                    err_msg=f"{name} mutation {i}")
    assert n_reject > 100
    assert n_accept > 10, (n_accept, n_reject)

"""Kaldi feature matrix I/O: binary ark/scp readers and writers.

Completes the data pipeline for real corpora: the reference's consumers
(Espresso / pychain_example) feed Kaldi-extracted features (MFCC/fbank
matrices in ``feats.scp`` / ``feats.ark``) into the acoustic model.
Formats implemented directly (no Kaldi dependency):

* binary ark: ``key<space>\\0B FM/DM <i32 rows> <i32 cols> data``
  (FM = float32 matrix, DM = float64; int32s carried with Kaldi's
  1-byte size prefix),
* scp lines: ``key path:offset`` with offset pointing at the ``\\0B``
  marker,
* optional CompressedMatrix is NOT supported (raise cleanly).
"""

from __future__ import annotations

import struct

import numpy as np


def _read_token(f) -> bytes:
    tok = bytearray()
    while True:
        c = f.read(1)
        if not c or c == b" ":
            break
        tok += c
    return bytes(tok)


def _read_basic_int32(f) -> int:
    size = f.read(1)
    if size != b"\x04":
        raise ValueError(f"expected int32 size prefix, got {size!r}")
    return struct.unpack("<i", f.read(4))[0]


def read_matrix(f) -> np.ndarray:
    """Read one Kaldi binary matrix at the current position (after the
    binary marker)."""
    tok = _read_token(f)
    if tok == b"FM":
        dtype = np.dtype("<f4")
    elif tok == b"DM":
        dtype = np.dtype("<f8")
    elif tok == b"CM":
        raise NotImplementedError(
            "Kaldi CompressedMatrix is not supported; re-copy features "
            "with copy-feats --compress=false")
    else:
        raise ValueError(f"unsupported Kaldi matrix token {tok!r}")
    rows = _read_basic_int32(f)
    cols = _read_basic_int32(f)
    data = np.frombuffer(f.read(rows * cols * dtype.itemsize), dtype)
    return data.reshape(rows, cols).astype(np.float32)


def write_matrix(f, mat: np.ndarray) -> None:
    f.write(b"FM ")
    for dim in mat.shape:
        f.write(b"\x04" + struct.pack("<i", dim))
    f.write(np.ascontiguousarray(mat, "<f4").tobytes())


def read_feats_ark(filename: str):
    """Yield (key, (T, D) float32 matrix) pairs from a binary feature ark."""
    with open(filename, "rb") as f:
        while True:
            key = bytearray()
            while True:
                c = f.read(1)
                if not c:
                    return
                if c == b" ":
                    break
                key += c
            marker = f.read(2)
            if marker != b"\x00B":
                raise ValueError("only binary-mode feature arks supported")
            yield key.decode(), read_matrix(f)


def write_feats_ark(filename: str, items) -> dict:
    """Write ``{key: (T, D) array}`` to a binary ark; returns
    ``{key: offset}`` (offset at the binary marker, scp convention)."""
    offsets = {}
    with open(filename, "wb") as f:
        for key, mat in items.items() if isinstance(items, dict) else items:
            f.write(key.encode() + b" ")
            offsets[key] = f.tell()
            f.write(b"\x00B")
            write_matrix(f, np.asarray(mat))
    return offsets


def write_scp(filename: str, ark_path: str, offsets: dict) -> None:
    with open(filename, "w") as f:
        for key, off in offsets.items():
            f.write(f"{key} {ark_path}:{off}\n")


def read_scp(filename: str):
    """Parse an scp file into [(key, path, offset)].

    Kaldi rxfilenames may be bare paths (``key path.ark``) or carry a
    byte offset (``key path.ark:12345``); a bare path reads from offset
    0 — after any leading binary header marker (see load_scp_entry).
    """
    out = []
    with open(filename) as f:
        for line in f:
            parts = line.strip().split(None, 1)
            if not parts:
                continue
            key, rx = parts
            path, sep, off = rx.rpartition(":")
            if sep and off.isdigit():
                out.append((key, path, int(off)))
            else:
                out.append((key, rx, 0))
    return out


def load_scp_entry(path: str, offset: int) -> np.ndarray:
    """Random-access one feature matrix via its scp offset."""
    with open(path, "rb") as f:
        f.seek(offset)
        marker = f.read(2)
        if marker != b"\x00B":
            raise ValueError("scp offset does not point at a binary marker")
        return read_matrix(f)

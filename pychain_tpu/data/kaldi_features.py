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
* CompressedMatrix (``CM``/``CM2``/``CM3`` tokens): real corpora ship
  feats.ark written with copy-feats --compress=true.  Decoded per the
  Kaldi format spec (src/matrix/compressed-matrix.h): a global
  {min, range, rows, cols} header, then either per-column uint16
  percentile headers + uint8 payload in the 64/128/63 piecewise code
  (CM), plain uint16 (CM2), or plain uint8 (CM3).
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


def _shape_ok(f, tok: bytes, rows: int, cols: int) -> None:
    """Reject corrupted (negative/oversized) shapes BEFORE allocating:
    a header-declared element count costs payload bytes, so counts
    beyond the remaining file must fail cleanly.  Mirrors the C++
    reader's feat_shape_ok (csrc/pychain_native.cc) so accept/reject
    decisions agree between the two decoders."""
    if rows < 0 or cols < 0:
        raise ValueError(f"negative matrix shape {rows}x{cols}")
    from ..graphs.fst import _remaining_bytes
    rem = _remaining_bytes(f)
    n = rows * cols
    need = {b"FM": 4 * n, b"DM": 8 * n, b"CM2": 2 * n, b"CM3": n,
            b"CM": 8 * cols + n}[tok]
    if need > rem:
        raise ValueError(
            f"matrix shape {rows}x{cols} ({tok!r}) exceeds the "
            f"remaining {rem} payload bytes")


def read_matrix(f) -> np.ndarray:
    """Read one Kaldi binary matrix at the current position (after the
    binary marker)."""
    tok = _read_token(f)
    if tok == b"FM":
        dtype = np.dtype("<f4")
    elif tok == b"DM":
        dtype = np.dtype("<f8")
    elif tok in (b"CM", b"CM2", b"CM3"):
        return _read_compressed_matrix(f, tok)
    else:
        raise ValueError(f"unsupported Kaldi matrix token {tok!r}")
    rows = _read_basic_int32(f)
    cols = _read_basic_int32(f)
    _shape_ok(f, tok, rows, cols)
    data = np.frombuffer(f.read(rows * cols * dtype.itemsize), dtype,
                         count=rows * cols)
    return data.reshape(rows, cols).astype(np.float32)


# ----------------------------------------------------------------------
# CompressedMatrix (kaldi src/matrix/compressed-matrix.{h,cc})
# ----------------------------------------------------------------------
#
# GlobalHeader (raw, no size prefixes): f32 min_value, f32 range,
# i32 num_rows, i32 num_cols.  Three payload formats:
#   CM  (kOneByteWithColHeaders): per column, 4 uint16 percentiles
#       (p0, p25, p75, p100 on the min+range*u/65535 grid) followed by
#       num_rows uint8 codes, columns stored sequentially; a code c
#       maps piecewise-linearly over [p0,p25] (c in 0..64),
#       [p25,p75] (64..192), [p75,p100] (192..255).
#   CM2 (kTwoByte):  uint16 per element, row-major, min+range*u/65535.
#   CM3 (kOneByte):  uint8  per element, row-major, min+range*u/255.

def _read_compressed_matrix(f, tok) -> np.ndarray:
    hdr = f.read(16)
    if len(hdr) != 16:
        raise ValueError("truncated CompressedMatrix header")
    min_value, rng, rows, cols = struct.unpack("<ffii", hdr)
    _shape_ok(f, tok, rows, cols)
    if tok == b"CM2":
        u = np.frombuffer(f.read(rows * cols * 2), "<u2",
                          count=rows * cols)
        return (min_value + rng * u.astype(np.float32) / 65535.0) \
            .reshape(rows, cols)
    if tok == b"CM3":
        u = np.frombuffer(f.read(rows * cols), np.uint8,
                          count=rows * cols)
        return (min_value + rng * u.astype(np.float32) / 255.0) \
            .reshape(rows, cols)
    out = np.empty((rows, cols), np.float32)
    # Kaldi layout (compressed-matrix.cc): ALL PerColHeaders first
    # (num_cols x 4 uint16), then all code bytes, one column after
    # another (num_cols x num_rows uint8) — NOT interleaved per column.
    headers = np.frombuffer(f.read(cols * 8), "<u2",
                            count=cols * 4).reshape(cols, 4)
    codes = np.frombuffer(f.read(cols * rows), np.uint8,
                          count=cols * rows)
    for c in range(cols):
        pu = headers[c]
        p0, p25, p75, p100 = (
            min_value + rng * pu.astype(np.float32) / 65535.0)
        code = codes[c * rows:(c + 1) * rows].astype(np.float32)
        lo = p0 + (p25 - p0) * (code / 64.0)
        mid = p25 + (p75 - p25) * ((code - 64.0) / 128.0)
        hi = p75 + (p100 - p75) * ((code - 192.0) / 63.0)
        out[:, c] = np.where(code <= 64, lo,
                             np.where(code <= 192, mid, hi))
    return out


def _float_to_u16(v, min_value, rng):
    return np.clip((v - min_value) / max(rng, 1e-20) * 65535.0,
                   0, 65535).astype("<u2")


def write_compressed_matrix(f, mat: np.ndarray, fmt: int = 1) -> None:
    """Encode a matrix in the CompressedMatrix wire format (for tests
    and for writing compact feature arks; fmt in {1, 2, 3})."""
    mat = np.asarray(mat, np.float32)
    rows, cols = mat.shape
    min_value = float(mat.min()) if mat.size else 0.0
    rng = max(float(mat.max()) - min_value, 1e-5) if mat.size else 1.0
    tok = {1: b"CM ", 2: b"CM2 ", 3: b"CM3 "}[fmt]
    f.write(tok)
    f.write(struct.pack("<ffii", min_value, rng, rows, cols))
    if fmt == 2:
        f.write(_float_to_u16(mat, min_value, rng).tobytes())
        return
    if fmt == 3:
        u = np.clip((mat - min_value) / rng * 255.0, 0, 255)
        f.write(u.astype(np.uint8).tobytes())
        return
    header_parts, code_parts = [], []
    for c in range(cols):
        col = mat[:, c]
        srt = np.sort(col)
        quart = max(rows // 4, 1) if rows else 0
        pu = _float_to_u16(
            np.array([srt[0], srt[min(quart, rows - 1)],
                      srt[min(3 * quart, rows - 1)], srt[-1]]),
            min_value, rng)
        # percentile grid points must be strictly increasing to avoid
        # zero-width segments (kaldi spaces them the same way); work in
        # python ints and cap from above so the uint16 "+1" bumps can
        # neither wrap at 65535 nor break strictness near the top
        pv = [int(v) for v in pu]
        for i in range(1, 4):
            pv[i] = max(pv[i], pv[i - 1] + 1)
        for i in range(3, -1, -1):
            pv[i] = min(pv[i], 65535 - (3 - i))
        pu = np.asarray(pv, np.uint16)
        p0, p25, p75, p100 = (min_value
                              + rng * pu.astype(np.float32) / 65535.0)
        code = np.where(
            col <= p25,
            np.clip((col - p0) / (p25 - p0) * 64.0, 0, 64),
            np.where(
                col <= p75,
                64.0 + np.clip((col - p25) / (p75 - p25) * 128.0,
                               0, 128),
                192.0 + np.clip((col - p75) / (p100 - p75) * 63.0,
                                0, 63)))
        header_parts.append(pu.tobytes())
        code_parts.append(np.rint(code).astype(np.uint8).tobytes())
    # Kaldi layout: all column headers, then all column code bytes
    f.write(b"".join(header_parts))
    f.write(b"".join(code_parts))


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


def write_feats_ark(filename: str, items, compress: bool = False,
                    compression_format: int = 1) -> dict:
    """Write ``{key: (T, D) array}`` to a binary ark; returns
    ``{key: offset}`` (offset at the binary marker, scp convention).

    ``compress=True`` stores CompressedMatrix payloads (the equivalent
    of Kaldi's ``copy-feats --compress=true``; ~4x smaller at <1%
    feature distortion in the default per-column-header format)."""
    offsets = {}
    with open(filename, "wb") as f:
        for key, mat in items.items() if isinstance(items, dict) else items:
            f.write(key.encode() + b" ")
            offsets[key] = f.tell()
            f.write(b"\x00B")
            if compress:
                write_compressed_matrix(f, np.asarray(mat),
                                        fmt=compression_format)
            else:
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


def load_scp_entry(path: str, offset: int,
                   use_native: bool = True) -> np.ndarray:
    """Random-access one feature matrix via its scp offset.

    Uses the C++ decoder (csrc/pychain_native.cc pc_feats_read) when
    the native library is built; this Python path is the spec and the
    always-available fallback."""
    if use_native:
        from ..csrc import native
        if native.available():
            return native.read_feats(path, offset)
    with open(path, "rb") as f:
        f.seek(offset)
        marker = f.read(2)
        if marker != b"\x00B":
            raise ValueError("scp offset does not point at a binary marker")
        return read_matrix(f)


def scan_feats_ark(path: str):
    """List (key, offset) pairs of a feature ark without decoding (for
    scp construction); native-accelerated when built."""
    from ..csrc import native
    if native.available():
        return native.scan_feats_ark(path)
    out = []
    with open(path, "rb") as f:
        while True:
            key = bytearray()
            while True:
                c = f.read(1)
                if not c:
                    return out
                if c == b" ":
                    break
                key += c
            off = f.tell()
            marker = f.read(2)
            if marker != b"\x00B":
                raise ValueError("only binary-mode feature arks supported")
            read_matrix(f)
            out.append((key.decode(), off))
    return out

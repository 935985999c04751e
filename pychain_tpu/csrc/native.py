"""ctypes bindings for the native runtime (libpychain_native.so).

Build with ``make -C pychain_tpu/csrc`` (g++, no dependencies).  Every
entry point has a pure-Python twin in ``pychain_tpu.graphs`` /
``pychain_tpu.utils.oracle``; tests assert parity between the two, and
all functionality degrades gracefully when the library is absent
(``native.available() -> False``).

The native pieces mirror the reference's native surface (SURVEY.md §2):
FST deserialisation incl. Kaldi ark offsets, FST->tensor compilation,
leaky-prior power iteration (openfst_binding/src/fstext.cc), and a CPU
forward-backward engine usable as an oracle/fallback (the role of the
reference's CPU path in pytorch_binding/src).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libpychain_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pc_fst_read.restype = ctypes.c_void_p
        lib.pc_fst_read.argtypes = [ctypes.c_char_p, ctypes.c_long]
        lib.pc_fst_free.argtypes = [ctypes.c_void_p]
        for name in ("pc_fst_num_states", "pc_fst_num_arcs", "pc_fst_start"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [ctypes.c_void_p]
        lib.pc_feats_probe.restype = ctypes.c_int
        lib.pc_feats_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.pc_feats_read.restype = ctypes.c_int
        lib.pc_feats_read.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_float)]
        lib.pc_feats_scan.restype = ctypes.c_long
        lib.pc_feats_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_char_p, ctypes.c_long]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build(quiet: bool = True) -> bool:
    """Best-effort build of the native library via make."""
    import subprocess
    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(__file__)],
            check=True, capture_output=quiet)
    except Exception:
        return False
    global _lib
    _lib = None
    return available()


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def read_fst(path: str, offset: int = -1):
    """Read an OpenFST binary (or ark at offset) into a pychain_tpu FST."""
    from ..graphs.fst import FST

    lib = _load()
    h = lib.pc_fst_read(path.encode(), offset)
    if not h:
        raise ValueError(f"failed to read FST from {path!r} @ {offset}")
    try:
        S = lib.pc_fst_num_states(h)
        K = lib.pc_fst_num_arcs(h)
        start = lib.pc_fst_start(h)
        final = np.empty(S, np.float32)
        offsets = np.empty(S + 1, np.int64)
        il = np.empty(K, np.int32)
        ol = np.empty(K, np.int32)
        w = np.empty(K, np.float32)
        ns = np.empty(K, np.int32)
        if S:
            lib.pc_fst_fields(
                ctypes.c_void_p(h), _ptr(final, ctypes.c_float),
                _ptr(offsets, ctypes.c_int64), _ptr(il, ctypes.c_int32),
                _ptr(ol, ctypes.c_int32), _ptr(w, ctypes.c_float),
                _ptr(ns, ctypes.c_int32))
        return FST(start=start, final=final, arc_offsets=offsets,
                   ilabels=il, olabels=ol, weights=w, nextstates=ns)
    finally:
        lib.pc_fst_free(ctypes.c_void_p(h))


def write_fst(fst, path: str) -> None:
    lib = _load()
    rc = lib.pc_fst_write(
        path.encode(), fst.start, fst.num_states,
        ctypes.c_int64(fst.num_arcs), _ptr(fst.final, ctypes.c_float),
        _ptr(fst.arc_offsets, ctypes.c_int64),
        _ptr(np.ascontiguousarray(fst.ilabels), ctypes.c_int32),
        _ptr(np.ascontiguousarray(fst.olabels), ctypes.c_int32),
        _ptr(np.ascontiguousarray(fst.weights), ctypes.c_float),
        _ptr(np.ascontiguousarray(fst.nextstates), ctypes.c_int32))
    if rc != 0:
        raise IOError(f"failed to write FST to {path!r}")


def _fst_handle(fst):
    """Round-trip a Python FST into a native handle via a temp file."""
    import tempfile
    lib = _load()
    with tempfile.NamedTemporaryFile(suffix=".fst", delete=False) as f:
        tmp = f.name
    try:
        fst.write(tmp)
        h = lib.pc_fst_read(tmp.encode(), -1)
        if not h:
            raise ValueError("native reload failed")
        return h
    finally:
        os.unlink(tmp)


def compile_fst(fst, log_domain: bool = False):
    """Native fst->tensor compilation; returns a CompiledGraph matching
    pychain_tpu.graphs.compiler.compile_fst."""
    from ..graphs.compiler import CompiledGraph

    lib = _load()
    h = _fst_handle(fst)
    try:
        S = lib.pc_fst_num_states(h)
        K = lib.pc_fst_num_arcs(h)
        fwd_t = np.empty((K, 3), np.int32)
        fwd_p = np.empty(K, np.float32)
        fwd_i = np.empty((S, 2), np.int32)
        bwd_t = np.empty((K, 3), np.int32)
        bwd_p = np.empty(K, np.float32)
        bwd_i = np.empty((S, 2), np.int32)
        final = np.empty(S, np.float32)
        rc = lib.pc_fst_compile(
            ctypes.c_void_p(h), int(log_domain),
            _ptr(fwd_t, ctypes.c_int32), _ptr(fwd_p, ctypes.c_float),
            _ptr(fwd_i, ctypes.c_int32), _ptr(bwd_t, ctypes.c_int32),
            _ptr(bwd_p, ctypes.c_float), _ptr(bwd_i, ctypes.c_int32),
            _ptr(final, ctypes.c_float))
        if rc != 0:
            raise ValueError("FST has epsilon (ilabel=0) arcs")
        return CompiledGraph(
            num_states=S, start_state=lib.pc_fst_start(h),
            log_domain=log_domain,
            forward_transitions=fwd_t, forward_transition_probs=fwd_p,
            forward_transition_indices=fwd_i,
            backward_transitions=bwd_t, backward_transition_probs=bwd_p,
            backward_transition_indices=bwd_i, final_probs=final)
    finally:
        lib.pc_fst_free(ctypes.c_void_p(h))


def leaky_probs(fst, num_iters: int = 100) -> np.ndarray:
    lib = _load()
    h = _fst_handle(fst)
    try:
        S = lib.pc_fst_num_states(h)
        out = np.empty(S, np.float32)
        rc = lib.pc_fst_leaky(ctypes.c_void_p(h), num_iters,
                              _ptr(out, ctypes.c_float))
        if rc != 0:
            raise ValueError("state probability mass out of range")
        return out
    finally:
        lib.pc_fst_free(ctypes.c_void_p(h))


def fwdbwd_prob(px, lengths, fwd_trans, fwd_probs, bwd_trans, bwd_probs,
                init, final, leaky, leaky_coeff=1e-5):
    """Native CPU fwd-bwd, prob domain, shared graph.
    px (B,T,P) float32; returns (objf (B,), gamma (B,T,P), ok)."""
    lib = _load()
    B, T, P = px.shape
    S = init.shape[0]
    K = fwd_probs.shape[0]
    objf = np.zeros(B, np.float32)
    gamma = np.zeros((B, T, P), np.float32)
    c = np.ascontiguousarray
    rc = lib.pc_fwdbwd_prob(
        B, T, P, S, ctypes.c_int64(K),
        _ptr(c(fwd_trans), ctypes.c_int32), _ptr(c(fwd_probs), ctypes.c_float),
        _ptr(c(bwd_trans), ctypes.c_int32), _ptr(c(bwd_probs), ctypes.c_float),
        _ptr(c(init), ctypes.c_float), _ptr(c(final), ctypes.c_float),
        _ptr(c(leaky), ctypes.c_float), ctypes.c_float(leaky_coeff),
        _ptr(c(px), ctypes.c_float),
        _ptr(c(lengths.astype(np.int32)), ctypes.c_int32),
        _ptr(objf, ctypes.c_float), _ptr(gamma, ctypes.c_float))
    return objf, gamma, rc == 0


def read_feats(path: str, offset: int) -> np.ndarray:
    """Decode one Kaldi feature matrix (FM/DM/CM/CM2/CM3) at an scp
    offset (pointing at the \\0B marker).  Native fast path of
    ``data.kaldi_features.load_scp_entry``."""
    lib = _load()
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    if lib.pc_feats_probe(path.encode(), ctypes.c_long(offset),
                          ctypes.byref(rows), ctypes.byref(cols)) != 0:
        raise ValueError(f"bad feature matrix at {path!r}:{offset}")
    out = np.empty((rows.value, cols.value), np.float32)
    if lib.pc_feats_read(path.encode(), ctypes.c_long(offset),
                         _ptr(out, ctypes.c_float)) != 0:
        raise ValueError(f"failed to decode matrix at {path!r}:{offset}")
    return out


def scan_feats_ark(path: str, _initial_keys_cap: int = 1 << 22):
    """List (key, offset) pairs of a feature ark without decoding the
    payloads (native fast path for scp construction).  The key buffer
    grows automatically (the C++ side returns -2 rather than dropping
    a key that does not fit, which would misalign keys vs offsets)."""
    lib = _load()
    n = lib.pc_feats_scan(path.encode(), ctypes.c_long(0), None, None,
                          ctypes.c_long(0))
    if n < 0:
        raise ValueError(f"malformed feature ark {path!r}")
    if n == 0:
        return []
    offsets = np.empty(n, np.int64)
    keys_cap = _initial_keys_cap
    while True:
        keys = ctypes.create_string_buffer(keys_cap)
        n2 = lib.pc_feats_scan(path.encode(), ctypes.c_long(n),
                               _ptr(offsets, ctypes.c_int64), keys,
                               ctypes.c_long(keys_cap))
        if n2 != -2:          # -2: key buffer too small — grow and retry
            break
        keys_cap *= 2
    if n2 != n:
        raise ValueError(f"feature ark changed while scanning {path!r}")
    out = []
    pos = 0
    for i in range(n):
        end = keys.raw.index(b"\x00", pos)
        out.append((keys.raw[pos:end].decode(), int(offsets[i])))
        pos = end + 1
    return out


def fwdbwd_log(x, lengths, fwd_trans, fwd_probs, bwd_trans, bwd_probs,
               init, final):
    """Native CPU fwd-bwd, log domain, per-sequence graphs (B leading
    dim on graph arrays).  Returns (objf (B,), gamma (B,T,P), ok)."""
    lib = _load()
    B, T, P = x.shape
    S = init.shape[1]
    K = fwd_probs.shape[1]
    objf = np.zeros(B, np.float32)
    gamma = np.zeros((B, T, P), np.float32)
    c = np.ascontiguousarray
    rc = lib.pc_fwdbwd_log(
        B, T, P, S, ctypes.c_int64(K),
        _ptr(c(fwd_trans), ctypes.c_int32), _ptr(c(fwd_probs), ctypes.c_float),
        _ptr(c(bwd_trans), ctypes.c_int32), _ptr(c(bwd_probs), ctypes.c_float),
        _ptr(c(init), ctypes.c_float), _ptr(c(final), ctypes.c_float),
        _ptr(c(x), ctypes.c_float),
        _ptr(c(lengths.astype(np.int32)), ctypes.c_int32),
        _ptr(objf, ctypes.c_float), _ptr(gamma, ctypes.c_float))
    return objf, gamma, rc == 0

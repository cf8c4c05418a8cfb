"""ctypes bindings to the native host library (native/sampler_native.cpp).

The C++ library accelerates the serial host-side hot paths — factor-file
parsing and greedy coloring — mirroring the reference's native loader/
compiler (ref: src/binary_format.cc, src/factor_graph.cc — recalled).
Every entry point has a pure-Python fallback; `available()` gates usage so
the package works without the .so (it is built by `make -C native`).
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from . import format_spec as fs

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "native", "libsampler_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    i64 = ctypes.c_int64
    lib.sampler_count_factors.restype = i64
    lib.sampler_parse_factors.restype = i64
    lib.sampler_greedy_color.restype = i64
    lib.sampler_native_version.restype = ctypes.c_char_p
    _LIB = lib
    return _LIB


def available() -> bool:
    """Native library usable?  SAMPLER_TPU_NATIVE=0 forces the pure-Python
    fallbacks (used by the native/python parity tests)."""
    if os.environ.get("SAMPLER_TPU_NATIVE", "1") == "0":
        return False
    return _load() is not None


def version() -> Optional[str]:
    lib = _load()
    return lib.sampler_native_version().decode() if lib else None


def _cat_table() -> np.ndarray:
    n = max(fs.ALL_FACTOR_FUNCS) + 1
    t = np.zeros(n, np.uint8)
    for f in fs.CATEGORICAL_FUNCS:
        t[f] = 1
    return t


def parse_factors(buf: bytes):
    """Native factor-file parse; returns same tuple as io.binary.read_factors
    or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    data = np.frombuffer(buf, np.uint8)
    cat = _cat_table()
    nf = ctypes.c_int64()
    ne = ctypes.c_int64()
    rc = lib.sampler_count_factors(
        data.ctypes.data_as(ctypes.c_void_p), len(data),
        cat.ctypes.data_as(ctypes.c_void_p), len(cat),
        ctypes.byref(nf), ctypes.byref(ne))
    if rc != 0:
        raise ValueError(f"malformed factors file (native rc={rc})")
    F, E = nf.value, ne.value
    f_type = np.empty(F, np.int32)
    f_wid = np.empty(F, np.int32)
    f_feat = np.empty(F, np.float64)
    f_ptr = np.empty(F + 1, np.int64)
    e_vid = np.empty(E, np.int64)
    e_ispos = np.empty(E, np.uint8)
    e_eq = np.empty(E, np.int64)
    lib.sampler_parse_factors(
        data.ctypes.data_as(ctypes.c_void_p), len(data),
        cat.ctypes.data_as(ctypes.c_void_p), len(cat),
        f_type.ctypes.data_as(ctypes.c_void_p),
        f_wid.ctypes.data_as(ctypes.c_void_p),
        f_feat.ctypes.data_as(ctypes.c_void_p),
        f_ptr.ctypes.data_as(ctypes.c_void_p),
        e_vid.ctypes.data_as(ctypes.c_void_p),
        e_ispos.ctypes.data_as(ctypes.c_void_p),
        e_eq.ctypes.data_as(ctypes.c_void_p))
    return (f_type, f_wid, f_feat, f_ptr, e_vid, e_ispos.astype(bool), e_eq)


def greedy_color(n_vars: int, f_ptr: np.ndarray, e_vid: np.ndarray):
    """Native greedy coloring; returns int32 [V] colors or None."""
    lib = _load()
    if lib is None:
        return None
    f_ptr = np.ascontiguousarray(f_ptr, np.int64)
    e_vid = np.ascontiguousarray(e_vid, np.int64)
    colors = np.empty(n_vars, np.int32)
    n = lib.sampler_greedy_color(
        ctypes.c_int64(n_vars), ctypes.c_int64(len(f_ptr) - 1),
        f_ptr.ctypes.data_as(ctypes.c_void_p),
        e_vid.ctypes.data_as(ctypes.c_void_p),
        colors.ctypes.data_as(ctypes.c_void_p))
    if n <= 0:
        raise RuntimeError("native coloring failed")
    return colors


def build_streams(v_fidx, f_vids, f_ispos, f_eqpred, f_mask, f_type,
                  f_arity, f_wid, f_feat, f_minpos, f_touch,
                  outs: dict, P: int, dummy_pos: int, do_affine: bool,
                  a_cols: int | None = None,
                  row_to_pos: tuple | None = None,
                  n_threads: int = 0) -> bool:
    """Native multithreaded fill of one tier's color-major incidence
    streams.

    ``outs`` maps field name -> preallocated array VIEWS shaped
    [n_rows, D(, A_cols...)] (compile.py passes its [C, B_t, ...] outputs
    reshaped flat).  ``a_cols``: columns emitted (tier max arity; the f_*
    arrays keep their global-arity row stride).  ``row_to_pos``
    = (B_full, Bt, off_t): tier row r sits at global position
    (r // Bt) * B_full + off_t + (r % Bt).  Returns False when the library
    is unavailable (caller falls back to the numpy chunk loop).
    Sparse-combination streams are NOT handled here — compile.py keeps
    those on the numpy path.
    """
    lib = _load() if available() else None
    if lib is None or not hasattr(lib, "sampler_build_streams"):
        return False
    if version() != "sampler-native-0.3":
        return False                       # stale .so: wrong ABI
    lib.sampler_build_streams.restype = ctypes.c_int64
    n_rows, D = v_fidx.shape
    A_stride = f_vids.shape[1]
    A = a_cols if a_cols is not None else A_stride
    if row_to_pos is None:
        row_to_pos = (n_rows, n_rows, 0)   # rows ARE positions (one tier)
    B_full, Bt, off_t = row_to_pos
    eq = outs.get("cs_eq")
    eq_is16 = 1 if (eq is not None and eq.dtype == np.int16) else 0
    if eq is not None and f_eqpred.dtype != eq.dtype:
        raise ValueError("f_eqpred dtype must match cs_eq dtype")

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    null = ctypes.c_void_p()
    rc = lib.sampler_build_streams(
        ctypes.c_int64(n_rows), ctypes.c_int64(D), ctypes.c_int64(A),
        ctypes.c_int64(A_stride),
        ctypes.c_int64(P), ctypes.c_int64(dummy_pos),
        ctypes.c_int64(B_full), ctypes.c_int64(Bt), ctypes.c_int64(off_t),
        ctypes.c_int64(eq_is16), ctypes.c_int64(1 if do_affine else 0),
        ctypes.c_int64(n_threads),
        ptr(v_fidx), ptr(f_vids), ptr(f_ispos),
        ptr(f_eqpred) if eq is not None else null,
        ptr(f_mask), ptr(f_type), ptr(f_arity), ptr(f_wid), ptr(f_feat),
        ptr(f_minpos), ptr(f_touch),
        ptr(outs["cs_nbr"]), ptr(outs["cs_ismine"]), ptr(outs["cs_hmask"]),
        ptr(outs["cs_pos"]), ptr(outs["cs_mask"]),
        ptr(eq) if eq is not None else null,
        ptr(outs["cs_type"]), ptr(outs["cs_arity"]), ptr(outs["cs_wid"]),
        ptr(outs["cs_feat"]), ptr(outs["cs_gowner"]), ptr(outs["cs_gtouch"]),
        ptr(outs["ab_a"]) if do_affine else null,
        ptr(outs["ab_b"]) if do_affine else null)
    if rc != 0:
        raise RuntimeError(f"native build_streams failed (rc={rc})")
    return True

"""
Native host kernels (C++), loaded via ctypes.

The compute path is JAX/XLA; this library accelerates the *host data plane*
(the role of the reference's Rust accel, src/accel/): CSR assembly and
transpose, hash-based ID lookup, verified negative sampling, argtopn.

The shared library is built on demand with g++ (see ``build_native``); all
callers fall back to NumPy implementations when it is unavailable, so the
framework remains pure-Python-portable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["available", "coo_to_csr", "transpose_csr", "IdIndex", "sample_negatives", "argtopn", "build_native"]

_HERE = Path(__file__).parent
_SO = _HERE / "libnative.so"
_SRC = _HERE / "native.cpp"
_lib = None
_lock = threading.Lock()
_tried = False


def build_native(force: bool = False) -> bool:
    """Compile the native library with g++; returns success."""
    if _SO.exists() and not force and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(_SO)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("LKT_NO_NATIVE"):
            return None
        if not build_native():
            return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.coo_to_csr.restype = ctypes.c_int
        lib.coo_to_csr.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p, i32p, i64p]
        lib.transpose_csr.restype = ctypes.c_int
        lib.transpose_csr.argtypes = [i64p, i32p, ctypes.c_int64, ctypes.c_int64, i64p, i32p, i64p]
        lib.id_index_create.restype = ctypes.c_void_p
        lib.id_index_create.argtypes = [i64p, ctypes.c_int64]
        lib.id_index_destroy.argtypes = [ctypes.c_void_p]
        lib.id_index_lookup.argtypes = [ctypes.c_void_p, i64p, ctypes.c_int64, i32p]
        lib.sample_negatives.argtypes = [
            i64p, i32p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_int32, i32p,
        ]
        lib.argtopn.restype = ctypes.c_int64
        lib.argtopn.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64, i64p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


def coo_to_csr(rows: np.ndarray, cols: np.ndarray, nrows: int, ncols: int):
    """Sorted CSR assembly; returns (rowptr i64, colind i32, perm i64) or None."""
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    nnz = len(rows)
    rowptr = np.zeros(nrows + 1, dtype=np.int64)
    colind = np.zeros(nnz, dtype=np.int32)
    perm = np.zeros(nnz, dtype=np.int64)
    rc = lib.coo_to_csr(
        _ptr(rows, ctypes.c_int64), _ptr(cols, ctypes.c_int64), nnz, nrows, ncols,
        _ptr(rowptr, ctypes.c_int64), _ptr(colind, ctypes.c_int32), _ptr(perm, ctypes.c_int64),
    )
    if rc != 0:
        raise ValueError(f"coo_to_csr failed: index out of bounds (code {rc})")
    return rowptr, colind, perm


def transpose_csr(rowptr: np.ndarray, colind: np.ndarray, nrows: int, ncols: int):
    """CSR transpose; returns (rowptr, colind, perm) or None."""
    lib = _load()
    if lib is None:
        return None
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colind = np.ascontiguousarray(colind, dtype=np.int32)
    nnz = int(rowptr[-1])
    out_rowptr = np.zeros(ncols + 1, dtype=np.int64)
    out_colind = np.zeros(nnz, dtype=np.int32)
    perm = np.zeros(nnz, dtype=np.int64)
    lib.transpose_csr(
        _ptr(rowptr, ctypes.c_int64), _ptr(colind, ctypes.c_int32), nrows, ncols,
        _ptr(out_rowptr, ctypes.c_int64), _ptr(out_colind, ctypes.c_int32), _ptr(perm, ctypes.c_int64),
    )
    return out_rowptr, out_colind, perm


class IdIndex:
    """Hash-based int64 ID -> number index (reference: data/index.rs)."""

    def __init__(self, ids: np.ndarray):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._ids = np.ascontiguousarray(ids, dtype=np.int64)
        self._h = lib.id_index_create(_ptr(self._ids, ctypes.c_int64), len(self._ids))

    def lookup(self, keys: np.ndarray) -> np.ndarray:
        keys = np.ascontiguousarray(keys, dtype=np.int64)
        out = np.empty(len(keys), dtype=np.int32)
        self._lib.id_index_lookup(self._h, _ptr(keys, ctypes.c_int64), len(keys), _ptr(out, ctypes.c_int32))
        return out

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.id_index_destroy(self._h)
            self._h = None


def sample_negatives(rowptr, colind, rows, n: int, n_cols: int, seed: int, max_attempts: int = 50):
    lib = _load()
    if lib is None:
        return None
    rowptr = np.ascontiguousarray(rowptr, dtype=np.int64)
    colind = np.ascontiguousarray(colind, dtype=np.int32)
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    out = np.empty((len(rows), n), dtype=np.int32)
    lib.sample_negatives(
        _ptr(rowptr, ctypes.c_int64), _ptr(colind, ctypes.c_int32), _ptr(rows, ctypes.c_int64),
        len(rows), n, n_cols, ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF), max_attempts,
        _ptr(out, ctypes.c_int32),
    )
    return out


def argtopn(values: np.ndarray, n: int):
    lib = _load()
    if lib is None:
        return None
    values = np.ascontiguousarray(values, dtype=np.float32)
    out = np.empty(min(n, len(values)), dtype=np.int64)
    k = lib.argtopn(_ptr(values, ctypes.c_float), len(values), len(out), _ptr(out, ctypes.c_int64))
    return out[:k]

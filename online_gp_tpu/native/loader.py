"""ctypes bindings for the native stream loader (with pure-python fallback).

Builds ``stream_loader.cpp`` with g++ on first use (cached next to the
module); every entry point degrades to numpy if the toolchain or the
shared object is unavailable, so the framework stays importable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "stream_loader.cpp")
_SO = os.path.join(_HERE, "_stream_loader.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO
    except Exception:
        return None


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        path = _SO if os.path.exists(_SO) else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.csv_dims.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.csv_dims.restype = ctypes.c_int
        lib.csv_read.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64]
        lib.csv_read.restype = ctypes.c_int
        lib.stream_create.argtypes = [ctypes.c_int64, ctypes.c_int, ctypes.c_uint64]
        lib.stream_create.restype = ctypes.c_void_p
        lib.stream_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
        lib.stream_next.restype = ctypes.c_int64
        lib.stream_destroy.argtypes = [ctypes.c_void_p]
        lib.gather_rows.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
                                    ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _lib() is not None


def fast_csv_read(path: str, skip_header: int = 1) -> np.ndarray:
    """Parse a numeric CSV to a float32 array (native when possible).

    Lines longer than the native parser's 1 MiB buffer make it return a
    distinct rc (3); those files fall back to numpy rather than being
    silently mis-parsed.
    """
    lib = _lib()
    if lib is None:
        return np.loadtxt(path, delimiter=",", skiprows=skip_header, dtype=np.float32)
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = lib.csv_dims(path.encode(), skip_header, ctypes.byref(rows), ctypes.byref(cols))
    if rc == 1:
        raise FileNotFoundError(path)
    if rc == 0:
        out = np.empty((rows.value, cols.value), np.float32)
        rc = lib.csv_read(path.encode(), skip_header,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rows.value, cols.value)
        if rc == 0:
            return out
    # over-long line or short read: numpy is slower but always correct
    return np.loadtxt(path, delimiter=",", skiprows=skip_header, dtype=np.float32)


class BatchStream:
    """Shuffled repeating mini-batch stream over host arrays.

    Native Fisher-Yates ring + memcpy row gather when the .so is present,
    numpy otherwise. Use to feed host batches into a jitted update loop.
    """

    def __init__(self, *arrays: np.ndarray, batch_size: int, shuffle: bool = True, seed: int = 0):
        # dtypes are preserved: the native memcpy gather is used only for
        # arrays that are already float32; everything else (float64 data,
        # integer labels) is gathered by numpy fancy indexing on the
        # original array
        self.arrays = [np.ascontiguousarray(a) for a in arrays]
        n = len(self.arrays[0])
        assert all(len(a) == n for a in self.arrays)
        self.n = n
        self.batch_size = batch_size
        self._lib = _lib()
        if self._lib is not None:
            self._handle = self._lib.stream_create(n, int(shuffle), seed)
            self._idx_buf = np.empty((batch_size,), np.int64)
        else:
            self._rng = np.random.default_rng(seed)
            self._perm = self._rng.permutation(n) if shuffle else np.arange(n)
            self._pos = 0
            self._shuffle = shuffle

    def next(self) -> Tuple[np.ndarray, ...]:
        bs = self.batch_size
        if self._lib is not None:
            self._lib.stream_next(
                self._handle, self._idx_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), bs
            )
            outs = []
            for a in self.arrays:
                if a.dtype == np.float32:
                    out = np.empty((bs,) + a.shape[1:], np.float32)
                    cols = int(np.prod(a.shape[1:])) if a.ndim > 1 else 1
                    self._lib.gather_rows(
                        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        self._idx_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                        bs, cols, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    )
                    outs.append(out)
                else:
                    outs.append(a[self._idx_buf])
            return tuple(outs)
        idx = []
        for _ in range(bs):
            if self._pos >= self.n:
                self._pos = 0
                if self._shuffle:
                    self._perm = self._rng.permutation(self.n)
            idx.append(self._perm[self._pos])
            self._pos += 1
        idx = np.asarray(idx)
        return tuple(a[idx] for a in self.arrays)

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_handle", None):
            try:
                self._lib.stream_destroy(self._handle)
            except Exception:
                pass

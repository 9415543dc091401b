"""ctypes bindings for the native IO runtime (native/expann_io.cpp).

The native library is built on demand with ``make -C native`` and loaded
lazily; every entry point returns ``None`` when the library is unavailable
so callers can fall back to numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libexpann_io.so")

_lib = None
_lib_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _lib_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib_failed = True
        return None
    lib.expann_vecs_dims.restype = ctypes.c_int64
    lib.expann_vecs_dims.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.expann_vecs_read.restype = ctypes.c_int64
    lib.expann_vecs_read.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.expann_blob_write.restype = ctypes.c_int64
    lib.expann_blob_write.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.expann_blob_size.restype = ctypes.c_int64
    lib.expann_blob_size.argtypes = [ctypes.c_char_p]
    lib.expann_blob_read.restype = ctypes.c_int64
    lib.expann_blob_read.argtypes = [
        ctypes.c_char_p,
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def native_read_vecs(filename: str, dtype=np.float32) -> Optional[np.ndarray]:
    """fvecs/ivecs via the native mmap parser; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = ctypes.c_int64()
    d = ctypes.c_int64()
    rc = lib.expann_vecs_dims(filename.encode(), ctypes.byref(n), ctypes.byref(d))
    if rc != 0:
        raise IOError(f"native vecs parse failed ({rc}): {filename}")
    base_dtype = np.float32 if dtype == np.float32 else np.int32
    out = np.empty((n.value, d.value), base_dtype)
    rc = lib.expann_vecs_read(
        filename.encode(),
        out.ctypes.data_as(ctypes.c_void_p),
        n.value,
        d.value,
    )
    if rc != 0:
        raise IOError(f"native vecs read failed ({rc}): {filename}")
    return out if out.dtype == dtype else out.astype(dtype)


def native_blob_write(filename: str, arr: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(arr)
    rc = lib.expann_blob_write(
        filename.encode(), arr.ctypes.data_as(ctypes.c_void_p), arr.nbytes
    )
    return rc == 0


def native_blob_read(filename: str, shape, dtype) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(shape, dtype)
    rc = lib.expann_blob_read(
        filename.encode(), out.ctypes.data_as(ctypes.c_void_p), out.nbytes
    )
    if rc != 0:
        raise IOError(f"native blob read failed ({rc}): {filename}")
    return out

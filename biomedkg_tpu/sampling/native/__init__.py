"""ctypes bindings for the native sampling kernels (sampler.cpp).

Build-on-first-import with caching; every entry point has a vectorized
numpy fallback in the pure-Python samplers, so an unavailable toolchain
degrades gracefully (set BIOMEDKG_NO_NATIVE=1 to force the fallback).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "sampler.cpp")
_SO = os.path.join(_DIR, f"libsampler-{sys.platform}.so")
_HASH = _SO + ".srchash"

_lib = None


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _cached_binary_valid() -> bool:
    """A cached .so is only trusted when its recorded source hash matches
    the current sampler.cpp — the binary is never version-controlled
    (gitignored), so everything that loads was compiled here from the
    audited source, and stale binaries can't shadow source edits."""
    if not (os.path.exists(_SO) and os.path.exists(_HASH)):
        return False
    with open(_HASH) as f:
        return f.read().strip() == _src_hash()


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        with open(_HASH, "w") as f:
            f.write(_src_hash())
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


_build_failed = False


def get_lib():
    """Load (building if needed) the native library, or None. A failed
    build is memoized — without that, every sampler call re-spawned a
    full (multi-second) g++ attempt per batch."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("BIOMEDKG_NO_NATIVE"):
        return None
    if not _cached_binary_valid():
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.build_csr.argtypes = [i64p, i64p, i32p, ctypes.c_int64,
                              ctypes.c_int64, i64p, i64p, i32p, i64p]
    lib.random_walk.argtypes = [i64p, i64p, i64p, ctypes.c_int64,
                                ctypes.c_int32, ctypes.c_uint64, i64p]
    lib.induced_subgraph.restype = ctypes.c_int64
    lib.induced_subgraph.argtypes = [i64p, i64p, i32p, i64p, ctypes.c_int64,
                                     i64p, i64p, i64p, i32p, ctypes.c_int64]
    lib.sample_neighbors.restype = ctypes.c_int64
    lib.sample_neighbors.argtypes = [i64p, i64p, i32p, i64p, ctypes.c_int64,
                                     ctypes.c_int32, ctypes.c_uint64, i64p,
                                     i64p, i32p]
    _lib = lib
    return _lib


def i64(arr: np.ndarray):
    """Pointer to an int64 C-contiguous array. The caller MUST hold a
    reference to ``arr`` for the duration of the native call (no implicit
    casting here — a temporary would dangle)."""
    assert arr.dtype == np.int64 and arr.flags["C_CONTIGUOUS"], arr.dtype
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def i32(arr: np.ndarray):
    assert arr.dtype == np.int32 and arr.flags["C_CONTIGUOUS"], arr.dtype
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

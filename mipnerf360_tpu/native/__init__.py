"""Native (C++) host-runtime tier: parallel batch sampling/gathering.

Loads ``_batcher.so`` (built from batcher.cpp on first import if the
toolchain is available) via ctypes; every entry point has a NumPy fallback
that is bit-identical, so the framework works without a compiler and tests
can assert exact parity between the two paths.

The RNG is a stateless counter-based splitmix64 stream: draw ``j`` of stream
``(seed, start)`` is ``splitmix64(seed ^ splitmix64(start + j)) % n_rays``.
Statelessness makes data order resume-deterministic (the trainer derives
``start`` from the global step) and independent of dispatch chunking.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_DIR, "_batcher.so")
_SRC_PATH = os.path.join(_DIR, "batcher.cpp")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _default_threads() -> int:
    return max(1, min(8, os.cpu_count() or 1))


def _build() -> bool:
    # Per-process temp name: concurrent first imports (multi-host on shared
    # storage, parallel pytest) must never rename a half-written file from
    # another process into place; each writes its own tmp, renames atomically.
    tmp = f"{_SO_PATH}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC_PATH, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO_PATH)
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def _load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("MIPNERF360_NO_NATIVE"):
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) or (
                os.path.exists(_SRC_PATH)
                and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.mnr_sample_indices.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
        lib.mnr_fill_batch_stack.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


# --- splitmix64, vectorized NumPy (the parity fallback) ---------------------

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    x = (x + _SM_GAMMA).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * _SM_M1).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27))) * _SM_M2).astype(np.uint64)
    return (x ^ (x >> np.uint64(31))).astype(np.uint64)


def sample_indices(seed: int, start: int, total: int, n_rays: int,
                   n_threads: Optional[int] = None) -> np.ndarray:
    """Deterministic uniform ray indices [total] for stream (seed, start)."""
    lib = _load()
    if lib is not None:
        out = np.empty(total, np.int64)
        lib.mnr_sample_indices(
            ctypes.c_uint64(seed & (2**64 - 1)),
            ctypes.c_uint64(start & (2**64 - 1)),
            total, n_rays,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n_threads or _default_threads())
        return out
    counters = np.arange(start, start + total, dtype=np.uint64)
    h = _splitmix64_np(np.uint64(seed & (2**64 - 1)) ^ _splitmix64_np(counters))
    return (h % np.uint64(n_rays)).astype(np.int64)


def fill_batch_stack(seed: int, start: int, total: int,
                     arrays: Sequence[np.ndarray],
                     n_threads: Optional[int] = None) -> list:
    """Gather ``total`` uniformly sampled rows from each [n_rays, dim] float32
    array, all using ONE shared index stream. Returns [total, dim] arrays."""
    n_rays = arrays[0].shape[0]
    lib = _load()
    if lib is None:
        idx = sample_indices(seed, start, total, n_rays)
        return [np.ascontiguousarray(a[idx]) for a in arrays]
    srcs = []
    for a in arrays:
        assert a.dtype == np.float32 and a.ndim == 2 and a.flags.c_contiguous, (
            a.dtype, a.shape, a.flags.c_contiguous)
        assert a.shape[0] == n_rays
        srcs.append(a)
    outs = [np.empty((total, a.shape[1]), np.float32) for a in srcs]
    n = len(srcs)
    src_ptrs = (ctypes.c_void_p * n)(
        *[a.ctypes.data_as(ctypes.c_void_p) for a in srcs])
    dst_ptrs = (ctypes.c_void_p * n)(
        *[o.ctypes.data_as(ctypes.c_void_p) for o in outs])
    dims = (ctypes.c_int64 * n)(*[a.shape[1] for a in srcs])
    lib.mnr_fill_batch_stack(
        ctypes.c_uint64(seed & (2**64 - 1)),
        ctypes.c_uint64(start & (2**64 - 1)),
        total, n_rays, src_ptrs, dims, n,
        dst_ptrs, n_threads or _default_threads())
    return outs

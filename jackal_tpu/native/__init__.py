"""Native (C++) runtime components, loaded via ctypes.

The shared library builds on first import (g++ -O2, cached next to the
source). No pybind11: the C ABI + ctypes keeps the toolchain dependency to
a bare compiler.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "prior_engine.cpp"),
         os.path.join(_DIR, "delaunay_engine.cpp"),
         os.path.join(_DIR, "wire_engine.cpp")]
_SO = os.path.join(_DIR, "libjackal_prior.so")
_HASH = _SO + ".srchash"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _src_hash() -> str:
    h = hashlib.sha256()
    for src in _SRCS:
        with open(src, "rb") as f:
            h.update(f.read())
    return h.hexdigest()


def _build(digest: str) -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
         "-fPIC", "-o", _SO] + _SRCS,
        check=True, capture_output=True)
    with open(_HASH, "w") as f:
        f.write(digest)


def load() -> ctypes.CDLL:
    """Build (if needed) and load the native prior engine.

    Staleness is decided by a source hash recorded at build time, never by
    mtimes (git checkouts assign arbitrary mtimes) — a clone always rebuilds
    on first import rather than loading a binary compiled on a foreign CPU
    (-march=native artifacts are not portable)."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        digest = _src_hash()
        built = None
        if os.path.exists(_SO) and os.path.exists(_HASH):
            with open(_HASH) as f:
                built = f.read().strip()
        if built != digest:
            _build(digest)
        lib = ctypes.CDLL(_SO)
        c_i16p = ctypes.POINTER(ctypes.c_int16)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)
        i = ctypes.c_int
        lib.prune_support.argtypes = [c_i16p, i, i, i, i, i, i, i]
        lib.collect_support.argtypes = [c_i16p, i, i, i, c_i32p, i]
        lib.collect_support.restype = i
        lib.fit_planes.argtypes = [c_i32p, i, c_i32p, i, c_f32p]
        lib.rasterize.argtypes = [c_i32p, i, c_i32p, i, i, i, i, c_i32p]
        lib.plane_maps.argtypes = [c_i32p, c_f32p, i, i, i, i,
                                   c_i32p, c_u8p, c_u8p]
        lib.build_grid.argtypes = [c_i32p, i, i, i, i, i, i, c_u8p]
        lib.remove_small_segments_native.argtypes = [
            c_f32p, i, i, ctypes.c_float, i]
        lib.delaunay_exact.argtypes = [c_f32p, i, c_i32p, i, i]
        lib.delaunay_exact.restype = i
        lib.tri_wire_and_bin.argtypes = [
            c_i16p, i, c_i32p, i, i, i, i, i, i, i,
            c_i16p, c_i16p, c_i16p]
        lib.tri_wire_and_bin.restype = i
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        lib.flatten_chunk_wire.argtypes = [
            c_i64p, c_i32p, c_i64p, c_i64p, c_i32p, c_i64p, c_i32p,
            i, i, i, i, i, c_i16p]
        _lib = lib
        return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False

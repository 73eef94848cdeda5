"""ctypes bindings to the native batch hasher, with lazy self-build.

The shared library is compiled once from ``src/hashing.cpp`` into the
package directory (or ``DATASKETCH_TPU_CACHE`` if set) and memoized.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "hashing.cpp")
_HDR = os.path.join(_HERE, "src", "dshash_core.h")
_LIB_DIR = os.environ.get("DATASKETCH_TPU_CACHE", _HERE)
_LIB_PATH = os.path.join(_LIB_DIR, "libdshash.so")

_lock = threading.Lock()
_lib = None


def _build() -> str:
    os.makedirs(_LIB_DIR, exist_ok=True)
    tmp = _LIB_PATH + ".tmp.%d" % os.getpid()
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-pthread",
        _SRC,
        "-o",
        tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _LIB_PATH)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_HDR))
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < src_mtime:
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
        lib.batch_sha1_32.argtypes = [u8p, i64p, ctypes.c_int64, u32p]
        lib.batch_sha1_64.argtypes = [u8p, i64p, ctypes.c_int64, u64p]
        lib.batch_xxhash32.argtypes = [u8p, i64p, ctypes.c_int64, ctypes.c_uint32, u32p]
        _lib = lib
        return lib


def _pack(tokens) -> tuple:
    """Pack a sequence of bytes-like tokens into (data, offsets)."""
    n = len(tokens)
    offsets = np.zeros(n + 1, dtype=np.int64)
    if n:
        np.cumsum(np.fromiter(map(len, tokens), np.int64, count=n), out=offsets[1:])
    data = np.frombuffer(b"".join(tokens), dtype=np.uint8) if n else np.zeros(0, np.uint8)
    if not data.flags["C_CONTIGUOUS"]:
        data = np.ascontiguousarray(data)
    # ctypes ndpointer rejects zero-size frombuffer views sometimes; ensure 1 elt
    if data.size == 0:
        data = np.zeros(1, dtype=np.uint8)
    return data, offsets


def batch_sha1_hash32(tokens) -> np.ndarray:
    lib = _load()
    data, offsets = _pack(tokens)
    out = np.empty(len(tokens), dtype=np.uint32)
    lib.batch_sha1_32(data, offsets, len(tokens), out)
    return out


def batch_sha1_hash64(tokens) -> np.ndarray:
    lib = _load()
    data, offsets = _pack(tokens)
    out = np.empty(len(tokens), dtype=np.uint64)
    lib.batch_sha1_64(data, offsets, len(tokens), out)
    return out


def batch_xxhash32(tokens, seed: int = 0) -> np.ndarray:
    lib = _load()
    data, offsets = _pack(tokens)
    out = np.empty(len(tokens), dtype=np.uint32)
    lib.batch_xxhash32(data, offsets, len(tokens), seed, out)
    return out

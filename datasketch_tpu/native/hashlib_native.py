"""ctypes bindings to the native batch hasher, with lazy self-build.

The shared library is compiled once from ``src/hashing.cpp`` into the
package directory (or ``DATASKETCH_TPU_CACHE`` if set) and memoized.
A failed build (no ``g++``, read-only cache dir, ...) is memoized too and
every entry point degrades to a bit-identical pure-Python path — the
stock ``MinHash``/``HyperLogLog`` bulk APIs call these unconditionally,
so a missing toolchain must cost speed, never a crash.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import struct
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
_lib_failed = False


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
    """The ctypes lib, or None (memoized) if it can't be built/loaded."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_HDR))
            if (
                not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < src_mtime
            ):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
            u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
            u64p = np.ctypeslib.ndpointer(np.uint64, flags="C")
            lib.batch_sha1_32.argtypes = [u8p, i64p, ctypes.c_int64, u32p]
            lib.batch_sha1_64.argtypes = [u8p, i64p, ctypes.c_int64, u64p]
            lib.batch_xxhash32.argtypes = [
                u8p, i64p, ctypes.c_int64, ctypes.c_uint32, u32p
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


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


# --- pure-Python fallbacks (bit-identical; used when the build fails) ---

_XXP1, _XXP2, _XXP3 = 2654435761, 2246822519, 3266489917
_XXP4, _XXP5 = 668265263, 374761393
_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _py_xxh32(data: bytes, seed: int) -> int:
    """Scalar XXH32 (bit-identical to the C implementation; verified in
    tests/test_native_corpus.py when the native lib is available)."""
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + _XXP1 + _XXP2) & _M32
        v2 = (seed + _XXP2) & _M32
        v3 = seed & _M32
        v4 = (seed - _XXP1) & _M32
        while i + 16 <= n:
            v1 = (_rotl32((v1 + int.from_bytes(data[i:i + 4], "little")
                           * _XXP2) & _M32, 13) * _XXP1) & _M32
            v2 = (_rotl32((v2 + int.from_bytes(data[i + 4:i + 8], "little")
                           * _XXP2) & _M32, 13) * _XXP1) & _M32
            v3 = (_rotl32((v3 + int.from_bytes(data[i + 8:i + 12], "little")
                           * _XXP2) & _M32, 13) * _XXP1) & _M32
            v4 = (_rotl32((v4 + int.from_bytes(data[i + 12:i + 16], "little")
                           * _XXP2) & _M32, 13) * _XXP1) & _M32
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7)
             + _rotl32(v3, 12) + _rotl32(v4, 18)) & _M32
    else:
        h = (seed + _XXP5) & _M32
    h = (h + n) & _M32
    while i + 4 <= n:
        h = (_rotl32((h + int.from_bytes(data[i:i + 4], "little")
                      * _XXP3) & _M32, 17) * _XXP4) & _M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * _XXP5) & _M32, 11) * _XXP1) & _M32
        i += 1
    h ^= h >> 15
    h = (h * _XXP2) & _M32
    h ^= h >> 13
    h = (h * _XXP3) & _M32
    h ^= h >> 16
    return h


def xxh32_one(data, seed: int = 0) -> int:
    """XXH32 of one token (the scalar form behind
    :func:`datasketch_tpu.hashfunc.xxhash_hash32`). Pure Python is faster
    than a batch-of-1 native call (no packing/ctypes overhead) and is
    bit-identical to the C implementation."""
    if isinstance(data, int):
        # bytes(int) would silently hash N zero bytes; match the sha1
        # hashfuncs, which raise for non-buffer input.
        raise TypeError("a bytes-like object is required, not 'int'")
    return _py_xxh32(bytes(data), seed)


def batch_sha1_hash32(tokens) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np.array(
            [struct.unpack("<I", hashlib.sha1(t).digest()[:4])[0]
             for t in tokens],
            dtype=np.uint32,
        ).reshape(len(tokens))
    data, offsets = _pack(tokens)
    out = np.empty(len(tokens), dtype=np.uint32)
    lib.batch_sha1_32(data, offsets, len(tokens), out)
    return out


def batch_sha1_hash64(tokens) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np.array(
            [struct.unpack("<Q", hashlib.sha1(t).digest()[:8])[0]
             for t in tokens],
            dtype=np.uint64,
        ).reshape(len(tokens))
    data, offsets = _pack(tokens)
    out = np.empty(len(tokens), dtype=np.uint64)
    lib.batch_sha1_64(data, offsets, len(tokens), out)
    return out


def batch_xxhash32(tokens, seed: int = 0) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np.array(
            [_py_xxh32(bytes(t), seed) for t in tokens], dtype=np.uint32
        ).reshape(len(tokens))
    data, offsets = _pack(tokens)
    out = np.empty(len(tokens), dtype=np.uint32)
    lib.batch_xxhash32(data, offsets, len(tokens), seed, out)
    return out

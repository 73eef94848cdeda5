"""Native (C++) runtime components, loaded via ctypes.

Provides batched token hashing (SHA1 low-32/64, xxhash-style) that releases
the GIL and uses all host cores — the TPU-native replacement for the
reference's per-token Python ``hashlib`` loop
(``/root/reference/datasketch/minhash.py:263``).

The shared library is built lazily from ``datasketch_tpu/native/src`` with
the system compiler; if unavailable, callers fall back to pure Python.
"""

from __future__ import annotations

import os

native_batch_sha1_hash32 = None
native_batch_sha1_hash64 = None
native_batch_xxhash32 = None

_DISABLED = os.environ.get("DATASKETCH_TPU_NO_NATIVE", "") == "1"

if not _DISABLED:
    try:
        from datasketch_tpu.native.hashlib_native import (
            batch_sha1_hash32 as native_batch_sha1_hash32,
            batch_sha1_hash64 as native_batch_sha1_hash64,
            batch_xxhash32 as native_batch_xxhash32,
        )
    except Exception:  # pragma: no cover - toolchain missing
        native_batch_sha1_hash32 = None
        native_batch_sha1_hash64 = None
        native_batch_xxhash32 = None

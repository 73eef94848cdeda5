"""Token hash functions.

Host-side hashes mirror the reference defaults
(``/root/reference/datasketch/hashfunc.py:5-28``): SHA1 truncated to the low
32/64 bits, little-endian. They are the *pluggable-hashfunc* compatibility
path; the TPU-native fast path is batched hashing — either the native C++
batch hasher (:mod:`datasketch_tpu.native`) for bytes tokens, or the on-device
integer mix hash in :mod:`datasketch_tpu.ops.hashing` for pre-tokenized ids.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = [
    "sha1_hash32",
    "sha1_hash64",
    "batch_sha1_hash32",
    "batch_sha1_hash64",
    "device_hash",
    "device_hash64",
    "xxhash_hash32",
]


def device_hash(token_id) -> int:
    """On-device token hash for PRE-TOKENIZED integer corpora.

    Pass ``hashfunc=device_hash`` (or the string ``'device'``) to
    :class:`~datasketch_tpu.models.minhash.MinHash` when your documents are
    already integer token-id arrays: the bulk APIs then upload the raw ids
    and apply the murmur3 fmix32 finalizer ON THE DEVICE, fused into the
    signature kernel — the host does zero per-token work. This is the
    TPU-native form of the reference's "plug in a faster hashfunc" escape
    hatch (``/root/reference/docs/minhash.rst:79-121``,
    ``/root/reference/datasketch/minhash.py:118``).

    The callable itself is the host-side twin (bit-identical to the device
    mix) so single-object ``update``/``update_batch`` stay consistent with
    the bulk path. Signatures are NOT value-compatible with the reference's
    SHA1-based ones (like the ``oph``/``cminhash`` schemes); Jaccard
    estimation statistics are unchanged — fmix32 is a bijective scramble,
    uniform over uint32.
    """
    from datasketch_tpu.ops.hashing import mix32_np

    return int(mix32_np(int(token_id) & 0xFFFFFFFF))


def device_hash64(token_id) -> int:
    """64-bit on-device token hash for pre-tokenized integer corpora.

    The 64-bit sibling of :func:`device_hash` for sketches that need the
    full 64-bit hash range (``HyperLogLogPlusPlus``): limb-pair fmix32
    rounds (:func:`datasketch_tpu.ops.hashing.mix64`), bit-identical
    between this host twin and the device path. Like ``device_hash``,
    NOT value-compatible with the SHA1 default.
    """
    from datasketch_tpu.ops.hashing import mix64_np

    return int(mix64_np(int(token_id) & 0xFFFFFFFFFFFFFFFF))


def xxhash_hash32(data: bytes) -> int:
    """A 32-bit xxHash (XXH32, seed 0) token hash — the fast NON-cryptographic
    alternative the reference docs recommend plugging in for speed
    (``/root/reference/docs/minhash.rst:79-121`` suggests mmh3/xxhash/farmhash;
    ``/root/reference/datasketch/minhash.py:118`` is the pluggable hook).

    Pass ``hashfunc=xxhash_hash32`` (or the string ``'xxh32'``) to
    :class:`~datasketch_tpu.models.minhash.MinHash`: every bulk path then
    routes tokens through the native C++ XXH32 batch hasher
    (:mod:`datasketch_tpu.native`), which is several times faster than the
    SHA-NI SHA1 default on short tokens. Output matches the canonical XXH32
    spec (same values as the ``xxhash`` PyPI package's ``xxh32_intdigest``
    at seed 0), so signatures interoperate with a reference install that
    plugs in that library. NOT value-compatible with the SHA1 default.
    """
    from datasketch_tpu.native.hashlib_native import xxh32_one

    return xxh32_one(data, 0)


def sha1_hash32(data: bytes) -> int:
    """A 32-bit hash function based on SHA1.

    Parity with ``/root/reference/datasketch/hashfunc.py:5-15``.

    Args:
        data (bytes): the data to generate 32-bit integer hash from.

    Returns:
        int: an integer hash value that can be encoded using 32 bits.
    """
    return struct.unpack("<I", hashlib.sha1(data).digest()[:4])[0]


def sha1_hash64(data: bytes) -> int:
    """A 64-bit hash function based on SHA1.

    Parity with ``/root/reference/datasketch/hashfunc.py:18-28``.

    Args:
        data (bytes): the data to generate 64-bit integer hash from.

    Returns:
        int: an integer hash value that can be encoded using 64 bits.
    """
    return struct.unpack("<Q", hashlib.sha1(data).digest()[:8])[0]


def batch_sha1_hash32(tokens) -> "np.ndarray":
    """Hash a sequence of bytes tokens to uint32 with SHA1 (low 32 bits, LE).

    Uses the native C++ hasher when available (releases the GIL, multi-token
    throughput), otherwise falls back to hashlib. Bit-identical to mapping
    :func:`sha1_hash32` over ``tokens``.
    """
    import numpy as np

    from datasketch_tpu.native import native_batch_sha1_hash32

    if native_batch_sha1_hash32 is not None:
        return native_batch_sha1_hash32(tokens)
    return np.array([sha1_hash32(t) for t in tokens], dtype=np.uint32)


def batch_sha1_hash64(tokens) -> "np.ndarray":
    """Hash a sequence of bytes tokens to uint64 with SHA1 (low 64 bits, LE)."""
    import numpy as np

    from datasketch_tpu.native import native_batch_sha1_hash64

    if native_batch_sha1_hash64 is not None:
        return native_batch_sha1_hash64(tokens)
    return np.array([sha1_hash64(t) for t in tokens], dtype=np.uint64)

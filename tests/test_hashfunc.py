"""Hash function tests: host parity with hashlib and the native C++ path."""

import hashlib
import struct

import numpy as np
import pytest

from datasketch_tpu.hashfunc import (
    sha1_hash32,
    sha1_hash64,
    batch_sha1_hash32,
    batch_sha1_hash64,
)

TOKENS = [b"Hello", b"", b"a" * 55, b"b" * 56, b"c" * 63, b"d" * 64, b"e" * 65, b"x" * 300]


def test_sha1_hash32_reference_value():
    # /root/reference/datasketch/hashfunc.py:15 semantics
    for t in TOKENS:
        assert sha1_hash32(t) == struct.unpack("<I", hashlib.sha1(t).digest()[:4])[0]


def test_sha1_hash64_reference_value():
    for t in TOKENS:
        assert sha1_hash64(t) == struct.unpack("<Q", hashlib.sha1(t).digest()[:8])[0]


def test_batch_sha1_matches_scalar():
    got32 = batch_sha1_hash32(TOKENS)
    got64 = batch_sha1_hash64(TOKENS)
    np.testing.assert_array_equal(
        got32, np.array([sha1_hash32(t) for t in TOKENS], dtype=np.uint32)
    )
    np.testing.assert_array_equal(
        got64, np.array([sha1_hash64(t) for t in TOKENS], dtype=np.uint64)
    )


def test_native_hasher_block_boundaries():
    from datasketch_tpu.native import native_batch_sha1_hash32

    if native_batch_sha1_hash32 is None:
        pytest.skip("native hasher unavailable")
    # lengths straddling SHA1's 64-byte block and 56-byte padding boundary
    toks = [bytes([i % 251] * n) for i, n in enumerate(range(0, 200))]
    got = native_batch_sha1_hash32(toks)
    expect = np.array([sha1_hash32(t) for t in toks], dtype=np.uint32)
    np.testing.assert_array_equal(got, expect)


def test_xxhash32_known_vector():
    from datasketch_tpu.native import native_batch_xxhash32

    if native_batch_xxhash32 is None:
        pytest.skip("native hasher unavailable")
    assert native_batch_xxhash32([b"hello world"])[0] == 0xCEBB6622


def test_device_mix32_is_bijective_sample():
    import jax.numpy as jnp

    from datasketch_tpu.ops.hashing import mix32

    x = np.arange(100000, dtype=np.uint32)
    y = np.asarray(mix32(jnp.asarray(x)))
    assert len(np.unique(y)) == len(x)

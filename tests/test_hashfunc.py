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


def test_xxhash_hash32_scalar_matches_spec_and_batch():
    from datasketch_tpu.hashfunc import xxhash_hash32
    from datasketch_tpu.native.hashlib_native import batch_xxhash32

    # canonical XXH32 vectors (seed 0)
    assert xxhash_hash32(b"") == 0x02CC5D05
    assert xxhash_hash32(b"hello world") == 0xCEBB6622
    got = batch_xxhash32(TOKENS, 0)
    np.testing.assert_array_equal(
        got, np.array([xxhash_hash32(t) for t in TOKENS], dtype=np.uint32)
    )


def test_minhash_xxh32_paths_agree():
    """'xxh32' string alias; update / update_batch / bulk_signatures /
    bulk_from_text all produce identical signatures for equal input."""
    from datasketch_tpu import MinHash
    from datasketch_tpu.hashfunc import xxhash_hash32

    rng = np.random.RandomState(3)
    docs = [
        [bytes(rng.randint(0, 256, 10, dtype=np.uint8)) for _ in range(30)]
        for _ in range(6)
    ]
    sigs = MinHash.bulk_signatures(docs, num_perm=64, hashfunc="xxh32")
    m = MinHash(num_perm=64, hashfunc=xxhash_hash32)
    assert m.hashfunc is xxhash_hash32
    for t in docs[0]:
        m.update(t)
    got = np.asarray(m.hashvalues, dtype=np.uint64).astype(np.uint32)
    np.testing.assert_array_equal(got, sigs[0])
    m2 = MinHash(num_perm=64, hashfunc="xxh32")
    m2.update_batch(docs[1])
    got2 = np.asarray(m2.hashvalues, dtype=np.uint64).astype(np.uint32)
    np.testing.assert_array_equal(got2, sigs[1])
    texts = [bytes(rng.randint(97, 123, 60, dtype=np.uint8)) for _ in range(4)]
    ft = MinHash.bulk_from_text(texts, k=9, num_perm=64, hashfunc="xxh32")
    manual = MinHash.bulk_signatures(
        [[t[i : i + 9] for i in range(len(t) - 8)] for t in texts],
        num_perm=64,
        hashfunc=xxhash_hash32,
    )
    np.testing.assert_array_equal(ft, manual)


def test_bulk_from_text_rejects_unsupported_hashfunc():
    from datasketch_tpu import MinHash

    with pytest.raises(ValueError, match="bulk_from_text"):
        MinHash.bulk_from_text([b"abcdefghijkl"], k=9, hashfunc=lambda b: 0)


def test_device_mix32_is_bijective_sample():
    import jax.numpy as jnp

    from datasketch_tpu.ops.hashing import mix32

    x = np.arange(100000, dtype=np.uint32)
    y = np.asarray(mix32(jnp.asarray(x)))
    assert len(np.unique(y)) == len(x)


def test_xxhash_hash32_rejects_int():
    """An int must raise (bytes(int) would silently hash N zero bytes,
    diverging from the sha1 hashfuncs and the native batch path)."""
    import pytest

    from datasketch_tpu.hashfunc import xxhash_hash32

    with pytest.raises(TypeError):
        xxhash_hash32(5)

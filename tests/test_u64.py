"""Bit-exactness of the uint32-limb 64-bit arithmetic vs NumPy uint64."""

import numpy as np
import jax.numpy as jnp

from datasketch_tpu.ops import u64


RNG = np.random.RandomState(7)
N = 4096


def _rand_u64(n, bits=64):
    lo = RNG.randint(0, 1 << 32, size=n, dtype=np.uint64)
    hi = RNG.randint(0, 1 << max(1, bits - 32), size=n, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def test_umul32_wide():
    a = RNG.randint(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
    b = RNG.randint(0, 1 << 32, size=N, dtype=np.uint64).astype(np.uint32)
    hi, lo = u64.umul32_wide(jnp.asarray(a), jnp.asarray(b))
    expect = a.astype(np.uint64) * b.astype(np.uint64)
    got = u64.join_u64(np.asarray(hi), np.asarray(lo))
    np.testing.assert_array_equal(got, expect)


def test_mul64_wraps_like_numpy():
    x = _rand_u64(N)
    y = _rand_u64(N)
    xh, xl = u64.split_u64(x)
    yh, yl = u64.split_u64(y)
    hi, lo = u64.mul64(jnp.asarray(xh), jnp.asarray(xl), jnp.asarray(yh), jnp.asarray(yl))
    expect = x * y  # numpy wraps mod 2**64
    got = u64.join_u64(np.asarray(hi), np.asarray(lo))
    np.testing.assert_array_equal(got, expect)


def test_add64_wraps_like_numpy():
    x = _rand_u64(N)
    y = _rand_u64(N)
    xh, xl = u64.split_u64(x)
    yh, yl = u64.split_u64(y)
    hi, lo = u64.add64(jnp.asarray(xh), jnp.asarray(xl), jnp.asarray(yh), jnp.asarray(yl))
    got = u64.join_u64(np.asarray(hi), np.asarray(lo))
    np.testing.assert_array_equal(got, x + y)


def test_mod_mersenne61():
    p = np.uint64(u64.MERSENNE_PRIME)
    x = np.concatenate(
        [
            _rand_u64(N),
            np.array([0, 1, p - np.uint64(1), p, p + np.uint64(1), 2 * p, np.uint64(2**64 - 1)], dtype=np.uint64),
        ]
    )
    xh, xl = u64.split_u64(x)
    hi, lo = u64.mod_mersenne61(jnp.asarray(xh), jnp.asarray(xl))
    got = u64.join_u64(np.asarray(hi), np.asarray(lo))
    np.testing.assert_array_equal(got, x % p)


def test_permute_hash_matches_reference_formula():
    """The exact uint64 expression at /root/reference/datasketch/minhash.py:223."""
    p = np.uint64(u64.MERSENNE_PRIME)
    maxh = np.uint64(u64.MAX_HASH)
    a = RNG.randint(1, u64.MERSENNE_PRIME, size=N, dtype=np.uint64)
    b = RNG.randint(0, u64.MERSENNE_PRIME, size=N, dtype=np.uint64)
    h = RNG.randint(0, 1 << 32, size=N, dtype=np.uint64)
    expect = np.bitwise_and((a * h + b) % p, maxh).astype(np.uint32)
    ah, al = u64.split_u64(a)
    bh, bl = u64.split_u64(b)
    got = u64.permute_hash(
        jnp.asarray(h.astype(np.uint32)),
        jnp.asarray(ah),
        jnp.asarray(al),
        jnp.asarray(bh),
        jnp.asarray(bl),
    )
    np.testing.assert_array_equal(np.asarray(got), expect)

"""Unsigned 64-bit arithmetic in uint32 limb pairs, for TPU.

TPUs have no native 64-bit integer path worth using (XLA emulates it slowly
and ``jax_enable_x64`` is a global flag we refuse to impose on users), so the
reference's universal-hash permutation
``(a * h + b) % (2**61 - 1) & (2**32 - 1)`` with uint64 wrap-around semantics
(``/root/reference/datasketch/minhash.py:223,295-296`` — note ``a*h`` with
``a < 2**61`` and ``h < 2**32`` silently wraps mod 2**64 in NumPy before the
Mersenne mod) is implemented here in (hi, lo) uint32 limb pairs.

All functions are elementwise over broadcastable uint32 arrays; XLA fuses the
chains onto the VPU. Bit-exactness against NumPy uint64 is enforced by
``tests/test_u64.py``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "MERSENNE_PRIME",
    "MAX_HASH",
    "split_u64",
    "join_u64",
    "umul32_wide",
    "mul64",
    "add64",
    "mod_mersenne61",
    "permute_hash",
]

# (2**61 - 1) and (2**32 - 1): /root/reference/datasketch/minhash.py:30-31.
MERSENNE_PRIME = (1 << 61) - 1
MAX_HASH = (1 << 32) - 1

# NOTE: kept as Python ints and materialized inside each function —
# module-level jnp scalars would be closure-captured constants, which
# Pallas kernels reject (datasketch_tpu/ops/pallas_kernels.py calls these
# helpers inside kernel bodies).
_LOW16 = 0xFFFF
_P_HI = 0x1FFFFFFF  # high limb of 2**61 - 1
_P_LO = 0xFFFFFFFF  # low limb of 2**61 - 1


def split_u64(x: np.ndarray):
    """Host-side: split a numpy uint64 array into (hi, lo) uint32 arrays."""
    x = np.asarray(x, dtype=np.uint64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    return hi, lo


def join_u64(hi, lo) -> np.ndarray:
    """Host-side: join (hi, lo) uint32 arrays back into numpy uint64."""
    hi = np.asarray(hi, dtype=np.uint64)
    lo = np.asarray(lo, dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def umul32_wide(a, b):
    """Full 32x32 -> 64-bit product of uint32 arrays, as (hi, lo) uint32.

    Uses 16-bit limb decomposition; every intermediate fits in uint32
    (the final ``hi`` equals ``floor(a*b / 2**32) < 2**32`` and partial sums
    of nonnegative terms bounded by it cannot overflow).
    """
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    low16 = jnp.uint32(_LOW16)
    a0 = a & low16
    a1 = a >> 16
    b0 = b & low16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    t = (ll >> 16) + (lh & low16) + (hl & low16)
    lo = (ll & low16) | (t << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (t >> 16)
    return hi, lo


def mul64(x_hi, x_lo, y_hi, y_lo):
    """(x * y) mod 2**64 for (hi, lo) uint32 limb pairs."""
    hi, lo = umul32_wide(x_lo, y_lo)
    hi = hi + x_lo * y_hi + x_hi * y_lo  # uint32 wrap == mod 2**32, correct
    return hi, lo


def add64(x_hi, x_lo, y_hi, y_lo):
    """(x + y) mod 2**64 for (hi, lo) uint32 limb pairs."""
    lo = x_lo + y_lo
    carry = (lo < x_lo).astype(jnp.uint32)
    hi = x_hi + y_hi + carry
    return hi, lo


def mod_mersenne61(x_hi, x_lo):
    """x mod (2**61 - 1) of a 64-bit value in (hi, lo) uint32 limbs.

    Mersenne fold: ``y = (x & p) + (x >> 61)`` with ``x < 2**64`` gives
    ``y < 2**61 + 7``; one conditional subtract of p finishes. Note NumPy's
    ``%`` maps multiples of p to 0 (not p), which this reproduces.
    """
    p_hi = jnp.uint32(_P_HI)
    p_lo = jnp.uint32(_P_LO)
    low_hi = x_hi & p_hi
    top3 = x_hi >> 29
    y_hi, y_lo = add64(low_hi, x_lo, jnp.uint32(0), top3)
    # y >= p  <=>  y_hi > P_HI or (y_hi == P_HI and y_lo == P_LO)
    ge = (y_hi > p_hi) | ((y_hi == p_hi) & (y_lo == p_lo))
    # subtract p == add (2**64 - p) = (0xE0000000, 0x00000001) mod 2**64
    s_hi, s_lo = add64(y_hi, y_lo, jnp.uint32(0xE0000000), jnp.uint32(1))
    out_hi = jnp.where(ge, s_hi, y_hi)
    out_lo = jnp.where(ge, s_lo, y_lo)
    return out_hi, out_lo


def permute_hash(h, a_hi, a_lo, b_hi, b_lo):
    """The reference MinHash permutation, bit-exact, returning uint32.

    Computes ``((a * h + b) mod 2**64) mod (2**61 - 1) & (2**32 - 1)`` —
    the exact value NumPy produces for
    ``np.bitwise_and((a * hv + b) % _mersenne_prime, _max_hash)``
    (``/root/reference/datasketch/minhash.py:223``) including the silent
    uint64 wrap of ``a * hv``.

    Args:
        h: uint32 token hash(es); a/b limbs: uint32 permutation parameters.
        Shapes broadcast (typically h is [..., 1] vs params [num_perm]).
    """
    m_hi, m_lo = mul64(a_hi, a_lo, jnp.uint32(0), h.astype(jnp.uint32))
    s_hi, s_lo = add64(m_hi, m_lo, b_hi, b_lo)
    r_hi, r_lo = mod_mersenne61(s_hi, s_lo)
    # result < 2**61; & MAX_HASH is just the low limb.
    return r_lo

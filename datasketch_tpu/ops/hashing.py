"""On-device token hashing for pre-tokenized integer ids.

The reference hashes raw bytes on the host (pluggable ``hashfunc``,
``/root/reference/datasketch/minhash.py:118``). The TPU-native fast path
accepts integer token ids already on device and mixes them with a
murmur3/splitmix-style finalizer — a stateless bijective scramble whose
output is uniform over uint32/uint64, so MinHash collision statistics match
those of a random hash function.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["mix32", "mix64", "mix32_np", "mix64_np"]


def mix32(x):
    """Murmur3 fmix32 finalizer over uint32 arrays (bijective)."""
    x = x.astype(jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    return x


def mix32_np(x) -> np.ndarray:
    """Host NumPy twin of :func:`mix32`, bit-identical.

    Lets the object-level ``MinHash.update`` path (which hashes on host)
    produce the same values as the on-device bulk path, so sketches built
    either way stay comparable.
    """
    x = np.asarray(x).astype(np.uint32)
    x = x ^ (x >> np.uint32(16))
    x = np.multiply(x, np.uint32(0x85EBCA6B), dtype=np.uint32)
    x = x ^ (x >> np.uint32(13))
    x = np.multiply(x, np.uint32(0xC2B2AE35), dtype=np.uint32)
    return x ^ (x >> np.uint32(16))


def mix64(hi, lo):
    """splitmix64-style finalizer over (hi, lo) uint32 limb pairs.

    Cheap two-round variant: mixes the limbs against each other with fmix32
    rounds so every input bit affects both output limbs.
    """
    hi = mix32(hi ^ (lo >> 16) ^ (lo << 16))
    lo = mix32(lo ^ hi)
    hi = mix32(hi ^ (lo >> 13))
    return hi, lo


def mix64_np(x) -> np.ndarray:
    """Host NumPy twin of :func:`mix64` over uint64 arrays, bit-identical.

    Splits into uint32 limbs, applies the same fmix32 rounds, and
    recombines — so 64-bit sketches (``HyperLogLogPlusPlus`` with
    ``hashfunc='device'``) hash identically on host and device paths.
    """
    x = np.asarray(x).astype(np.uint64)
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = mix32_np(
        hi
        ^ (lo >> np.uint32(16))
        ^ np.left_shift(lo, np.uint32(16), dtype=np.uint32)
    )
    lo = mix32_np(lo ^ hi)
    hi = mix32_np(hi ^ (lo >> np.uint32(13)))
    return (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)

"""One-Permutation Hashing with densification (DOPH) — fast MinHash scheme.

Standard MinHash (the reference's and our default) applies ``num_perm``
universal-hash permutations per token. One-permutation hashing (Li,
Owen & Zhang 2012) hashes each token ONCE, splits the hash range into
``num_perm`` bins, takes the min per bin, and densifies empty bins by
borrowing from the nearest non-empty bin (improved/circulant densification,
Shrivastava & Li 2014) — an unbiased Jaccard estimator at ~1/num_perm of
the permutation work.

Signatures from this scheme are NOT value-compatible with the reference's
MinHash (use the default scheme for interop); Jaccard estimation,
merge-by-min, and LSH banding all work identically. Opt in via
``MinHash.bulk(docs, scheme="oph")``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from datasketch_tpu.ops.hashing import mix32
from datasketch_tpu.ops.u64 import MAX_HASH, umul32_wide


__all__ = ["oph_signatures"]


def _mix(h, salt):
    """fmix32 finalizer over h ^ salt (uniform rehash)."""
    return mix32(h ^ jnp.uint32(salt))


@functools.partial(jax.jit, static_argnames=("num_perm", "seed"))
def oph_signatures(hashes, lengths, num_perm: int, seed: int = 1):
    """DOPH signatures for a padded token batch.

    Args:
        hashes: uint32[B, T] token hashes (padded; masked by lengths).
        lengths: int32[B].
        num_perm: number of bins (any positive int).
    Returns:
        uint32[B, num_perm]; empty documents yield all-MAX_HASH rows
        (matching the default scheme's empty state).
    """
    b, t = hashes.shape
    salt = (0x9E3779B1 ^ (int(seed) * 0x45D9F3B)) & 0xFFFFFFFF
    h = _mix(hashes.astype(jnp.uint32), salt)
    mask = jax.lax.broadcasted_iota(jnp.int32, hashes.shape, 1) < lengths[:, None]

    # fair bin assignment: floor(h * k / 2^32) = mulhi(h, k). The full
    # 32x32 limb product is overflow-safe for ANY num_perm < 2^32 — a
    # 16-bit shortcut ((h>>16)*k) wraps once num_perm > 2^16, silently
    # leaving bins >= 65536 permanently empty.
    k_arr = jnp.full_like(h, jnp.uint32(num_perm))
    bins, _ = umul32_wide(h, k_arr)
    bins = bins.astype(jnp.int32)  # [B, T] in [0, k)

    # per-bin min value: a second independent mix decorrelates bin choice
    # from the stored minimum
    vals = _mix(h, (0x27D4EB2F ^ int(seed)) & 0xFFFFFFFF)
    vals = jnp.where(mask, vals, jnp.uint32(MAX_HASH))
    bins = jnp.where(mask, bins, 0)

    state = jnp.full((b, num_perm), MAX_HASH, dtype=jnp.uint32)
    rows = jax.lax.broadcasted_iota(jnp.int32, hashes.shape, 0)
    state = state.at[rows, bins].min(vals)

    # circulant densification: fill each empty bin from the nearest
    # non-empty bin to its left (jump-pointer doubling, log2(k) steps)
    empty = state == jnp.uint32(MAX_HASH)
    filled = state
    shift = 1
    while shift < num_perm:
        cand = jnp.roll(filled, shift, axis=1)
        cand_empty = jnp.roll(empty, shift, axis=1)
        take = empty & ~cand_empty
        filled = jnp.where(take, cand, filled)
        empty = empty & cand_empty
        shift *= 2
    # borrowed values are salted by their bin index so two docs sharing one
    # token don't alias across all empty bins
    salt = jax.lax.broadcasted_iota(jnp.uint32, filled.shape, 1)
    was_empty = (state == jnp.uint32(MAX_HASH)) & ~empty
    densified = _mix(filled, 0x165667B1) + salt * jnp.uint32(0x9E3779B9)
    out = jnp.where(was_empty, densified, filled)
    # fully-empty documents stay at MAX_HASH
    return jnp.where(empty, jnp.uint32(MAX_HASH), out)

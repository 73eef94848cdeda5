"""Functional HyperLogLog ops (batch-first, jittable).

A batch of HLL sketches is one ``int8[batch, m]`` register array
(reference state: ``/root/reference/datasketch/hyperloglog.py:76``).
Updates are scatter-max of ranks; merges are elementwise max — both
associative, which is what makes HLL the all-reduce-shaped sketch
(``merge`` over shards == one ``lax.pmax``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "bit_length32",
    "ranks_and_indices32",
    "ranks_and_indices64",
    "update_regs",
    "sketch_batch32",
    "sketch_batch64",
    "merge_regs",
    "raw_estimate",
    "count_batch",
]


def bit_length32(x):
    """Per-element ``int.bit_length()`` for uint32 arrays (branchless)."""
    x = x.astype(jnp.uint32)
    n = jnp.zeros(x.shape, jnp.int32)
    for shift in (16, 8, 4, 2, 1):
        y = x >> shift
        big = y > 0
        n = n + jnp.where(big, shift, 0)
        x = jnp.where(big, y, x)
    return n + (x > 0).astype(jnp.int32)


def ranks_and_indices32(hashes, p: int):
    """Register index (low p bits) and rank for 32-bit hashes.

    Mirrors ``hyperloglog.py:136-142``: index = ``h & (m-1)``,
    rank = ``(32 - p) - bit_length(h >> p) + 1``.
    """
    h = hashes.astype(jnp.uint32)
    m = 1 << p
    idx = (h & jnp.uint32(m - 1)).astype(jnp.int32)
    bits = h >> p
    rank = (32 - p) - bit_length32(bits) + 1
    return idx, rank.astype(jnp.int8)


def ranks_and_indices64(hash_hi, hash_lo, p: int):
    """Same for 64-bit hashes in (hi, lo) uint32 limbs (HLL++,
    hyperloglog.py:348-358)."""
    hi = hash_hi.astype(jnp.uint32)
    lo = hash_lo.astype(jnp.uint32)
    m = 1 << p
    idx = (lo & jnp.uint32(m - 1)).astype(jnp.int32)
    # bits = h >> p (4 <= p <= 16 < 32)
    bits_lo = (lo >> p) | (hi << (32 - p))
    bits_hi = hi >> p
    bl = jnp.where(bits_hi > 0, 32 + bit_length32(bits_hi), bit_length32(bits_lo))
    rank = (64 - p) - bl + 1
    return idx, rank.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("m",), donate_argnums=(0,))
def update_regs(regs, idx, rank, valid, m: int):
    """Scatter-max ranks into registers.

    Args:
        regs: int8[B, m]; idx: int32[B, T]; rank: int8[B, T];
        valid: bool[B, T] mask for padding.
    """
    rank = jnp.where(valid, rank, jnp.int8(0))

    def one(regs_row, idx_row, rank_row):
        return regs_row.at[idx_row].max(rank_row, mode="drop")

    return jax.vmap(one)(regs, idx, rank)


def _valid_mask(shape, lengths):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1) < lengths[:, None]


@functools.partial(jax.jit, static_argnames=("p",))
def sketch_batch32(hashes, lengths, p: int):
    """Fresh HLL registers for a padded corpus, ONE dispatch.

    Args:
        hashes: uint32[B, T] token hashes (padded); lengths: int32[B].
    Returns:
        int8[B, 2**p] register rows (the matrix form consumed by
        :func:`count_batch` / ``distributed_hll_union``).
    """
    idx, rank = ranks_and_indices32(hashes, p)
    regs = jnp.zeros((hashes.shape[0], 1 << p), jnp.int8)
    return update_regs(regs, idx, rank, _valid_mask(hashes.shape, lengths), 1 << p)


@functools.partial(jax.jit, static_argnames=("p",))
def sketch_batch64(hash_hi, hash_lo, lengths, p: int):
    """64-bit-hash variant of :func:`sketch_batch32` (HLL++ semantics,
    hashes as uint32 limb pairs)."""
    idx, rank = ranks_and_indices64(hash_hi, hash_lo, p)
    regs = jnp.zeros((hash_hi.shape[0], 1 << p), jnp.int8)
    return update_regs(
        regs, idx, rank, _valid_mask(hash_hi.shape, lengths), 1 << p
    )


@functools.partial(jax.jit, static_argnames=("p",))
def sketch_batch64_ids(ids, lengths, p: int):
    """HLL++ registers straight from RAW uint32 token ids, one dispatch.

    The 64-bit device hash (:func:`datasketch_tpu.ops.hashing.mix64`
    limb rounds — bit-identical to ``hashfunc.device_hash64``) is
    applied ON DEVICE, so the upload is the 4-byte ids instead of the
    8-byte host-computed hashes the generic :func:`sketch_batch64` path
    ships — half the bytes over the bandwidth-bound host->device link.
    """
    from datasketch_tpu.ops.hashing import mix64

    ids = ids.astype(jnp.uint32)
    hi, lo = mix64(jnp.zeros_like(ids), ids)
    idx, rank = ranks_and_indices64(hi, lo, p)
    regs = jnp.zeros((ids.shape[0], 1 << p), jnp.int8)
    return update_regs(
        regs, idx, rank, _valid_mask(ids.shape, lengths), 1 << p
    )


@jax.jit
def merge_regs(a, b):
    """Union of two register batches (hyperloglog.py:170-183)."""
    return jnp.maximum(a, b)


def _alpha(p: int) -> float:
    # hyperloglog.py:55-64
    if p == 4:
        return 0.673
    if p == 5:
        return 0.697
    if p == 6:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / (1 << p))


@functools.partial(jax.jit, static_argnames=("p",))
def raw_estimate(regs, p: int):
    """alpha * m^2 / sum(2^-reg) per row (hyperloglog.py:152)."""
    m = 1 << p
    s = jnp.sum(jnp.exp2(-regs.astype(jnp.float32)), axis=-1)
    return _alpha(p) * (float(m) ** 2) / s


@functools.partial(jax.jit, static_argnames=("p",))
def count_batch(regs, p: int):
    """Vectorized HLL count with small/large-range corrections
    (hyperloglog.py:144-168), float32, per row of int8[B, m]."""
    m = 1 << p
    e = raw_estimate(regs, p)
    num_zero = jnp.sum(regs == 0, axis=-1)
    lc = m * jnp.log(m / jnp.maximum(num_zero, 1).astype(jnp.float32))
    small = e <= 2.5 * m
    out = jnp.where(small & (num_zero > 0), lc, e)
    large = out > (1.0 / 30.0) * (1 << 32)
    lr = -(2.0**32) * jnp.log1p(-out / 2.0**32)
    return jnp.where(large, lr, out)

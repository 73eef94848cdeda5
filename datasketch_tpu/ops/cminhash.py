"""C-MinHash — one circulant permutation instead of num_perm of them.

C-MinHash (Li & Li, arXiv:2109.03337 "Rigorously Reducing K Permutations
to Two" and arXiv:2109.04595 "Practically Reducing Two Permutations to
Just One") replaces MinHash's K independent permutations with ONE
permutation probed at K circular shifts:

    sig_k = min over tokens of  pi((sigma(h) + k) mod 2^32)

where sigma breaks any structure between the input and the shift
schedule and pi is a PERMUTATION of the 2^32 hash universe. Both are
murmur3 fmix32 bijections here (salted by the seed) — pi must be a
genuine bijective scrambler, NOT a linear universal hash: with a linear
pi, pi(sigma + k) = pi(sigma) + a*k shifts every token's value by the
same constant, so consecutive signature slots pick the same argmin token
and the slots become correlated (measured variance 1.29x the standard
scheme); with fmix32, measured variance is ~0.87x standard at
num_perm=128, matching the papers' uniformly-smaller-variance result.

What it buys on TPU: slightly lower direct-Jaccard estimation variance
at equal num_perm (in LSH pipelines banding dominates recall, so expect
parity there — measured recall@10 0.888 vs 0.892 at num_perm=128), and
the kernel itself is pure 32-bit — no u64 limb arithmetic at all —
measuring ~6x the reference-compatible permutation scheme's throughput
at equal num_perm.

Signatures are NOT value-compatible with the reference scheme (same
trade as ``scheme="oph"``); Jaccard estimation, merge-by-min, banding,
and every index work identically. Opt in via
``MinHash.bulk(docs, scheme="cminhash")``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from datasketch_tpu.ops.hashing import mix32

__all__ = ["cminhash_signatures"]

MAX_HASH = (1 << 32) - 1


@functools.partial(jax.jit, static_argnames=("num_perm", "seed"))
def cminhash_signatures(hashes, lengths, num_perm: int, seed: int = 1):
    """C-MinHash signatures for a padded token batch.

    Args:
        hashes: uint32[B, T] token hashes (padded; masked by lengths).
        lengths: int32[B].
        num_perm: number of circular shifts K (any positive int).
    Returns:
        uint32[B, num_perm]; empty documents yield all-MAX_HASH rows
        (matching the default scheme's empty state).
    """
    salt_sigma = (0x9E3779B1 ^ (int(seed) * 0x45D9F3B)) & 0xFFFFFFFF
    salt_pi = (0x7F4A7C15 ^ (int(seed) * 0x2545F491)) & 0xFFFFFFFF
    sigma = mix32(hashes.astype(jnp.uint32) ^ jnp.uint32(salt_sigma))
    k32 = jnp.arange(num_perm, dtype=jnp.uint32)
    salt_pi = jnp.uint32(salt_pi)

    # Fold over token TILES (like minhash_ops._scan_min): materializing the
    # full [B, T, K] intermediate is memory-bound — a [B, tile, K] working
    # set stays cache/VMEM-resident (measured 6x the un-tiled form, and 6x
    # the standard permutation scheme, at B=2048 T=256 K=128 on CPU).
    b, t = sigma.shape
    tile_w = 32
    if t % tile_w:
        pad = tile_w - t % tile_w
        sigma = jnp.pad(sigma, ((0, 0), (0, pad)))
        t += pad
    nt = t // tile_w
    tiles = sigma.reshape(b, nt, tile_w).transpose(1, 0, 2)  # [nt, B, tile]
    offsets = jnp.arange(nt, dtype=jnp.int32) * tile_w

    def body(carry, inp):
        tile, off = inp  # [B, tile], []
        col = off + jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
        mask = col < lengths[:, None]
        vals = mix32((tile[..., None] + k32) ^ salt_pi)  # [B, tile, K]
        vals = jnp.where(mask[..., None], vals, jnp.uint32(MAX_HASH))
        return jnp.minimum(carry, vals.min(axis=-2)), None

    state = jnp.full((b, num_perm), MAX_HASH, dtype=jnp.uint32)
    out, _ = jax.lax.scan(body, state, (tiles, offsets))
    return out

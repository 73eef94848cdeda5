"""Functional MinHash compute core (batch-first, jittable).

A batch of MinHash sketches is one ``uint32[batch, num_perm]`` array (values
are always <= 2**32-1 so uint32 is lossless vs the reference's uint64 state,
``/root/reference/datasketch/minhash.py:167-168``). Updates are pure
functions; the :class:`datasketch_tpu.models.minhash.MinHash` facade wraps
them for API parity.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from datasketch_tpu.ops import u64

__all__ = [
    "MERSENNE_PRIME",
    "MAX_HASH",
    "HASH_RANGE",
    "init_permutations",
    "perm_limbs",
    "limbs_for",
    "empty_signatures",
    "update_signatures",
    "compute_signatures",
    "compute_signatures_ragged",
    "jaccard_pairwise",
    "jaccard_matrix",
    "merge_signatures",
    "pad_token_hashes",
]

MERSENNE_PRIME = u64.MERSENNE_PRIME
MAX_HASH = u64.MAX_HASH
HASH_RANGE = 1 << 32


@functools.lru_cache(maxsize=64)
def init_permutations(seed: int, num_perm: int):
    """Draw (a, b) universal-hash parameters, bit-identical to the reference.

    Reproduces the exact interleaved draw order of
    ``/root/reference/datasketch/minhash.py:170-184`` (a_i then b_i per
    permutation from one ``np.random.RandomState(seed)``) so signatures are
    cross-compatible with the reference at the same seed.

    Returns:
        (a, b): two numpy uint64 arrays of shape [num_perm].
    """
    gen = np.random.RandomState(seed)
    params = np.array(
        [
            (
                gen.randint(1, MERSENNE_PRIME, dtype=np.uint64),
                gen.randint(0, MERSENNE_PRIME, dtype=np.uint64),
            )
            for _ in range(num_perm)
        ],
        dtype=np.uint64,
    ).T
    a, b = params[0], params[1]
    a.setflags(write=False)
    b.setflags(write=False)
    return a, b


@functools.lru_cache(maxsize=64)
def perm_limbs(seed: int, num_perm: int):
    """Permutation parameters as device-ready (a_hi, a_lo, b_hi, b_lo) uint32."""
    a, b = init_permutations(seed, num_perm)
    a_hi, a_lo = u64.split_u64(a)
    b_hi, b_lo = u64.split_u64(b)
    return (
        jnp.asarray(a_hi),
        jnp.asarray(a_lo),
        jnp.asarray(b_hi),
        jnp.asarray(b_lo),
    )


def empty_signatures(batch: int, num_perm: int) -> jax.Array:
    """Initial sketch state: all slots at MAX_HASH (minhash.py:167-168)."""
    return jnp.full((batch, num_perm), MAX_HASH, dtype=jnp.uint32)


def pad_token_hashes(hash_arrays, pad_multiple: int = 128):
    """Host helper: ragged list of uint32 token-hash arrays -> padded batch.

    Returns (hashes uint32[B, T], lengths int32[B]) with T padded up to a
    multiple of ``pad_multiple`` (bucketed to limit jit recompiles).
    """
    lengths = np.array([len(h) for h in hash_arrays], dtype=np.int32)
    max_len = max(1, int(lengths.max()) if len(lengths) else 1)
    t = ((max_len + pad_multiple - 1) // pad_multiple) * pad_multiple
    out = np.zeros((len(hash_arrays), t), dtype=np.uint32)
    for i, h in enumerate(hash_arrays):
        out[i, : len(h)] = h
    return out, lengths


def _permute_all(hashes, a_hi, a_lo, b_hi, b_lo):
    """Permuted values for hashes[..., T] x params[P] -> uint32[..., T, P]."""
    h = hashes[..., None]
    return u64.permute_hash(h, a_hi, a_lo, b_hi, b_lo)


# Token-axis tile for the scan form below. Keeps the fused [B, tile, P]
# intermediate VMEM-sized and — critically — keeps XLA:TPU compile time flat:
# a single fused [B, T, P] elementwise+reduce was observed to compile in
# seconds at T=256 but MINUTES at T=512 on v5e.
TOKEN_TILE = 128


def _scan_min(state, hashes, lengths, a_hi, a_lo, b_hi, b_lo,
              mix: bool = False):
    """Permute+min folded over token tiles: state uint32[B, P] -> [B, P]."""
    b, t = hashes.shape
    if t % TOKEN_TILE:
        pad = TOKEN_TILE - t % TOKEN_TILE
        hashes = jnp.pad(hashes, ((0, 0), (0, pad)))
        t += pad
    nt = t // TOKEN_TILE
    tiles = hashes.reshape(b, nt, TOKEN_TILE).transpose(1, 0, 2)  # [nt, B, tile]
    offsets = jnp.arange(nt, dtype=jnp.int32) * TOKEN_TILE

    def body(carry, inp):
        tile, off = inp  # [B, tile], []
        col = off + jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
        mask = col < lengths[:, None]
        if mix:
            from datasketch_tpu.ops.hashing import mix32

            tile = mix32(tile)
        phv = _permute_all(tile, a_hi, a_lo, b_hi, b_lo)  # [B, tile, P]
        phv = jnp.where(mask[..., None], phv, jnp.uint32(MAX_HASH))
        return jnp.minimum(carry, phv.min(axis=-2)), None

    out, _ = jax.lax.scan(body, state, (tiles, offsets))
    return out


@functools.partial(jax.jit, donate_argnums=(0,))
def update_signatures(state, hashes, lengths, a_hi, a_lo, b_hi, b_lo):
    """Fold a padded batch of token hashes into existing signatures.

    Args:
        state: uint32[B, P] current signatures.
        hashes: uint32[B, T] token hashes (padded).
        lengths: int32[B] valid token counts per row.
    Returns:
        uint32[B, P] updated signatures (elementwise min semantics of
        ``/root/reference/datasketch/minhash.py:294-297``).
    """
    return _scan_min(state, hashes, lengths, a_hi, a_lo, b_hi, b_lo)


@functools.partial(jax.jit, static_argnames=("mix",))
def _sign_batch(hashes, lengths, a_hi, a_lo, b_hi, b_lo, mix: bool = False):
    """Fresh signatures in ONE dispatch (state init fused into the jit)."""
    state = jnp.full(
        (hashes.shape[0], a_hi.shape[0]), MAX_HASH, dtype=jnp.uint32
    )
    return _scan_min(state, hashes, lengths, a_hi, a_lo, b_hi, b_lo, mix=mix)


def limbs_for(seed: int, num_perm: int, permutations=None):
    """Device limb arrays for either seed-derived or explicit (a, b)."""
    if permutations is None:
        return perm_limbs(seed, num_perm)
    a, b = permutations
    a_hi, a_lo = u64.split_u64(np.asarray(a, dtype=np.uint64))
    b_hi, b_lo = u64.split_u64(np.asarray(b, dtype=np.uint64))
    return (
        jnp.asarray(a_hi),
        jnp.asarray(a_lo),
        jnp.asarray(b_hi),
        jnp.asarray(b_lo),
    )


def compute_signatures(hashes, lengths, seed: int, num_perm: int,
                       permutations=None, mix: bool = False) -> jax.Array:
    """Fresh signatures for a padded batch of token hashes.

    On TPU (when shapes tile), dispatches to the Pallas kernel
    (:func:`datasketch_tpu.ops.pallas_kernels.sign_batch_pallas`) — same
    bit-exact result, but Mosaic compiles in ~1s where the XLA fusion of
    this computation takes 20-130s per new shape on the remote-TPU path.

    Args:
        hashes: uint32[B, T] (numpy or jax), lengths: int32[B].
        permutations: optional explicit (a, b) uint64 arrays overriding the
            seed-derived family.
        mix: inputs are raw token ids, not hashes — apply the fmix32 device
            hash on-chip, fused into the kernel (the ``hashfunc='device'``
            path; host does zero per-token work).
    Returns:
        uint32[B, P] device array.
    """
    limbs = limbs_for(seed, num_perm, permutations)
    b, t = hashes.shape
    from datasketch_tpu.ops import pallas_kernels as pk

    if (
        pk.signature_kernel_available()
        and b % pk.BLOCK_B == 0
        and t % pk.TILE_T == 0
        and num_perm % 128 == 0
    ):
        h_dev, len_dev = jnp.asarray(hashes), jnp.asarray(lengths)
        if num_perm <= pk.SIGN_MAX_P:
            return pk.sign_batch_pallas(h_dev, len_dev, *limbs, mix=mix)
        # wide cascades: one kernel call per SIGN_MAX_P perm slice (the
        # minimum tile at p=1024 already blows the 16MB scoped-vmem
        # limit); interleaved draws make every slice prefix-stable, so
        # the concat is bit-identical to a single wide call
        parts = [
            pk.sign_batch_pallas(
                h_dev, len_dev,
                *(limb[off : off + pk.SIGN_MAX_P] for limb in limbs),
                mix=mix,
            )
            for off in range(0, num_perm, pk.SIGN_MAX_P)
        ]
        return jnp.concatenate(parts, axis=1)
    return _sign_batch(hashes, jnp.asarray(lengths), *limbs, mix=mix)


@functools.partial(jax.jit, static_argnames=("t",))
def _gather_rows(flat, starts, t: int):
    """Expand flat concatenated tokens to a padded [B, t] matrix ON DEVICE
    (ragged corpora otherwise ship up to ~2x padding bytes over the
    host->device link). Out-of-range slots read clamped garbage — callers
    mask by lengths."""
    b = starts.shape[0]
    idx = starts[:, None] + jax.lax.broadcasted_iota(jnp.int32, (b, t), 1)
    idx = jnp.clip(idx, 0, flat.shape[0] - 1)
    return flat[idx]


def compute_signatures_ragged(flat, lengths, seed: int, num_perm: int,
                              permutations=None, mix: bool = False):
    """Fresh signatures from flat concatenated token hashes.

    Args:
        flat: uint32[total] all docs' hashes back to back. With ``mix``
            (raw token ids) a narrower unsigned dtype (uint8/uint16) is
            accepted and zero-extended ON DEVICE — small-vocab corpora
            then ship 1/4-1/2 the bytes over the bandwidth-bound
            host->device link for identical signatures.
        lengths: int32[B] tokens per doc.
        mix: ``flat`` holds raw token ids; hash them on-chip (fmix32).
    Returns:
        uint32[B, num_perm] (only the first len(lengths) rows are real).
    """
    lengths = np.asarray(lengths, dtype=np.int32)
    n_real = lengths.shape[0]
    # bucket B to a power of two: every distinct partial-chunk size would
    # otherwise compile a fresh program (and can miss the Pallas tiling)
    b_pad = 128
    while b_pad < n_real:
        b_pad *= 2
    if b_pad != n_real:
        lengths = np.pad(lengths, (0, b_pad - n_real))
    starts = np.zeros_like(lengths)
    if lengths.size:
        np.cumsum(lengths[:-1], out=starts[1:])
    max_len = int(lengths.max()) if lengths.size else 1
    t = 128
    while t < max_len:
        t *= 2
    flat = np.asarray(flat)
    if flat.dtype != np.uint32 and not (
        mix and flat.dtype in (np.uint8, np.uint16)
    ):
        flat = flat.astype(np.uint32)
    if flat.shape[0] == 0:
        flat = np.zeros(1, dtype=flat.dtype)
    hashes = _gather_rows(jnp.asarray(flat), jnp.asarray(starts), t)
    if hashes.dtype != jnp.uint32:
        hashes = hashes.astype(jnp.uint32)  # widen post-gather, on device
    return compute_signatures(hashes, lengths, seed, num_perm,
                              permutations=permutations, mix=mix)[:n_real]


@jax.jit
def jaccard_pairwise(sig_a, sig_b):
    """Rowwise Jaccard estimate between two signature batches [B, P]."""
    return (sig_a == sig_b).mean(axis=-1, dtype=jnp.float32)


@jax.jit
def jaccard_matrix(sig_q, sig_d):
    """All-pairs Jaccard estimates: [Q, P] x [D, P] -> float32[Q, D].

    Equality-count form of ``/root/reference/datasketch/minhash.py:324``.
    """
    eq = sig_q[:, None, :] == sig_d[None, :, :]
    return eq.mean(axis=-1, dtype=jnp.float32)


@jax.jit
def merge_signatures(sig_a, sig_b):
    """Elementwise-min merge (union semantics, minhash.py:337-359)."""
    return jnp.minimum(sig_a, sig_b)

"""b-bit MinHash device ops: packed storage + SWAR similarity scans.

The reference keeps b-bit MinHash as a host-side pairwise object
(``/root/reference/datasketch/b_bit_minhash.py:13-172``: mask to the b
lowest bits, estimate Jaccard from the fraction of equal slots with the
Li & Koenig ``(raw - C1) / (1 - C2)`` correction, bit-pack only for
serialization). On TPU the packing IS the serving format: signatures
are stored as s-bit slots inside uint32 words (s = the reference's slot
ladder, ``b_bit_minhash.py:147-160``), so a b=4 corpus holds 8 slots per
word — 8x more resident sketches per byte of HBM than full uint32
signatures, and 32x at b=1. Slot equality over a query/db pair is then
pure VPU integer work: XOR, a SWAR OR-fold that lands each slot's
"any bit set" flag on the slot's LSB, and ``population_count``.

Everything here is jittable with static ``b``; no module-level device
constants (import hygiene).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "slot_size",
    "words_per_sig",
    "pack_bbit",
    "pack_bbit_host",
    "match_counts",
    "bbit_topk_scan",
    "estimator_constants",
]


def slot_size(b: int) -> int:
    """Storage bits per hash value — the reference's exact slot ladder
    (``b_bit_minhash.py:147-160``; note b=0 lands on 4 there too)."""
    if b == 1:
        return 1
    if b == 2:
        return 2
    for limit in (4, 8, 16, 32):
        if b <= limit:
            return limit
    raise ValueError("b must be an integer in [0, 32]")


def words_per_sig(num_perm: int, b: int) -> int:
    """uint32 words holding one packed ``num_perm``-slot signature."""
    spw = 32 // slot_size(b)
    return -(-num_perm // spw)


@functools.partial(jax.jit, static_argnames=("b",))
def pack_bbit(sigs, b: int):
    """uint32[N, P] signatures -> uint32[N, W] packed b-bit slots.

    Slots are LSB-first within each word (slot j of a word occupies bits
    ``[j*s, (j+1)*s)``); padding slots past P are zero. Keeps the low b
    bits of each value, exactly like ``bBitMinHash.__init__``
    (``b_bit_minhash.py:40-43``).
    """
    s = slot_size(b)
    spw = 32 // s
    n, p = sigs.shape
    w = -(-p // spw)
    v = sigs.astype(jnp.uint32) & jnp.uint32((1 << b) - 1)
    pad = w * spw - p
    if pad:
        v = jnp.pad(v, ((0, 0), (0, pad)))
    v = v.reshape(n, w, spw)
    shifts = (jnp.arange(spw, dtype=jnp.uint32) * s)[None, None, :]
    # slots occupy disjoint bit ranges, so a sum is a bitwise OR
    return (v << shifts).sum(axis=2, dtype=jnp.uint32)


def pack_bbit_host(sigs: np.ndarray, b: int) -> np.ndarray:
    """NumPy twin of :func:`pack_bbit` (bit-identical layout)."""
    s = slot_size(b)
    spw = 32 // s
    sigs = np.asarray(sigs, dtype=np.uint32)
    n, p = sigs.shape
    w = -(-p // spw)
    v = sigs & np.uint32((1 << b) - 1)
    pad = w * spw - p
    if pad:
        v = np.pad(v, ((0, 0), (0, pad)))
    v = v.reshape(n, w, spw).astype(np.uint64)
    shifts = (np.arange(spw, dtype=np.uint64) * np.uint64(s))[None, None, :]
    return (v << shifts).sum(axis=2).astype(np.uint32)


def _lsb_mask(s: int) -> int:
    """uint32 mask with bit 1 at every slot LSB (bits 0, s, 2s, ...)."""
    m = 0
    for j in range(0, 32, s):
        m |= 1 << j
    return m


def _equal_slot_count(x, s: int):
    """Per-word count of all-zero s-bit slots in uint32 ``x``.

    SWAR: OR-fold each slot's bits down onto its LSB (shifts 1, 2, ...,
    s/2 move a bit down by at most s-1, so a neighbouring slot's bits —
    at distance >= s — can never reach this slot's LSB), invert, mask
    the slot LSBs, popcount.
    """
    if s == 32:
        return (x == 0).astype(jnp.int32)
    y = x
    sh = 1
    while sh < s:
        y = y | (y >> sh)
        sh *= 2
    eq = (~y) & jnp.uint32(_lsb_mask(s))
    return jax.lax.population_count(eq).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("b", "num_perm"))
def match_counts(q_packed, db_packed, b: int, num_perm: int):
    """Equal-slot counts: uint32[Q, W] x uint32[N, W] -> int32[Q, N].

    Counts slots where the b-bit values agree — the ``intersection`` of
    ``bBitMinHash.jaccard`` (``b_bit_minhash.py:66``) batched all-pairs.
    Padding slots (zero in both operands by construction) always match
    and are subtracted out.
    """
    s = slot_size(b)
    spw = 32 // s
    w = q_packed.shape[1]
    pad_slots = w * spw - num_perm
    x = q_packed[:, None, :] ^ db_packed[None, :, :]  # [Q, N, W]
    cnt = _equal_slot_count(x, s).sum(axis=2)
    return cnt - jnp.int32(pad_slots)


def bbit_topk_scan(db_packed, q_packed, k: int, b: int, num_perm: int,
                   n_valid=None, alive=None, tile: int = 2048):
    """Exact top-k over packed b-bit signatures — no banding.

    The b-bit twin of :func:`datasketch_tpu.ops.lsh_ops.topk_scan`: the
    whole packed corpus streams through VMEM once per query tile with a
    running top-k carry. At equal HBM budget the packed scan holds
    ``32/s`` x more sketches resident than the full-signature scan (32x
    at b=1), at the cost of the Li & Koenig estimation-noise penalty the
    reference documents for small b.

    Args:
        db_packed: uint32[N_pad, W] packed rows (padded rows allowed).
        q_packed: uint32[Q, W] packed queries.
        k: results per query.
        b: bits per slot (static).
        num_perm: real slots per signature (static; excludes pad slots).
        n_valid: scalar int32 — rows >= n_valid are padding.
        alive: optional bool[N_pad] tombstone mask (False = removed).
        tile: rows scored per scan step.

    Returns:
        (top_ids int32[Q, k], counts int32[Q, k]) — exact equal-slot
        counts (divide by ``num_perm`` and apply
        :func:`estimator_constants` for the unbiased estimate; the
        correction is affine, so the count ordering is already final).
        Empty slots have id -1 and count -1.
    """
    n_pad, w = db_packed.shape
    q = q_packed.shape[0]
    tile = min(tile, n_pad)
    n_tiles = -(-n_pad // tile)
    pad_rows = n_tiles * tile - n_pad
    if pad_rows:
        db_packed = jnp.pad(db_packed, ((0, pad_rows), (0, 0)))
    s = slot_size(b)
    spw = 32 // s
    pad_slots = w * spw - num_perm
    # Mosaic scorer for the [Q, tile, W] XOR+fold+popcount (the XLA
    # fusion of this shape family compiles pathologically through the
    # remote-TPU path — same story as lsh_ops.topk_scan); query rows are
    # padded to the kernel block and sliced after.
    from datasketch_tpu.ops import lsh_ops
    from datasketch_tpu.ops import pallas_kernels as pk

    use_pallas = lsh_ops._score_kernel_ok(128) and tile % pk.SCORE_BT == 0
    q_pad = ((-q) % pk.SCORE_BQ) if use_pallas else 0
    if q_pad:
        q_packed = jnp.pad(q_packed, ((0, q_pad), (0, 0)))
    q_run = q + q_pad
    nv = jnp.int32(n_pad) if n_valid is None else n_valid.astype(jnp.int32)
    if alive is not None and alive.shape[0] != n_tiles * tile:
        alive = jnp.pad(alive, (0, n_tiles * tile - alive.shape[0]))
    base = jnp.arange(tile, dtype=jnp.int32)
    k_eff = min(k, tile)

    def body(carry, inp):
        c_sc, c_ids = carry
        if alive is not None:
            db_tile, t_idx, alive_tile = inp
        else:
            db_tile, t_idx = inp
            alive_tile = None
        ids = base + t_idx * tile
        if use_pallas:
            cnt = pk.bbit_scores_pallas(
                q_packed, db_tile, s,
                interpret=lsh_ops.SCORE_KERNEL_INTERPRET,
            ) - jnp.int32(pad_slots)
        else:
            x = q_packed[:, None, :] ^ db_tile[None, :, :]  # [Q, tile, W]
            cnt = _equal_slot_count(x, s).sum(axis=2) - jnp.int32(pad_slots)
        valid = ids < nv
        if alive_tile is not None:
            valid = valid & alive_tile
        cnt = jnp.where(valid[None, :], cnt, -1)
        sc = jnp.concatenate([c_sc, cnt], axis=1)
        idc = jnp.concatenate(
            [c_ids, jnp.broadcast_to(ids[None, :], (q_run, tile))], axis=1
        )
        top_sc, pos = jax.lax.top_k(sc, k_eff)
        top_ids = jnp.take_along_axis(idc, pos, axis=1)
        return (top_sc, top_ids), None

    # carry init derived from the inputs (shard_map-safe; folds to
    # constants under plain jit — see lsh_ops.topk_scan)
    zero = (
        (db_packed[:1, :1] & jnp.uint32(0)) | (q_packed[:1, :1] & jnp.uint32(0))
    ).astype(jnp.int32)
    init = (
        jnp.broadcast_to(zero, (q_run, k_eff)) - 1,
        jnp.broadcast_to(zero, (q_run, k_eff)) - 1,
    )
    xs = (
        db_packed.reshape(n_tiles, tile, w),
        jnp.arange(n_tiles, dtype=jnp.int32),
    )
    if alive is not None:
        xs = xs + (alive.reshape(n_tiles, tile),)
    (sc, ids), _ = jax.lax.scan(body, init, xs)
    if q_pad:
        sc, ids = sc[:q], ids[:q]
    ids = jnp.where(sc >= 0, ids, -1)
    if k_eff < k:
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        sc = jnp.pad(sc, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return ids, sc


def estimator_constants(b: int, r1: float = 0.0, r2: float = 0.0):
    """(C1, C2) of the Li & Koenig unbiased estimator
    ``jaccard = (raw - C1) / (1 - C2)`` — exact host formulas of
    ``bBitMinHash._calc_a`` / ``_calc_c`` (``b_bit_minhash.py:111-123``).
    """

    def calc_a(r, bb):
        if r == 0.0:
            return 1.0 / (1 << bb)
        return r * (1 - r) ** (2**bb - 1) / (1 - (1 - r) ** (2 * bb))

    a1 = calc_a(r1, b)
    a2 = calc_a(r2, b)
    if r1 == 0.0 and r2 == 0.0:
        return a1, a2
    div = 1 / (r1 + r2)
    return (a1 * r2 + a2 * r1) * div, (a1 * r1 + a2 * r2) * div

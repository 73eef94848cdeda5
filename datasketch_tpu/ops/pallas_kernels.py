"""Pallas TPU kernels for the sketch hot paths.

The MinHash signature kernel replaces the XLA scan form
(:func:`datasketch_tpu.ops.minhash_ops._scan_min`) on TPU: a 2-D grid over
(batch blocks, token tiles) keeps the permuted [rows, P] intermediate in
VMEM, accumulates the running min into the output block (TPU grids execute
sequentially, so revisiting the same out block across the token-tile axis
is the standard reduction pattern), and compiles via Mosaic in ~1s — the
XLA fusion of the same computation was observed to take 20-130s per shape
through the remote-TPU path.

Reference computation: ``(a*h+b) mod 2**64 mod (2**61-1) & (2**32-1)``
column-min over tokens (``/root/reference/datasketch/minhash.py:293-297``),
bit-exact via uint32 limb arithmetic (datasketch_tpu/ops/u64.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from datasketch_tpu.ops import u64

__all__ = [
    "signature_kernel_available",
    "sign_batch_pallas",
    "score_matrix_pallas",
    "rerank_scores_pallas",
    "cws_many_pallas",
    "cws_sparse_pallas",
    "bbit_scores_pallas",
    "topk_scan_pallas",
    "TOPK_BQ",
    "TOPK_BT",
    "SCORE_BQ",
    "SCORE_BT",
    "CWS_BB",
    "CWS_BS",
    "CWS_BD",
]

MAX_HASH = u64.MAX_HASH

BLOCK_B = 8  # batch rows per grid step (uint32 sublane multiple)
TILE_T = 128  # tokens per grid step (lane multiple) — the DIVISIBILITY
# contract callers pad to. The kernel itself runs at the largest token
# tile the shape and VMEM allow (_sign_tiles): fewer grid steps mean
# fewer out-block revisits and less per-step overhead — measured 28-48%
# -> 70% of the v5e VPU roofline going from (8, 128) to (8, 512) tiles
# at [1024, 512] x 128 perms (round-4 sweep; BASELINE.md).

# Per-temporary VMEM budget for the permuted [BLOCK_B, tile, P] uint32
# intermediates: 8 * 512 * 128 slots (2 MiB) is the largest measured-good
# configuration; the handful of live temporaries in the u64 limb chain
# stays inside VMEM at that size.
_SIGN_SLOT_BUDGET = 8 * 512 * 128

# Widest perm axis one kernel call fits: past this even the minimum
# (8, 128) tile blows the 16MB scoped-vmem limit (p=1024 allocated
# 17.18M), so compute_signatures splits the perm axis into
# SIGN_MAX_P-wide calls and concatenates.
SIGN_MAX_P = _SIGN_SLOT_BUDGET // (BLOCK_B * TILE_T)


def _sign_tiles(b: int, t: int, p: int):
    """(block_b, tile_t) actually used for a [b, t] x p signature call."""
    tile_t = TILE_T
    while (
        tile_t * 2 <= t
        and t % (tile_t * 2) == 0
        and BLOCK_B * tile_t * 2 * p <= _SIGN_SLOT_BUDGET
    ):
        tile_t *= 2
    block_b = BLOCK_B
    if tile_t == TILE_T and b % (2 * BLOCK_B) == 0 and (
        2 * BLOCK_B * tile_t * p <= _SIGN_SLOT_BUDGET
    ):
        # short token axis: widen the batch block instead (measured 67%
        # vs 28-48% VPU at [1024, 512] when the token tile is pinned)
        block_b = 2 * BLOCK_B
    return block_b, tile_t


def signature_kernel_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _sign_kernel(h_ref, len_ref, a_hi_ref, a_lo_ref, b_hi_ref, b_lo_ref,
                 out_ref, *, block_b: int, tile_t: int, mix: bool = False):
    """One (batch block, token tile) step: permute + mask + running min.

    h_ref: uint32[block_b, tile_t]; len_ref: int32[block_b, 1];
    params: uint32[1, P]; out_ref: uint32[block_b, P] (revisited across the
    token-tile grid axis). With ``mix``, inputs are raw token ids and the
    fmix32 finalizer (:func:`datasketch_tpu.ops.hashing.mix32`) runs here,
    fused — the device-hash path for pre-tokenized corpora.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, MAX_HASH)

    h2 = h_ref[:]
    if mix:
        # fmix32 inline (constants materialized here: Mosaic kernels must
        # not close over module-level jnp values)
        h2 ^= h2 >> 16
        h2 *= jnp.uint32(0x85EBCA6B)
        h2 ^= h2 >> 13
        h2 *= jnp.uint32(0xC2B2AE35)
        h2 ^= h2 >> 16
    # [BB, T, 1] tokens broadcast against [P] params -> [BB, T, P]
    # (no reshapes: Mosaic rejects lane<->sublane shape casts).
    h3 = h2[:, :, None]
    phv = u64.permute_hash(
        h3, a_hi_ref[0], a_lo_ref[0], b_hi_ref[0], b_lo_ref[0]
    )  # [BB, T, P] uint32

    # Mask padding tokens to MAX_HASH: global token col = j*tile_t + local.
    # The comparison is built directly in 3-D — expanding a 2-D bool with
    # [:, :, None] lowers to an unsupported i1 shape cast in Mosaic.
    p = phv.shape[-1]
    col3 = j * tile_t + jax.lax.broadcasted_iota(
        jnp.int32, (block_b, tile_t, p), 1
    )
    len3 = len_ref[:][:, :, None]  # int expand: supported
    phv = jnp.where(col3 < len3, phv, jnp.uint32(MAX_HASH))

    # Mosaic has no unsigned reductions; x ^ 0x80000000 maps unsigned order
    # onto signed order, so min() in the biased int32 domain is equivalent.
    bias = jnp.uint32(0x80000000)
    biased = pltpu.bitcast(phv ^ bias, jnp.int32)
    tile_min = biased.min(axis=1)  # [BB, P]
    cur = pltpu.bitcast(out_ref[:] ^ bias, jnp.int32)
    new = jnp.minimum(cur, tile_min)
    out_ref[:] = pltpu.bitcast(new, jnp.uint32) ^ bias


@functools.partial(jax.jit, static_argnames=("interpret", "mix"))
def sign_batch_pallas(hashes, lengths, a_hi, a_lo, b_hi, b_lo,
                      interpret: bool = False, mix: bool = False):
    """MinHash signatures via the Pallas kernel.

    Args:
        hashes: uint32[B, T], B % BLOCK_B == 0, T % TILE_T == 0 (the caller
            pads; padding tokens are masked by lengths).
        lengths: int32[B].
        a_hi..b_lo: uint32[P] permutation limbs, P % 128 == 0.
        mix: inputs are raw token ids; apply fmix32 on-chip first.
    Returns:
        uint32[B, P] signatures.
    """
    b, t = hashes.shape
    p = a_hi.shape[0]
    if b % BLOCK_B or t % TILE_T:
        raise ValueError(
            "hashes shape (%d, %d) must tile by (%d, %d)"
            % (b, t, BLOCK_B, TILE_T)
        )
    bb, tt = _sign_tiles(b, t, p)
    grid = (b // bb, t // tt)
    params2d = [x.reshape(1, p) for x in (a_hi, a_lo, b_hi, b_lo)]
    return pl.pallas_call(
        functools.partial(_sign_kernel, block_b=bb, tile_t=tt, mix=mix),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (bb, tt),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((bb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, p), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, p), jnp.uint32),
        interpret=interpret,
    )(hashes, lengths.reshape(b, 1).astype(jnp.int32), *params2d)


# ---------------------------------------------------------------- query path

SCORE_BQ = 8  # query rows per grid step
SCORE_BT = 128  # db rows per grid step; the [BQ, BT, P] compare is 512 KB
# of bool at P=128 — VMEM-sized with headroom for the int32 partials.


def _score_kernel(q_ref, db_ref, out_ref):
    """Jaccard-estimate scores for one (query block, db tile) pair.

    q_ref: uint32[SCORE_BQ, P]; db_ref: uint32[SCORE_BT, P];
    out_ref: float32[SCORE_BQ, SCORE_BT] = mean over P of slot equality —
    the compare+mean at the heart of every serving query (the rerank the
    reference docs prescribe, ``/root/reference/datasketch/lsh.py:374-378``,
    and the exact-scan top-k). As a Mosaic kernel it compiles in ~1s per
    shape; the same computation as an XLA fusion was observed to take
    minutes through the remote-TPU path for unlucky [Q, T, P] shapes.
    """
    p = q_ref.shape[-1]
    # operands broadcast to rank 3 BEFORE the compare: the i1 result is
    # born in its final rank (Mosaic rejects i1 shape casts)
    eq = q_ref[:][:, None, :] == db_ref[:][None, :, :]  # [BQ, BT, P] i1
    counts = jnp.sum(eq.astype(jnp.float32), axis=-1)  # [BQ, BT]
    out_ref[:] = counts / p  # sum-then-divide == jnp.mean bit-for-bit


@functools.partial(jax.jit, static_argnames=("interpret",))
def score_matrix_pallas(q_sigs, db_sigs, interpret: bool = False):
    """All-pairs signature-equality scores: [Q, P] x [T, P] -> f32[Q, T].

    Same result as ``(q[:, None, :] == db[None, :, :]).mean(-1)``
    (:func:`datasketch_tpu.ops.minhash_ops.jaccard_matrix`), tiled so the
    [BQ, BT, P] intermediate never leaves VMEM. Requires Q % SCORE_BQ == 0,
    T % SCORE_BT == 0, P % 128 == 0 (callers pad).
    """
    q, p = q_sigs.shape
    t = db_sigs.shape[0]
    if q % SCORE_BQ or t % SCORE_BT or p % 128:
        raise ValueError(
            "score_matrix_pallas shapes (%d, %d, %d) must tile by (%d, %d, 128)"
            % (q, t, p, SCORE_BQ, SCORE_BT)
        )
    return pl.pallas_call(
        _score_kernel,
        grid=(q // SCORE_BQ, t // SCORE_BT),
        in_specs=[
            pl.BlockSpec((SCORE_BQ, p), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SCORE_BT, p), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (SCORE_BQ, SCORE_BT), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((q, t), jnp.float32),
        interpret=interpret,
    )(q_sigs, db_sigs)


# ------------------------------------------------------------------ CWS path

CWS_BB = 8  # weight rows per grid step
CWS_BS = 128  # samples per grid step (lane-aligned output columns)
CWS_BD = 128  # weight dims per grid step; the [BB, BS, BD] f32 intermediates
# are 512 KB each — a handful live stays inside VMEM.


def _cws_kernel(w_ref, r_ref, lncs_ref, beta_ref, best_ref, k_ref, t_ref):
    """Ioffe CWS for one (batch block, sample block, dim tile).

    Running reduction over the dim-tile grid axis: ``best`` carries the
    minimum ``ln_a`` seen so far, ``k``/``t`` the argmin dim and its
    ``t`` value. Ties resolve to the lowest dim index (argmin semantics:
    strictly-less across tiles + min-index within a tile). Same math and
    op order as :func:`datasketch_tpu.ops.cws_ops.cws_many` (reference
    formula: ``/root/reference/datasketch/weighted_minhash.py:141-159``).
    """
    d = pl.program_id(2)

    @pl.when(d == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        k_ref[:] = jnp.zeros_like(k_ref)
        t_ref[:] = jnp.zeros_like(t_ref)

    w = w_ref[:]  # [BB, BD]
    active = w > 0
    vlog = jnp.where(active, jnp.log(jnp.where(active, w, 1.0)), 0.0)
    r = r_ref[:]  # [BS, BD]
    beta = beta_ref[:]
    lncs = lncs_ref[:]
    # [BB, BS, BD]; zero-weight dims get +inf (never win the argmin)
    t3 = jnp.floor(vlog[:, None, :] / r[None] + beta[None])
    ln_a = lncs[None] - (t3 - beta[None]) * r[None] - r[None]
    # mask built directly in rank 3 (Mosaic rejects i1 shape casts)
    ln_a = jnp.where(w[:, None, :] > 0, ln_a, jnp.inf)

    local_min = ln_a.min(axis=2)  # [BB, BS]
    iota = d * CWS_BD + jax.lax.broadcasted_iota(jnp.int32, ln_a.shape, 2)
    big = jnp.int32(0x7FFFFFFF)
    local_k = jnp.where(ln_a == local_min[:, :, None], iota, big).min(axis=2)
    t_at_k = jnp.where(iota == local_k[:, :, None], t3, -jnp.inf).max(axis=2)

    better = local_min < best_ref[:]
    best_ref[:] = jnp.where(better, local_min, best_ref[:])
    k_ref[:] = jnp.where(better, local_k, k_ref[:])
    t_ref[:] = jnp.where(better, t_at_k.astype(jnp.int32), t_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def cws_many_pallas(weights, rs, ln_cs, betas, interpret: bool = False):
    """Batched Ioffe CWS via Mosaic: f32[B, D] weights -> int32[B, S, 2].

    Same (k, t) rows as :func:`datasketch_tpu.ops.cws_ops.cws_many` for
    every row with at least one positive weight (all-zero rows are the
    caller's responsibility there too). Pads B/S/D to tile multiples
    internally; padding dims carry zero weight (inactive) and padding
    samples are sliced off. The value over the XLA scan is compile-time
    immunity: Mosaic compiles in ~1s per shape where XLA fusions of the
    [B, S, D] intermediate were observed to take minutes through the
    remote-TPU path.
    """
    b, dim = weights.shape
    s = rs.shape[0]
    pad_b = (-b) % CWS_BB
    pad_s = (-s) % CWS_BS
    pad_d = (-dim) % CWS_BD
    w = jnp.pad(weights.astype(jnp.float32), ((0, pad_b), (0, pad_d)))
    # padded sample rows use r=1 (avoid 0-division); sliced off below.
    # padded dim columns keep r=1 too, but their weights are 0 => inactive.
    rs_p = jnp.pad(
        rs.astype(jnp.float32), ((0, pad_s), (0, pad_d)), constant_values=1.0
    )
    lncs_p = jnp.pad(ln_cs.astype(jnp.float32), ((0, pad_s), (0, pad_d)))
    betas_p = jnp.pad(betas.astype(jnp.float32), ((0, pad_s), (0, pad_d)))
    bb, ss, dd = b + pad_b, s + pad_s, dim + pad_d
    _, ks, ts = pl.pallas_call(
        _cws_kernel,
        grid=(bb // CWS_BB, ss // CWS_BS, dd // CWS_BD),
        in_specs=[
            pl.BlockSpec((CWS_BB, CWS_BD), lambda i, j, d: (i, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CWS_BS, CWS_BD), lambda i, j, d: (j, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CWS_BS, CWS_BD), lambda i, j, d: (j, d),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CWS_BS, CWS_BD), lambda i, j, d: (j, d),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CWS_BB, CWS_BS), lambda i, j, d: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CWS_BB, CWS_BS), lambda i, j, d: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CWS_BB, CWS_BS), lambda i, j, d: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bb, ss), jnp.float32),
            jax.ShapeDtypeStruct((bb, ss), jnp.int32),
            jax.ShapeDtypeStruct((bb, ss), jnp.int32),
        ],
        interpret=interpret,
    )(w, rs_p, lncs_p, betas_p)
    return jnp.stack([ks[:b, :s], ts[:b, :s]], axis=-1)


CWS_SP_BNZ = 128  # active dims (nnz slots) per grid step of the sparse
# CWS kernel — the reduction axis, tiled like the dense kernel's dim axis.


def _cws_sparse_kernel(w_ref, idx_ref, r_ref, lncs_ref, beta_ref,
                       best_ref, k_ref, t_ref):
    """Ioffe CWS over a sparse row chunk: one (batch, sample, nnz) step.

    Same math, op order, and tie-breaking as :func:`_cws_kernel`, but
    the reduction axis holds only each row's ACTIVE dims (CSR values +
    dim indices) instead of the full dim range: w_ref/idx_ref
    [BB, BNZ]; r/lncs/beta are the per-row GATHERED parameter columns
    [BB, BNZ, BS] (the gather stays in XLA — cheap to compile; this
    [B, NZ, S] elementwise+reduce is the shape-pathological part).
    CSR indices are sorted ascending per row, so the lowest-position
    tie-break below equals the dense kernel's lowest-dim-index rule and
    (k, t) stay bit-identical to the dense path. Padding slots carry
    w = 0 (inactive). Reference formula:
    ``/root/reference/datasketch/weighted_minhash.py:141-159``.
    """
    z = pl.program_id(2)

    @pl.when(z == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, jnp.inf)
        k_ref[:] = jnp.zeros_like(k_ref)
        t_ref[:] = jnp.zeros_like(t_ref)

    w = w_ref[:]  # [BB, BNZ]
    active = w > 0
    vlog = jnp.where(active, jnp.log(jnp.where(active, w, 1.0)), 0.0)
    r = r_ref[:]  # [BB, BNZ, BS]
    beta = beta_ref[:]
    lncs = lncs_ref[:]
    t3 = jnp.floor(vlog[:, :, None] / r + beta)
    ln_a = lncs - (t3 - beta) * r - r
    # mask built directly in rank 3 (Mosaic rejects i1 shape casts)
    ln_a = jnp.where(w[:, :, None] > 0, ln_a, jnp.inf)

    local_min = ln_a.min(axis=1)  # [BB, BS]
    bnz = w.shape[1]
    pos = z * bnz + jax.lax.broadcasted_iota(jnp.int32, ln_a.shape, 1)
    big = jnp.int32(0x7FFFFFFF)
    local_pos = jnp.where(
        ln_a == local_min[:, None, :], pos, big
    ).min(axis=1)
    at = pos == local_pos[:, None, :]
    k_at = jnp.where(at, idx_ref[:][:, :, None], -1).max(axis=1)
    t_at = jnp.where(at, t3, -jnp.inf).max(axis=1)

    better = local_min < best_ref[:]  # ties keep the carry: earlier
    # nnz tile = lower position = lower dim, the dense argmin order
    best_ref[:] = jnp.where(better, local_min, best_ref[:])
    k_ref[:] = jnp.where(better, k_at, k_ref[:])
    t_ref[:] = jnp.where(better, t_at.astype(jnp.int32), t_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def cws_sparse_pallas(vals, idx, rs_t, lncs_t, betas_t,
                      interpret: bool = False):
    """Sparse-input CWS via Mosaic: ragged (values, dim indices) rows.

    Args:
        vals: float32[B, NZ] positive weights, zero-padded on the right.
        idx: int32[B, NZ] dim index per value, sorted ascending per row
            (CSR order), zero-padded (padding slots have vals == 0).
        rs_t, lncs_t, betas_t: float32[D, S] TRANSPOSED generator
            parameters — rows of these are gathered at ``idx``.

    Returns:
        int32[B, S, 2] (k, t) rows, bit-identical to
        :func:`cws_many_pallas` on the densified equivalent. All-zero
        rows (no positive value) return (0, 0) garbage — callers
        exclude them, exactly as the dense path.

    This is the transport-bound breaker for the CWS device path: a ~2%
    dense dim=10k row ships ~2KB (256 value+index pairs) instead of the
    40KB dense row — the tunnel H2D at ~50MB/s is the end-to-end bound
    (BASELINE.md), so bytes-per-row is the throughput lever. Compute
    also drops ~D/NZ-fold. HBM cost is the [B, NZ, S] gathered
    parameter intermediates (device-side only).
    """
    b, nz = vals.shape
    s = rs_t.shape[1]
    pad_b = (-b) % CWS_BB
    pad_nz = (-nz) % CWS_SP_BNZ
    pad_s = (-s) % CWS_BS
    vals_p = jnp.pad(vals.astype(jnp.float32), ((0, pad_b), (0, pad_nz)))
    idx_p = jnp.pad(idx.astype(jnp.int32), ((0, pad_b), (0, pad_nz)))
    # padded sample columns use r=1 (avoid 0-division); sliced off below
    rs_tp = jnp.pad(
        rs_t.astype(jnp.float32), ((0, 0), (0, pad_s)), constant_values=1.0
    )
    lncs_tp = jnp.pad(lncs_t.astype(jnp.float32), ((0, 0), (0, pad_s)))
    betas_tp = jnp.pad(betas_t.astype(jnp.float32), ((0, 0), (0, pad_s)))
    r_g = rs_tp[idx_p]  # [B, NZ, S] per-row parameter columns
    lncs_g = lncs_tp[idx_p]
    beta_g = betas_tp[idx_p]
    bb, nzz, ss = b + pad_b, nz + pad_nz, s + pad_s
    param_spec = pl.BlockSpec(
        (CWS_BB, CWS_SP_BNZ, CWS_BS), lambda i, j, z: (i, z, j),
        memory_space=pltpu.VMEM,
    )
    row_spec = pl.BlockSpec(
        (CWS_BB, CWS_SP_BNZ), lambda i, j, z: (i, z),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (CWS_BB, CWS_BS), lambda i, j, z: (i, j), memory_space=pltpu.VMEM
    )
    _, ks, ts = pl.pallas_call(
        _cws_sparse_kernel,
        grid=(bb // CWS_BB, ss // CWS_BS, nzz // CWS_SP_BNZ),
        in_specs=[row_spec, row_spec, param_spec, param_spec, param_spec],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bb, ss), jnp.float32),
            jax.ShapeDtypeStruct((bb, ss), jnp.int32),
            jax.ShapeDtypeStruct((bb, ss), jnp.int32),
        ],
        interpret=interpret,
    )(vals_p, idx_p, r_g, lncs_g, beta_g)
    return jnp.stack([ks[:b, :s], ts[:b, :s]], axis=-1)


def _rerank_kernel(q_ref, cand_ref, out_ref):
    """Candidate rerank scores for one (query block, candidate tile).

    q_ref: uint32[SCORE_BQ, P]; cand_ref: uint32[SCORE_BQ, SCORE_BT, P]
    (gathered candidate signatures, row i belongs to query i);
    out_ref: float32[SCORE_BQ, SCORE_BT].
    """
    p = q_ref.shape[-1]
    eq = cand_ref[:] == q_ref[:][:, None, :]  # [BQ, BT, P] i1
    out_ref[:] = jnp.sum(eq.astype(jnp.float32), axis=-1) / p


@functools.partial(jax.jit, static_argnames=("interpret",))
def rerank_scores_pallas(q_sigs, cand_sigs, interpret: bool = False):
    """Per-query candidate scores: [Q, P] x [Q, C, P] -> f32[Q, C].

    The compare+mean half of ``lsh_ops.rerank_jaccard`` (the gather that
    produces ``cand_sigs`` stays in XLA — it is a cheap-to-compile op;
    the [Q, C, P] elementwise+reduce is the shape-pathological part).
    Requires Q % SCORE_BQ == 0, C % SCORE_BT == 0, P % 128 == 0.
    """
    q, p = q_sigs.shape
    c = cand_sigs.shape[1]
    if q % SCORE_BQ or c % SCORE_BT or p % 128:
        raise ValueError(
            "rerank_scores_pallas shapes (%d, %d, %d) must tile by (%d, %d, 128)"
            % (q, c, p, SCORE_BQ, SCORE_BT)
        )
    return pl.pallas_call(
        _rerank_kernel,
        grid=(q // SCORE_BQ, c // SCORE_BT),
        in_specs=[
            pl.BlockSpec((SCORE_BQ, p), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SCORE_BQ, SCORE_BT, p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (SCORE_BQ, SCORE_BT), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((q, c), jnp.float32),
        interpret=interpret,
    )(q_sigs, cand_sigs)


# ----------------------------------------------------------- b-bit scan path


def _bbit_kernel(s: int, q_ref, db_ref, out_ref):
    """Equal-slot counts for one (query block, packed db tile) pair.

    q_ref: uint32[SCORE_BQ, W]; db_ref: uint32[SCORE_BT, W];
    out_ref: int32[SCORE_BQ, SCORE_BT] = number of equal s-bit slots per
    row pair, INCLUDING the always-equal padding slots past num_perm
    (callers subtract those). XOR + SWAR OR-fold + popcount, bit-for-bit
    the computation of :func:`datasketch_tpu.ops.bbit_ops._equal_slot_count`
    (reference estimator input: ``/root/reference/datasketch/
    b_bit_minhash.py:53-72``).
    """
    x = q_ref[:][:, None, :] ^ db_ref[:][None, :, :]  # [BQ, BT, W] u32
    # OR-fold each slot's bits onto its LSB; a neighbouring slot's bits
    # (distance >= s) can never reach this slot's LSB
    sh = 1
    while sh < s:
        x = x | (x >> sh)
        sh *= 2
    mask = 0
    for j in range(0, 32, s):
        mask |= 1 << j
    eq = (~x) & jnp.uint32(mask)
    cnt = jax.lax.population_count(eq).astype(jnp.int32)
    out_ref[:] = jnp.sum(cnt, axis=-1)


@functools.partial(jax.jit, static_argnames=("s", "interpret"))
def bbit_scores_pallas(q_packed, db_packed, s: int, interpret: bool = False):
    """All-pairs packed equal-slot counts: [Q, W] x [T, W] -> i32[Q, T].

    Mosaic form of the b-bit scan-body score (the [Q, T, W] XOR+fold+
    popcount is the same shape-pathological elementwise+reduce family as
    the full-signature compare+mean). ``s`` is the storage slot size in
    bits (:func:`datasketch_tpu.ops.bbit_ops.slot_size`). Requires
    Q % SCORE_BQ == 0 and T % SCORE_BT == 0 (W is the lane axis and
    needs no tiling — it is at most 128 at num_perm=256, s=16).
    """
    q, w = q_packed.shape
    t = db_packed.shape[0]
    if q % SCORE_BQ or t % SCORE_BT:
        raise ValueError(
            "bbit_scores_pallas shapes (%d, %d) must tile by (%d, %d)"
            % (q, t, SCORE_BQ, SCORE_BT)
        )
    return pl.pallas_call(
        functools.partial(_bbit_kernel, s),
        grid=(q // SCORE_BQ, t // SCORE_BT),
        in_specs=[
            pl.BlockSpec((SCORE_BQ, w), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SCORE_BT, w), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (SCORE_BQ, SCORE_BT), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((q, t), jnp.int32),
        interpret=interpret,
    )(q_packed, db_packed)


# ------------------------------------------------------ fused top-k scan path

TOPK_BQ = 64  # query rows per grid step: db HBM traffic is
# (Q / TOPK_BQ) * N * 4P bytes, so wider query blocks directly cut the
# scan's bandwidth bill. Swept on v5e at [8k x 131k x 128]: 64x256 won
# (18.7k q/s dedup / 25.2k q/s top-k vs 15.8/21.9 at 16x256); the
# [BQ, BT, P] f32 partial is 8MB at P=128 — inside ~16MB VMEM, barely,
# which is why BQ stops at 64.
TOPK_BT = 256  # db rows per grid step


def topk_blocks(p: int, k: int = 16, sizes: bool = False):
    """(query block, db tile) for the fused top-k scan at width ``p``.

    The kernel's VMEM stack is dominated by the [BQ, BT, P] f32 partial
    plus the k-round merge's [BQ, BT] temporaries (~k * BQ * BT * 4B —
    Mosaic does not reuse the unrolled rounds' buffers), so BQ shrinks
    both as the signature widens (P=128 -> 64, P=256 -> 32) and as k
    grows (measured: k=64 at BQ=64/P=128 allocates 22.8M against the
    16M scoped-vmem limit). Floored to a multiple of 8 so the query
    block stays sublane-aligned for non-power-of-two widths (e.g.
    cascade_perm=384 -> 21 would hand Mosaic an unaligned block).
    When the 8-row floor alone still exceeds the budget (wide cascades
    with large k, e.g. p=2048 at k=128), the db tile shrinks instead —
    bt stays a 128 (lane) multiple; callers pad N to whatever bt this
    returns."""
    budget = 12 << 20  # leave headroom under the 16MB scoped-vmem limit
    bq = (TOPK_BQ * 128) // p
    if sizes:
        # containment mode keeps roughly one extra [BQ, BT, P]-sized
        # temporary live (measured: 22.9M scoped-vmem at BQ=64/P=128 in
        # sizes mode vs <16M plain, k-independent)
        bq //= 2
    while bq > 8 and bq * TOPK_BT * 4 * (p + 2 * k) > budget:
        bq //= 2
    bq = max(8, (bq // 8) * 8)
    bt = TOPK_BT
    while bt > 128 and bq * bt * 4 * (p + 2 * k) > budget:
        bt //= 2
    return bq, bt
_TOPK_MAX_K = 128  # extraction loop is unrolled K times; beyond this the
# XLA scan path (lsh_ops.topk_scan) is the better tool.


def _topk_scan_kernel(k: int, use_mask: bool, use_sizes: bool, *refs):
    """One (query block, db tile) step of the fused exact-scan top-k.

    Replaces the lax.scan form's per-tile ``[Q, tile]`` score matrix +
    XLA ``top_k`` (the round-3 dedup bottleneck: score intermediates
    capped query chunks at 1024 — VERDICT round 3 #3) with a running
    top-k carried IN VMEM across the db-tile grid axis: output blocks
    ``(sc, id, cnt)`` are revisited for every ``j`` (TPU grids execute
    sequentially — the same reduction pattern as ``_sign_kernel``).

    Selection is k rounds of masked argmax over the union of the carry
    ``[BQ, k]`` and the tile scores ``[BQ, BT]``; ties prefer the carry
    (earlier tiles = lower doc ids), then the lowest index — the same
    order ``lax.top_k`` yields over ``concat([carry, tile])``. Tiles
    with no score >= cutoff skip the whole merge (one scalar reduce),
    which makes high-cutoff dedup sweeps cost ~the compare alone.
    """
    refs = list(refs)
    q_ref, db_ref = refs.pop(0), refs.pop(0)
    mask_ref = refs.pop(0) if use_mask else None
    if use_sizes:
        size_ref, qsize_ref = refs.pop(0), refs.pop(0)
    else:
        size_ref = qsize_ref = None
    nv_ref, cut_ref, sc_ref, id_ref, cnt_ref = refs
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        sc_ref[:] = jnp.full_like(sc_ref, -1.0)
        id_ref[:] = jnp.full_like(id_ref, -1)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    p = q_ref.shape[-1]
    bq = q_ref.shape[0]
    bt = db_ref.shape[0]
    # compare+mean, [BQ, BT] (operands broadcast to rank 3 BEFORE the
    # compare: i1 results must be born in their final rank on Mosaic)
    eq = q_ref[:][:, None, :] == db_ref[:][None, :, :]
    sc = jnp.sum(eq.astype(jnp.float32), axis=-1) / p
    if use_sizes:
        # containment mode: sc is the Jaccard estimate; rescale to the
        # containment estimate c = J*(x+q)/((1+J)*q) from the EXACT set
        # sizes (see lsh_ops.containment_scan) — monotone in J at fixed
        # sizes, so the carry/merge machinery is unchanged. size <= 0
        # marks padding rows.
        xf = size_ref[0].astype(jnp.float32)  # [1, BT]
        qf = qsize_ref[:, :1].astype(jnp.float32)  # [BQ, 1]
        sc = sc * (xf + qf) / ((1.0 + sc) * qf)

    ids = j * bt + jax.lax.broadcasted_iota(jnp.int32, (bq, bt), 1)
    ok = ids < nv_ref[0, 0]
    if mask_ref is not None:
        ok = ok & (mask_ref[0] > 0)  # [1, BT] broadcasts over queries
    if size_ref is not None:
        ok = ok & (size_ref[0] > 0)
    hit = ok & (sc >= cut_ref[0, 0])
    cnt_ref[:] += jnp.sum(hit.astype(jnp.int32), axis=1)[:, None]
    sc = jnp.where(hit, sc, -1.0)

    # Merge only when some query's tile max BEATS its current k-th best
    # (the min over its carry slots; -1 while the carry isn't full). A
    # tie cannot change the result — stable top-k keeps the earlier
    # (carry) entry — so most tiles skip the whole extraction: dedup
    # sweeps (hits rare) and plain top-k (k-th best stabilizes after a
    # few tiles) both collapse to ~the compare cost.
    can_improve = jnp.any(sc.max(axis=1) > sc_ref[:].min(axis=1))

    @pl.when(can_improve)
    def _merge():
        old_sc = sc_ref[:]  # [BQ, k]
        old_id = id_ref[:]
        tile_sc = sc
        kiota = jax.lax.broadcasted_iota(jnp.int32, (bq, k), 1)
        tiota = jax.lax.broadcasted_iota(jnp.int32, (bq, bt), 1)
        big = jnp.int32(0x7FFFFFFF)
        for i in range(k):
            c_m = old_sc.max(axis=1)  # [BQ]
            t_m = tile_sc.max(axis=1)
            take_c = c_m >= t_m  # tie -> carry (earlier ids)
            pos_c = jnp.where(old_sc == c_m[:, None], kiota, big).min(axis=1)
            pos_t = jnp.where(tile_sc == t_m[:, None], tiota, big).min(axis=1)
            at_c = kiota == pos_c[:, None]
            at_t = tiota == pos_t[:, None]
            id_c = jnp.where(at_c, old_id, -1).max(axis=1)
            id_t = jnp.where(at_t, ids, -1).max(axis=1)
            sel_sc = jnp.where(take_c, c_m, t_m)
            sel_id = jnp.where(take_c, id_c, id_t)
            # empty-union slots keep the (-1, -1) sentinel: carry slots
            # already satisfy the (sc==-1 => id==-1) invariant and a
            # tile pick implies t_m > c_m >= -1, i.e. a real hit
            sc_ref[:, i : i + 1] = sel_sc[:, None]
            id_ref[:, i : i + 1] = sel_id[:, None]
            old_sc = jnp.where(take_c[:, None] & at_c, -2.0, old_sc)
            tile_sc = jnp.where(
                (~take_c)[:, None] & at_t, -2.0, tile_sc
            )


@functools.partial(
    jax.jit, static_argnames=("k", "use_mask", "use_sizes", "interpret")
)
def topk_scan_pallas(db_sigs, q_sigs, n_valid, cutoff, k: int,
                     alive_i32=None, use_mask: bool = False,
                     db_sizes_i32=None, q_sizes_b=None,
                     use_sizes: bool = False,
                     interpret: bool = False):
    """Fused exact-scan top-k: [N, P] x [Q, P] -> (ids, scores, counts).

    Contract of ``lsh_ops.topk_scan(..., count_ge=cutoff)``: per query,
    the top-k (ids, scores) among valid rows with score >= ``cutoff``
    (empty slots id -1 / score -1) plus the exact count of such rows.
    Pass ``cutoff=0.0`` for plain top-k over all valid rows (estimated
    Jaccard is never negative). Memory is FLAT in Q and N — no [Q, N]
    or [Q, tile] intermediate ever exists in HBM, so 8k+ query chunks
    are fine where the scan form capped at 1024.

    Requirements: Q % TOPK_BQ == 0, N % TOPK_BT == 0, P % 128 == 0,
    k <= _TOPK_MAX_K (callers pad/fall back — see lsh_ops.topk_scan).

    Args:
        n_valid: int32[1, 1] — rows >= n_valid are padding.
        cutoff: float32[1, 1] score cutoff (dynamic; no recompile).
        alive_i32: int32[N // TOPK_BT, 1, TOPK_BT] tombstone mask
            rows (1 = alive), required iff ``use_mask``. Rank 3 with a
            unit sublane dim: Mosaic requires the block's last-two dims
            to divide (8, 128) or EQUAL the array dims, so a [tiles, BT]
            layout with (1, BT) blocks fails to lower.
        db_sizes_i32: int32[N // TOPK_BT, 1, TOPK_BT] exact set sizes
            (<= 0 = padding row), required iff ``use_sizes`` — switches
            the score to the containment estimate (see
            ``lsh_ops.containment_scan``).
        q_sizes_b: int32[Q, 128] per-query set sizes broadcast across
            the lane axis (>= 1), required iff ``use_sizes``.
    """
    q, p = q_sigs.shape
    n = db_sigs.shape[0]
    bq, bt = topk_blocks(p, k, use_sizes)
    if q % bq or n % bt or p % 128:
        raise ValueError(
            "topk_scan_pallas shapes (%d, %d, %d) must tile by (%d, %d, 128)"
            % (q, n, p, bq, bt)
        )
    if k > _TOPK_MAX_K:
        raise ValueError("k=%d exceeds the kernel unroll bound %d"
                         % (k, _TOPK_MAX_K))
    grid = (q // bq, n // bt)
    in_specs = [
        pl.BlockSpec((bq, p), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, p), lambda i, j: (j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q_sigs, db_sigs]
    if use_mask:
        in_specs.append(
            pl.BlockSpec((1, 1, bt), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(alive_i32)
    if use_sizes:
        in_specs.append(
            pl.BlockSpec((1, 1, bt), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(db_sizes_i32)
        in_specs.append(
            pl.BlockSpec((bq, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(q_sizes_b)
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    args += [
        n_valid.reshape(1, 1).astype(jnp.int32),
        cutoff.reshape(1, 1).astype(jnp.float32),
    ]
    sc, ids, cnt = pl.pallas_call(
        functools.partial(_topk_scan_kernel, k, use_mask, use_sizes),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, k), jnp.float32),
            jax.ShapeDtypeStruct((q, k), jnp.int32),
            jax.ShapeDtypeStruct((q, 1), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    return ids, sc, cnt[:, 0]

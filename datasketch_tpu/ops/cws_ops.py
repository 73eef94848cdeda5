"""Consistent Weighted Sampling device kernel.

Batches Ioffe CWS over documents and samples: for weights ``v[B, D]`` and
parameters ``rs/ln_cs/betas[S, D]``, produces ``(k, t)`` int32 pairs
``[B, S, 2]``. The per-sample Python loop of the reference
(``/root/reference/datasketch/weighted_minhash.py:153-158``) becomes a
``lax.scan`` over sample blocks with a masked argmin — zero-weight
dimensions contribute +inf instead of NaN (same argmin winner, no NaN
propagation hazards on the VPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "cws_many",
    "cws_many_best",
    "cws_many_sparse",
    "cws_many_sparse_best",
    "kt_slots",
    "kt_slots_np",
    "CWS_KERNEL_INTERPRET",
]

# splitmix64-style odd constants for the (k, t) -> uint32 slot mix; the
# host twin lives in kt_slots_np and models/tpu_lsh._as_signature_matrix
# relies on bit-identity between the two.
_KT_C1 = 0x9E3779B97F4A7C15
_KT_C2 = 0xC2B2AE3D27D4EB4F

# Test knob: force the Mosaic CWS kernel in interpret mode on CPU CI
# (the platform gate would otherwise leave it untested until a real-TPU
# run) — same pattern as lsh_ops.SCORE_KERNEL_INTERPRET.
CWS_KERNEL_INTERPRET = False


def cws_many_best(weights, rs, ln_cs, betas):
    """CWS batch via the best kernel for the platform.

    On TPU the Mosaic kernel (compile-time immunity — XLA fusions of the
    [B, S, D] intermediate are shape-pathological through the remote-TPU
    path); the XLA scan elsewhere. Identical (k, t) output either way.
    """
    from datasketch_tpu.ops import pallas_kernels as pk

    if pk.signature_kernel_available() or CWS_KERNEL_INTERPRET:
        return pk.cws_many_pallas(
            weights, rs, ln_cs, betas, interpret=CWS_KERNEL_INTERPRET
        )
    return cws_many(weights, rs, ln_cs, betas)


def cws_many_sparse_best(vals, idx, rs_t, lncs_t, betas_t):
    """Sparse-input CWS batch via the best kernel for the platform.

    Args:
        vals: float32[B, NZ] positive weights, zero-padded on the right.
        idx: int32[B, NZ] dim indices, sorted ascending per row (CSR
            order); padding slots carry vals == 0.
        rs_t, lncs_t, betas_t: float32[D, S] TRANSPOSED generator
            parameters.

    Returns int32[B, S, 2] (k, t) rows bit-identical to
    :func:`cws_many_best` on the densified equivalent; all-zero rows
    return garbage (callers exclude them). The sparse form ships
    ~nnz/D of the dense bytes over the host->device link — the
    end-to-end lever on tunnel-attached TPUs (BASELINE.md) — and cuts
    compute the same factor. Reference batch API shape: CSR-in
    ``/root/reference/datasketch/weighted_minhash.py:161-247``.
    """
    from datasketch_tpu.ops import pallas_kernels as pk

    if pk.signature_kernel_available() or CWS_KERNEL_INTERPRET:
        return pk.cws_sparse_pallas(
            vals, idx, rs_t, lncs_t, betas_t,
            interpret=CWS_KERNEL_INTERPRET,
        )
    return cws_many_sparse(vals, idx, rs_t, lncs_t, betas_t)


@jax.jit
def cws_many_sparse(vals, idx, rs_t, lncs_t, betas_t):
    """XLA form of :func:`cws_many_sparse_best` (non-TPU platforms).

    Same contract and bit-identical output: the per-row parameter
    gather ``rs_t[idx]`` yields [B, NZ, S] columns; the argmin runs
    over the nnz axis, whose first-minimum tie-break equals the dense
    lowest-dim rule because ``idx`` is sorted ascending per row.
    """
    vals = vals.astype(jnp.float32)
    idx = idx.astype(jnp.int32)
    active = vals > 0
    r_g = rs_t.astype(jnp.float32)[idx]  # [B, NZ, S]
    lncs_g = lncs_t.astype(jnp.float32)[idx]
    beta_g = betas_t.astype(jnp.float32)[idx]
    vlog = jnp.where(active, jnp.log(jnp.where(active, vals, 1.0)), 0.0)
    t3 = jnp.floor(vlog[:, :, None] / r_g + beta_g)
    ln_a = lncs_g - (t3 - beta_g) * r_g - r_g
    ln_a = jnp.where(active[:, :, None], ln_a, jnp.inf)
    pos = jnp.argmin(ln_a, axis=1).astype(jnp.int32)  # [B, S]
    k = jnp.take_along_axis(idx, pos, axis=1)
    t_k = jnp.take_along_axis(t3, pos[:, None, :], axis=1)[:, 0, :]
    return jnp.stack([k, t_k.astype(jnp.int32)], axis=-1)


@functools.partial(jax.jit, static_argnames=("sample_block",))
def cws_many(weights, rs, ln_cs, betas, sample_block: int = 16):
    """CWS sketches for a dense weight batch.

    Args:
        weights: float32[B, D] nonnegative; all-zero rows are the caller's
            responsibility to exclude.
        rs, ln_cs, betas: float32[S, D] generator parameters.
        sample_block: samples processed per scan step (bounds the [B, s, D]
            intermediate).

    Returns:
        int32[B, S, 2] of (k, t) rows.
    """
    b, d = weights.shape
    s = rs.shape[0]
    pad = (-s) % sample_block
    rs_p = jnp.pad(rs, ((0, pad), (0, 0)), constant_values=1.0)
    ln_cs_p = jnp.pad(ln_cs, ((0, pad), (0, 0)))
    betas_p = jnp.pad(betas, ((0, pad), (0, 0)))
    nblocks = (s + pad) // sample_block

    active = weights > 0
    vlog = jnp.where(active, jnp.log(jnp.where(active, weights, 1.0)), 0.0)

    def body(_, params):
        r_blk, lncs_blk, beta_blk = params  # [sb, D] each
        # [B, sb, D]
        t = jnp.floor(vlog[:, None, :] / r_blk[None] + beta_blk[None])
        ln_y = (t - beta_blk[None]) * r_blk[None]
        ln_a = lncs_blk[None] - ln_y - r_blk[None]
        ln_a = jnp.where(active[:, None, :], ln_a, jnp.inf)
        k = jnp.argmin(ln_a, axis=-1).astype(jnp.int32)  # [B, sb]
        t_k = jnp.take_along_axis(t, k[..., None].astype(jnp.int32), axis=-1)[..., 0]
        return None, (k, t_k.astype(jnp.int32))

    _, (ks, ts) = jax.lax.scan(
        body,
        None,
        (
            rs_p.reshape(nblocks, sample_block, d),
            ln_cs_p.reshape(nblocks, sample_block, d),
            betas_p.reshape(nblocks, sample_block, d),
        ),
    )
    # ks/ts: [nblocks, B, sb] -> [B, S]
    ks = jnp.transpose(ks, (1, 0, 2)).reshape(b, -1)[:, :s]
    ts = jnp.transpose(ts, (1, 0, 2)).reshape(b, -1)[:, :s]
    return jnp.stack([ks, ts], axis=-1)


def kt_slots_np(kt: "np.ndarray"):
    """Host (k, t) pair -> uint32 slot mix: ``[..., S, 2] int -> uint32[..., S]``.

    One uint32 per CWS sample with slot equality iff (k, t) equality (up
    to a 2^-32 mix collision): ``((k * C1 + t) * C2) folded hi^lo``. This
    is what lets WeightedMinHash sketches ride the SAME device band
    tables and Jaccard rerank as plain signatures — the rerank's
    equal-slot fraction IS the reference's weighted-Jaccard estimator
    (fraction of equal (k, t) rows,
    ``/root/reference/datasketch/weighted_minhash.py:37-52``).
    """
    import numpy as np

    k = np.asarray(kt)[..., 0].astype(np.int64).astype(np.uint64)
    t = np.asarray(kt)[..., 1].astype(np.int64).astype(np.uint64)
    mixed = (k * np.uint64(_KT_C1) + t) * np.uint64(_KT_C2)
    return ((mixed >> np.uint64(32)) ^ mixed).astype(np.uint32)


@jax.jit
def kt_slots(kt):
    """Device twin of :func:`kt_slots_np`, bit-identical.

    Args:
        kt: int32[..., S, 2] (k, t) pairs (``cws_many`` output).
    Returns:
        uint32[..., S] slots, ready for ``lsh_ops.band_fingerprints`` /
        the signature-equality rerank.

    uint64 arithmetic runs in uint32 limb pairs (datasketch_tpu/ops/u64
    — TPUs have no useful 64-bit integer path); ``t`` may be negative,
    so both operands are sign-extended into their high limbs exactly as
    NumPy's int64 -> uint64 cast wraps.
    """
    from datasketch_tpu.ops import u64

    k = kt[..., 0].astype(jnp.int32)
    t = kt[..., 1].astype(jnp.int32)
    k_hi = (k >> 31).astype(jnp.uint32)  # arithmetic shift: sign extension
    k_lo = k.astype(jnp.uint32)
    t_hi = (t >> 31).astype(jnp.uint32)
    t_lo = t.astype(jnp.uint32)
    c1_hi = jnp.uint32(_KT_C1 >> 32)
    c1_lo = jnp.uint32(_KT_C1 & 0xFFFFFFFF)
    c2_hi = jnp.uint32(_KT_C2 >> 32)
    c2_lo = jnp.uint32(_KT_C2 & 0xFFFFFFFF)
    m_hi, m_lo = u64.mul64(k_hi, k_lo, c1_hi, c1_lo)
    s_hi, s_lo = u64.add64(m_hi, m_lo, t_hi, t_lo)
    r_hi, r_lo = u64.mul64(s_hi, s_lo, c2_hi, c2_lo)
    return r_hi ^ r_lo

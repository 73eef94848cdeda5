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

__all__ = ["cws_many", "cws_many_best", "CWS_KERNEL_INTERPRET"]

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

"""Sharded sketch construction and collective merges.

Replaces the reference's MapReduce guidance ("compute MinHash on shards,
``merge`` on the driver", ``/root/reference/docs/minhash.rst:57-59`` and
``MinHash.merge`` at ``minhash.py:337-359``) with on-mesh collectives: the
merge of MinHash signatures is an elementwise ``min`` (associative), so a
cross-device union is one ``lax.pmin``; HyperLogLog register merge
(``hyperloglog.py:170-183``) is one ``lax.pmax``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from datasketch_tpu.ops import minhash_ops

__all__ = [
    "sharded_compute_signatures",
    "distributed_minhash_union",
    "distributed_hll_union",
]


def _local_signatures(hashes, lengths, a_hi, a_lo, b_hi, b_lo):
    """Per-shard signature construction (plain function, shard_map body).

    hashes uint32[b_loc, T], lengths int32[b_loc], limbs uint32[p_loc]
    -> uint32[b_loc, p_loc].
    """
    # Init carry derived from the sharded inputs so it carries their
    # varying-manual-axes type inside shard_map (a plain jnp.full would be
    # unvarying and fail lax.scan's carry type check). MAX_HASH is all-ones,
    # so OR-ing zeroed input slices yields exactly MAX_HASH.
    state = (
        (hashes[:, :1] & jnp.uint32(0))
        | (a_hi[None, :] & jnp.uint32(0))
        | jnp.uint32(minhash_ops.MAX_HASH)
    )
    return minhash_ops._scan_min(state, hashes, lengths, a_hi, a_lo, b_hi, b_lo)


def sharded_compute_signatures(hashes, lengths, seed: int, num_perm: int, mesh: Mesh):
    """MinHash signatures for a token batch, dp x tp over the mesh.

    The batch axis shards over mesh axis ``data``; the permutation axis
    shards over ``model`` (each device computes its slice of the num_perm
    universal hashes — SURVEY.md §2.4's TPU equivalent of
    ``MinHash.bulk``, ``/root/reference/datasketch/minhash.py:464-522``).

    Args:
        hashes: uint32[B, T] padded token hashes (B divisible by data axis).
        lengths: int32[B] valid token counts.
    Returns:
        uint32[B, num_perm] signatures, sharded P("data", "model").
    """
    dp = mesh.shape["data"]
    tp = mesh.shape.get("model", 1)
    if hashes.shape[0] % dp:
        raise ValueError("batch %d not divisible by data axis %d" % (hashes.shape[0], dp))
    if num_perm % tp:
        raise ValueError("num_perm %d not divisible by model axis %d" % (num_perm, tp))
    limbs = [np.asarray(x) for x in minhash_ops.perm_limbs(seed, num_perm)]

    fn = jax.jit(
        jax.shard_map(
            _local_signatures,
            mesh=mesh,
            in_specs=(
                P("data", None),
                P("data"),
                P("model"),
                P("model"),
                P("model"),
                P("model"),
            ),
            out_specs=P("data", "model"),
        )
    )
    return fn(
        jnp.asarray(hashes, dtype=jnp.uint32),
        jnp.asarray(lengths, dtype=jnp.int32),
        *limbs,
    )


def distributed_minhash_union(sigs, mesh: Mesh):
    """Union (elementwise min) of all signatures across batch AND devices.

    sigs uint32[B, P] sharded P("data", "model") -> uint32[P] replicated.
    The cross-device reduce is ``lax.pmin`` over the data axis — the ICI
    collective form of ``MinHash.union`` (``minhash.py:411-462``).
    """

    def body(s):
        local = s.min(axis=0)  # [p_loc]
        return jax.lax.pmin(local, "data")

    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh, in_specs=P("data", "model"), out_specs=P("model")
        )
    )
    return fn(sigs)


def distributed_hll_union(regs, mesh: Mesh, axis: str = "data"):
    """Union (register max) of HLL register batches across devices.

    regs int8/uint8[B, m] sharded P(axis, None) -> [m] replicated; the
    collective form of ``HyperLogLog.merge`` (``hyperloglog.py:170-183``).
    """

    def body(r):
        local = r.max(axis=0)
        return jax.lax.pmax(local, axis)

    fn = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=P(axis, None), out_specs=P(None))
    )
    return fn(regs)

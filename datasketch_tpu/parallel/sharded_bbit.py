"""ShardedBBitIndex — b-bit compressed top-k scan over a device mesh.

The mesh form of :class:`datasketch_tpu.models.tpu_bbit.TpuBBitIndex`
(reference semantics: the Li & Koenig b-bit estimator of
``/root/reference/datasketch/b_bit_minhash.py:53-72``). Packed corpus
rows shard over ``shard_axis`` (``P(axis, None)``): each shard streams
its slice through the SWAR equal-slot scan, only k candidates per shard
ride the ``all_gather``, and the cross-shard top-k runs replicated —
the same collective shape as ``ShardedMinHashLSH._make_topk_scan_fn``.
Combined with the 32/s-per-slot packing this is the maximum-corpus
configuration: at b=1 a mesh of D devices holds ``32 x D`` x more
resident sketches than one chip holds full signatures.

Tie-breaking matches the single-chip class exactly (equal match counts
resolve to the lower global id): the gathered candidate pool is
shard-major and per-shard lists are id-ordered within equal counts, so
``top_k``'s first-index preference composes to global id order.
``.npz`` checkpoints interoperate with the single-chip class both ways.
"""

from __future__ import annotations

from typing import Hashable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from datasketch_tpu.models.tpu_bbit import TpuBBitIndex
from datasketch_tpu.ops import bbit_ops

__all__ = ["ShardedBBitIndex"]


class ShardedBBitIndex(TpuBBitIndex):
    """b-bit exact-scan top-k with the packed corpus sharded over a mesh.

    Args:
        mesh: device mesh; packed rows shard over ``shard_axis``.
        (rest as :class:`~datasketch_tpu.models.tpu_bbit.TpuBBitIndex`.)
    """

    def __init__(self, mesh: Mesh, b: int = 4, num_perm: int = 128,
                 r: float = 0.0, tile: int = 2048,
                 shard_axis: str = "data"):
        super().__init__(b=b, num_perm=num_perm, r=r, tile=tile)
        self.mesh = mesh
        self.shard_axis = shard_axis
        self.n_shards = mesh.shape[shard_axis]
        self._scan_fns: dict = {}  # k -> compiled sharded scan

    # ------------------------------------------------------------ device sync

    def _sync_device(self) -> None:
        """Upload the host corpus sharded ``P(axis, None)``; rows pad to
        a power-of-two multiple of the shard count (equal shards +
        bounded compile-shape family)."""
        n = len(self._keys)
        if n == 0:
            self._packed_dev = None
            self._alive_dev = None
            self._n_real_dev = None
            return
        n_pad = 128
        while n_pad < n:
            n_pad *= 2
        n_pad = -(-n_pad // self.n_shards) * self.n_shards
        packed = self._packed_host
        alive = self._alive_host
        if n_pad != n:
            packed = np.pad(packed, ((0, n_pad - n), (0, 0)))
            alive = np.pad(alive, (0, n_pad - n))
        mesh, axis = self.mesh, self.shard_axis
        self._packed_dev = jax.device_put(
            packed, NamedSharding(mesh, P(axis, None))
        )
        # replicated: each shard slices out its own window at query time
        self._alive_dev = jax.device_put(
            alive, NamedSharding(mesh, P(None))
        )
        self._n_real_dev = jnp.int32(n)

    def remove_batch(self, keys: Sequence[Hashable]) -> None:
        """Tombstone keys (replicated mask upload only)."""
        for k in keys:
            pos = self._key_to_pos.pop(k, None)
            if pos is None:
                raise ValueError("The given key does not exist: %r" % (k,))
            self._alive_host[pos] = False
            self._n_removed += 1
        if self._packed_dev is not None:
            n_pad = self._packed_dev.shape[0]
            self._alive_dev = jax.device_put(
                np.pad(
                    self._alive_host, (0, n_pad - len(self._alive_host))
                ),
                NamedSharding(self.mesh, P(None)),
            )

    # ---------------------------------------------------------------- queries

    def _make_scan_fn(self, k: int):
        mesh, axis = self.mesh, self.shard_axis
        b, num_perm, tile = self.b, self.num_perm, self.tile

        def body(db_local, q_packed, n_real, alive):
            local_n = db_local.shape[0]
            base = jax.lax.axis_index(axis) * local_n
            local_alive = jax.lax.dynamic_slice_in_dim(alive, base, local_n)
            nv = jnp.clip(n_real - base, 0, local_n)
            ids, cnt = bbit_ops.bbit_topk_scan(
                db_local, q_packed, k, b, num_perm,
                n_valid=nv, alive=local_alive, tile=tile,
            )
            gids = jnp.where(ids >= 0, ids + base, -1)
            g_ids = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
            g_cnt = jax.lax.all_gather(cnt, axis, axis=1, tiled=True)
            top_cnt, pos = jax.lax.top_k(g_cnt, k)
            top_ids = jnp.take_along_axis(g_ids, pos, axis=1)
            top_ids = jnp.where(top_cnt >= 0, top_ids, -1)
            return jnp.stack([top_ids, top_cnt], axis=1)  # [Q, 2, k]

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axis, None), P(None, None), P(), P(None)),
                out_specs=P(None, None, None),
                check_vma=False,
            )
        )

    def _query_dispatch(self, minhashes, k: int):
        if k <= 0:
            raise ValueError("k must be positive")
        if self._packed_dev is None:
            return [[] for _ in minhashes]
        from datasketch_tpu.models.tpu_lsh import _as_signature_matrix

        q = _as_signature_matrix(minhashes)
        if q.shape[0] == 0:
            return []
        if q.shape[1] < self.num_perm:
            raise ValueError("The num_perm of MinHash out of range")
        nq = q.shape[0]
        q_packed = bbit_ops.pack_bbit_host(
            np.asarray(q)[:, : self.num_perm], self.b
        )
        q_pad = 8
        while q_pad < nq:
            q_pad *= 2
        if q_pad != nq:
            q_packed = np.pad(q_packed, ((0, q_pad - nq), (0, 0)))
        k_pad = max(8, 1 << (k - 1).bit_length())
        fn = self._scan_fns.get(k_pad)
        if fn is None:
            fn = self._scan_fns[k_pad] = self._make_scan_fn(k_pad)
        packed = fn(
            self._packed_dev, jnp.asarray(q_packed), self._n_real_dev,
            self._alive_dev,
        )
        return packed, nq

    # -------------------------------------------------------------- plumbing

    def status(self) -> dict:
        out = super().status()
        out["n_shards"] = self.n_shards
        out["shard_axis"] = self.shard_axis
        return out

    @classmethod
    def load(cls, path: str, mesh: Mesh,
             shard_axis: str = "data") -> "ShardedBBitIndex":
        """Load a (single-chip or sharded) checkpoint onto ``mesh`` —
        re-sharding to a different mesh shape is just loading."""
        single = TpuBBitIndex.load(path)
        obj = cls(
            mesh, b=single.b, num_perm=single.num_perm, r=single.r,
            tile=single.tile, shard_axis=shard_axis,
        )
        obj._keys = single._keys
        obj._key_to_pos = single._key_to_pos
        obj._packed_host = single._packed_host
        obj._alive_host = single._alive_host
        obj._sync_device()
        return obj

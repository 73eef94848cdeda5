"""ShardedMinHashLSHBloom — bit-space-sharded membership LSH over a mesh.

The mesh form of :class:`datasketch_tpu.models.lsh_bloom.
TpuMinHashLSHBloom` (reference semantics: ``/root/reference/datasketch/
lsh_bloom.py:126-372``). Unlike the document-sharded indexes, a bloom
filter has no per-document state to shard — what grows is the *bitmap*
(dedup at reference-LSHBloom scale wants tens of gigabits), so here the
``bool[b, num_bits]`` band bitmaps shard over their bit axis: each
device owns a contiguous slice, probe positions split on host into
``(owner shard, local offset)`` int32 pairs (device-side math stays
32-bit — positions themselves can exceed 2^31 for large filters),
inserts scatter each shard's owned bits inside ``shard_map``, and a
query counts missing bits per (doc, band) with one ``psum`` — a band
hits iff no shard reports a miss.

The probe scheme, band keys, and ``.npz`` format are identical to the
single-chip class, so checkpoints interop both ways.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from datasketch_tpu.models.lsh_bloom import TpuMinHashLSHBloom

__all__ = ["ShardedMinHashLSHBloom"]


class ShardedMinHashLSHBloom(TpuMinHashLSHBloom):
    """Membership-only LSH with band bitmaps sharded over a mesh axis.

    Args:
        mesh: device mesh; bitmap bits shard over ``shard_axis``.
        (rest as :class:`~datasketch_tpu.models.lsh_bloom.
        TpuMinHashLSHBloom`.)
    """

    def __init__(self, mesh: Mesh, threshold: float = 0.9,
                 num_perm: int = 128, weights: tuple = (0.5, 0.5),
                 params: Optional[tuple] = None, n: int = 1_000_000,
                 fp: float = 0.01, shard_axis: str = "data"):
        super().__init__(threshold=threshold, num_perm=num_perm,
                         weights=weights, params=params, n=n, fp=fp)
        self._init_mesh(mesh, shard_axis, np.asarray(self._bits))

    def _init_mesh(self, mesh: Mesh, shard_axis: str,
                   bits_host: np.ndarray) -> None:
        self.mesh = mesh
        self.shard_axis = shard_axis
        self.n_shards = mesh.shape[shard_axis]
        # pad STORAGE only — num_bits stays the probe modulus, the padded
        # tail is simply never addressed
        self._local_bits = -(-self.num_bits // self.n_shards)
        pad = self._local_bits * self.n_shards - bits_host.shape[1]
        if pad:
            bits_host = np.pad(bits_host, ((0, 0), (0, pad)))
        self._bits = jax.device_put(
            bits_host, NamedSharding(mesh, P(None, shard_axis))
        )
        self._insert_fn = None
        self._query_fn = None

    # ------------------------------------------------------------ device fns

    def _split_positions(self, minhashes):
        """(band, owner, local) int32[N, b, k] triples for a batch."""
        pos = self._positions(self._band_keys(minhashes))  # int64[N, b, k]
        owner = (pos // self._local_bits).astype(np.int32)
        local = (pos % self._local_bits).astype(np.int32)
        band = np.broadcast_to(
            np.arange(self.b, dtype=np.int32)[None, :, None], pos.shape
        ).astype(np.int32)
        return band, owner, local

    def _build_fns(self):
        mesh, axis = self.mesh, self.shard_axis
        local_n = self._local_bits

        def ins(bits, band, owner, local):
            mine = owner == jax.lax.axis_index(axis)
            # foreign positions pushed out of range -> mode="drop"
            lp = jnp.where(mine, local, local_n)
            return bits.at[band.ravel(), lp.ravel()].set(True, mode="drop")

        def qry(bits, band, owner, local):
            mine = owner == jax.lax.axis_index(axis)
            bit = bits[band, jnp.clip(local, 0, local_n - 1)]
            miss = (mine & ~bit).sum(axis=2)  # int32[N, b]
            total_miss = jax.lax.psum(miss, axis)
            return (total_miss == 0).any(axis=1)  # bool[N], replicated

        self._insert_fn = jax.jit(
            jax.shard_map(
                ins, mesh=mesh,
                in_specs=(P(None, axis), P(None, None, None),
                          P(None, None, None), P(None, None, None)),
                out_specs=P(None, axis),
                check_vma=False,
            ),
            donate_argnums=(0,),
        )
        self._query_fn = jax.jit(
            jax.shard_map(
                qry, mesh=mesh,
                in_specs=(P(None, axis), P(None, None, None),
                          P(None, None, None), P(None, None, None)),
                out_specs=P(None),
                check_vma=False,
            )
        )

    @staticmethod
    def _pad_batch(arrs, n):
        """Pad the doc axis to a pow2 (caps distinct compiled shapes).

        Padding replicates the LAST row (``mode="edge"``): re-inserting a
        real document's bits is idempotent and query padding is sliced
        off, whereas zero-fill would spuriously set bit (band 0, pos 0)
        on shard 0 during insert.
        """
        n_pad = 8
        while n_pad < n:
            n_pad *= 2
        if n_pad == n:
            return arrs
        return [
            np.pad(a, ((0, n_pad - n), (0, 0), (0, 0)), mode="edge")
            for a in arrs
        ]

    # --------------------------------------------------------------- ops

    def insert_batch(self, minhashes) -> None:
        """One sharded scatter for the whole batch."""
        if not minhashes:
            return
        if self._insert_fn is None:
            self._build_fns()
        band, owner, local = self._split_positions(minhashes)
        # padding rows replicate the last row: re-setting bits is idempotent
        n = band.shape[0]
        band, owner, local = self._pad_batch([band, owner, local], n)
        self._bits = self._insert_fn(
            self._bits, jnp.asarray(band), jnp.asarray(owner),
            jnp.asarray(local),
        )

    def query_batch(self, minhashes) -> np.ndarray:
        """bool[N]: True where ANY band's filter hits (duplicate likely)."""
        if not minhashes:
            return np.zeros(0, dtype=bool)
        if self._query_fn is None:
            self._build_fns()
        band, owner, local = self._split_positions(minhashes)
        n = band.shape[0]
        band, owner, local = self._pad_batch([band, owner, local], n)
        hits = self._query_fn(
            self._bits, jnp.asarray(band), jnp.asarray(owner),
            jnp.asarray(local),
        )
        return np.asarray(hits)[:n]

    # ------------------------------------------------------------ persistence

    def save(self, path: str) -> None:
        """Same ``.npz`` format as the single-chip class (the padded
        storage tail is sliced off) — checkpoints interop both ways. On
        a multi-process mesh this is a COLLECTIVE — call from every
        process."""
        from datasketch_tpu.parallel.mesh import fetch_global
        from datasketch_tpu.persist import atomic_savez, npz_path

        bits = fetch_global(self._bits, self.mesh)[:, : self.num_bits]
        atomic_savez(
            npz_path(path),
            bits=bits,
            meta=np.array(
                [self.h, self.b, self.r, self.num_bits, self.num_hashes],
                dtype=np.int64,
            ),
            probe_scheme=np.int64(self._PROBE_SCHEME),
            threshold=np.float64(self.threshold),
        )

    @classmethod
    def load(cls, path: str, mesh: Mesh, shard_axis: str = "data"
             ) -> "ShardedMinHashLSHBloom":
        """Load a single-chip or sharded checkpoint onto ``mesh``."""
        single = TpuMinHashLSHBloom.load(path)
        obj = cls.__new__(cls)
        obj.threshold = single.threshold
        obj.h = single.h
        obj.b, obj.r = single.b, single.r
        obj.num_bits = single.num_bits
        obj.num_hashes = single.num_hashes
        obj.hashranges = single.hashranges
        obj._init_mesh(mesh, shard_axis, np.asarray(single._bits))
        return obj

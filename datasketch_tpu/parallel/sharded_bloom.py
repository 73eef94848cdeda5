"""ShardedMinHashLSHBloom — bit-space-sharded membership LSH over a mesh.

The mesh form of :class:`datasketch_tpu.models.lsh_bloom.
TpuMinHashLSHBloom` (reference semantics: ``/root/reference/datasketch/
lsh_bloom.py:126-372``). Unlike the document-sharded indexes, a bloom
filter has no per-document state to shard — what grows is the *bitmap*
(dedup at LSHBloom-paper scale wants tens of gigabits), so here the
word-packed ``uint32[b, num_words]`` band bitmaps shard over their WORD
axis: each device owns a contiguous slice of 32-bit words. Inserts are
host-deduped unique (band, word, OR-combined mask) triples split into
``(owner shard, local word)`` pairs — each shard ORs its owned words in
one gather + one unique-index scatter inside ``shard_map`` — and a query
counts missing bits per (doc, band) with one ``psum``: a band hits iff
no shard reports a miss.

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
    """Membership-only LSH with packed band bitmaps sharded over a mesh.

    Args:
        mesh: device mesh; bitmap words shard over ``shard_axis``.
        (rest as :class:`~datasketch_tpu.models.lsh_bloom.
        TpuMinHashLSHBloom`.)
    """

    def __init__(self, mesh: Mesh, threshold: float = 0.9,
                 num_perm: int = 128, weights: tuple = (0.5, 0.5),
                 params: Optional[tuple] = None, n: int = 1_000_000,
                 fp: float = 0.01, shard_axis: str = "data"):
        super().__init__(threshold=threshold, num_perm=num_perm,
                         weights=weights, params=params, n=n, fp=fp)
        self._init_mesh(mesh, shard_axis, np.asarray(self._words))

    def _init_mesh(self, mesh: Mesh, shard_axis: str,
                   words_host: np.ndarray) -> None:
        self.mesh = mesh
        self.shard_axis = shard_axis
        self.n_shards = mesh.shape[shard_axis]
        # pad STORAGE only — num_bits stays the probe modulus, the padded
        # tail is simply never addressed
        self._local_words = -(-self.num_words // self.n_shards)
        pad = self._local_words * self.n_shards - words_host.shape[1]
        if pad:
            words_host = np.pad(words_host, ((0, 0), (0, pad)))
        self._words = jax.device_put(
            words_host, NamedSharding(mesh, P(None, shard_axis))
        )
        self._insert_fn = None
        self._query_fn = None

    # ------------------------------------------------------------ device fns

    def _build_fns(self):
        mesh, axis = self.mesh, self.shard_axis
        local_n = self._local_words

        def ins(words, band, owner, local, mask):
            mine = owner == jax.lax.axis_index(axis)
            # foreign/sentinel words pushed out of range -> mode="drop"
            lw = jnp.where(mine, local, local_n)
            cur = words[band, jnp.clip(local, 0, local_n - 1)]
            # global word ids are unique, so per-shard live indices are
            # too: gather-then-set is a race-free OR
            return words.at[band, lw].set(cur | mask, mode="drop")

        def qry(words, band, owner, local, mask):
            mine = owner == jax.lax.axis_index(axis)
            w = words[band, jnp.clip(local, 0, local_n - 1)]
            bit = (w & mask) != 0
            miss = (mine & ~bit).sum(axis=2)  # int32[N, b]
            total_miss = jax.lax.psum(miss, axis)
            return (total_miss == 0).any(axis=1)  # bool[N], replicated

        flat = P(None)
        self._insert_fn = jax.jit(
            jax.shard_map(
                ins, mesh=mesh,
                in_specs=(P(None, axis), flat, flat, flat, flat),
                out_specs=P(None, axis),
                check_vma=False,
            ),
            donate_argnums=(0,),
        )
        nbk = P(None, None, None)
        self._query_fn = jax.jit(
            jax.shard_map(
                qry, mesh=mesh,
                in_specs=(P(None, axis), nbk, nbk, nbk, nbk),
                out_specs=P(None),
                check_vma=False,
            )
        )

    # --------------------------------------------------------------- ops

    def insert_batch(self, minhashes) -> None:
        """One sharded gather+scatter for the whole batch."""
        if not minhashes:
            return
        if self._insert_fn is None:
            self._build_fns()
        # unique global (band, word, mask); sentinel rows carry
        # word == num_words -> owned by no shard -> dropped everywhere
        band_u, word_u, mask_u = self._word_updates(minhashes)
        owner = (word_u // self._local_words).astype(np.int32)
        local = (word_u % self._local_words).astype(np.int32)
        owner[word_u >= self.num_words] = -1
        self._words = self._insert_fn(
            self._words, jnp.asarray(band_u), jnp.asarray(owner),
            jnp.asarray(local), jnp.asarray(mask_u),
        )

    def query_batch(self, minhashes) -> np.ndarray:
        """bool[N]: True where ANY band's filter hits (duplicate likely)."""
        if not minhashes:
            return np.zeros(0, dtype=bool)
        if self._query_fn is None:
            self._build_fns()
        pos = self._positions(self._band_keys(minhashes))  # int64[N, b, k]
        word = pos >> 5
        band = np.broadcast_to(
            np.arange(self.b, dtype=np.int32)[None, :, None], pos.shape
        ).astype(np.int32)
        owner = (word // self._local_words).astype(np.int32)
        local = (word % self._local_words).astype(np.int32)
        mask = (np.uint32(1) << (pos & 31).astype(np.uint32))
        n = pos.shape[0]
        band, owner, local, mask = self._pad_batch(
            [band, owner, local, mask], n
        )
        hits = self._query_fn(
            self._words, jnp.asarray(band), jnp.asarray(owner),
            jnp.asarray(local), jnp.asarray(mask),
        )
        return np.asarray(hits)[:n]

    @staticmethod
    def _pad_batch(arrs, n):
        """Pad the doc axis to a pow2 (caps distinct compiled shapes).

        Padding replicates the LAST row (``mode="edge"``): queries are
        read-only and the padded rows are sliced off.
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

    # ------------------------------------------------------------ persistence

    def save(self, path: str) -> None:
        """Same ``.npz`` format as the single-chip class (the padded
        storage tail is sliced off) — checkpoints interop both ways. On
        a multi-process mesh this is a COLLECTIVE — call from every
        process."""
        from datasketch_tpu.parallel.mesh import fetch_global
        from datasketch_tpu.persist import atomic_savez, npz_path

        words = fetch_global(self._words, self.mesh)[:, : self.num_words]
        atomic_savez(
            npz_path(path),
            bits_packed=words,
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
        obj.num_words = single.num_words
        obj.num_hashes = single.num_hashes
        obj.hashranges = single.hashranges
        obj._init_mesh(mesh, shard_axis, np.asarray(single._words))
        return obj

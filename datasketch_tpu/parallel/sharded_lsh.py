"""ShardedMinHashLSH — document-sharded LSH index over a device mesh.

The reference scales MinHashLSH across processes by pointing every process
at a shared Redis/Cassandra keyspace (``/root/reference/datasketch/
storage.py:819+``, ``docs/lsh.rst:97-232``). Here the index itself is
sharded: each device owns ``N / n_shards`` documents' signatures and their
sorted band tables; a query broadcasts to all shards, each probes its local
tables and reranks locally, and the candidates ride back over ICI with one
``all_gather`` (SURVEY.md §2.4 / §7.7).
"""

from __future__ import annotations

from typing import Hashable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from datasketch_tpu.models.lsh import _optimal_param
from datasketch_tpu.models.tpu_lsh import _as_signature_matrix
from datasketch_tpu.ops import lsh_ops

__all__ = ["ShardedMinHashLSH"]


class ShardedMinHashLSH:
    """Jaccard-threshold index sharded over a mesh axis.

    Args:
        mesh: device mesh; documents shard over ``shard_axis``.
        threshold / num_perm / weights / params: as
            :class:`datasketch_tpu.models.tpu_lsh.TpuMinHashLSH`.
        bucket_cap: per-(query, band, shard) gather cap.
        shard_axis: mesh axis name to shard documents over.
    """

    def __init__(
        self,
        mesh: Mesh,
        threshold: float = 0.9,
        num_perm: int = 128,
        weights: tuple = (0.5, 0.5),
        params: Optional[tuple] = None,
        bucket_cap: int = 128,
        rerank: bool = True,
        shard_axis: str = "data",
    ):
        if threshold > 1.0 or threshold < 0.0:
            raise ValueError("threshold must be in [0.0, 1.0]")
        self.mesh = mesh
        self.threshold = threshold
        self.h = num_perm
        if params is not None:
            self.b, self.r = params
            if self.b * self.r > num_perm:
                raise ValueError("b*r must be <= num_perm")
        else:
            self.b, self.r = _optimal_param(threshold, num_perm, *weights)
        self.bucket_cap = bucket_cap
        self.rerank = rerank
        self.shard_axis = shard_axis
        self.n_shards = mesh.shape[shard_axis]

        self._keys: list = []
        self._key_to_pos: dict = {}
        self._sigs = None  # uint32[N_pad, P] sharded P(axis, None)
        self._sorted_fp = None  # uint32[b, N_pad] sharded P(None, axis)
        self._sorted_ids = None  # int32[b, N_pad] sharded P(None, axis)
        self._n_real = 0
        self.last_truncated = 0
        self._query_fn = None

    # ------------------------------------------------------------------ build

    def index(self, keys: Sequence[Hashable], minhashes) -> None:
        """Bulk-build from parallel (keys, minhashes); re-shardable by calling again."""
        keys = list(keys)
        sigs = _as_signature_matrix(minhashes)
        if sigs.shape[0] != len(keys):
            raise ValueError("keys and minhashes must have equal length")
        if sigs.shape[0] and sigs.shape[1] != self.h:
            raise ValueError(
                "Expecting minhash with length %d, got %d" % (self.h, sigs.shape[1])
            )
        for k in keys:
            if k in self._key_to_pos:
                raise ValueError("The given key already exists: %r" % (k,))
        base = len(self._keys)
        for i, k in enumerate(keys):
            self._key_to_pos[k] = base + i
        self._keys.extend(keys)
        if self._sigs is not None:
            prev = np.asarray(self._sigs)[: self._n_real]
            sigs = np.concatenate([prev, sigs], axis=0)
        self._build(sigs)

    def _build(self, sigs: np.ndarray) -> None:
        mesh, axis = self.mesh, self.shard_axis
        n = sigs.shape[0]
        self._n_real = n
        # pad to a power-of-two multiple of the shard count: bounds the set
        # of compile shapes (remote-TPU compiles can take minutes for
        # unlucky sizes) and keeps shards equal
        n_pad = 128
        while n_pad < n:
            n_pad *= 2
        n_pad = -(-n_pad // self.n_shards) * self.n_shards
        pad = n_pad - n
        if pad:
            # Pseudo-random filler spreads across buckets; padded ids are
            # masked out at query time (gid >= n_real -> -1).
            rng = np.random.RandomState(n_pad & 0x7FFFFFFF)
            sigs = np.concatenate(
                [sigs, rng.randint(0, 1 << 32, size=(pad, self.h),
                                   dtype=np.uint64).astype(np.uint32)]
            )
        sig_sharding = NamedSharding(mesh, P(axis, None))
        self._sigs = jax.device_put(jnp.asarray(sigs), sig_sharding)

        b, r = self.b, self.r

        def build_body(s):
            fps = lsh_ops.band_fingerprints(s, b, r)
            return lsh_ops.build_tables(fps)

        build = jax.jit(
            jax.shard_map(
                build_body,
                mesh=mesh,
                in_specs=P(axis, None),
                out_specs=(P(None, axis), P(None, axis)),
            )
        )
        self._sorted_fp, self._sorted_ids = build(self._sigs)
        self._query_fn = None  # shapes changed; retrace lazily

    # ------------------------------------------------------------------ query

    def __contains__(self, key: Hashable) -> bool:
        return key in self._key_to_pos

    def __len__(self) -> int:
        return len(self._keys)

    def is_empty(self) -> bool:
        return len(self._keys) == 0

    def _make_query_fn(self):
        mesh, axis = self.mesh, self.shard_axis
        b, r, cap = self.b, self.r, self.bucket_cap

        def qbody(sorted_fp, sorted_ids, db_sigs, q_sigs, n_real):
            q_fps = lsh_ops.band_fingerprints(q_sigs, b, r)
            ids, trunc = lsh_ops.query_tables(sorted_fp, sorted_ids, q_fps, cap=cap)
            nq = q_sigs.shape[0]
            flat = ids.reshape(nq, -1)  # local ids within this shard
            scores = lsh_ops.rerank_jaccard(db_sigs, q_sigs, flat)
            n_loc = db_sigs.shape[0]
            shard = jax.lax.axis_index(axis)
            gid = jnp.where(flat >= 0, flat + shard * n_loc, -1)
            gid = jnp.where(gid < n_real, gid, -1)
            g_ids = jax.lax.all_gather(gid, axis, axis=1, tiled=True)
            g_sc = jax.lax.all_gather(scores, axis, axis=1, tiled=True)
            return g_ids, g_sc, jax.lax.psum(trunc, axis)

        return jax.jit(
            jax.shard_map(
                qbody,
                mesh=mesh,
                in_specs=(P(None, axis), P(None, axis), P(axis, None),
                          P(None, None), P()),
                out_specs=(P(None, None), P(None, None), P()),
                # all_gather/psum outputs are device-invariant; jax's
                # varying-manual-axes inference can't always prove it.
                check_vma=False,
            )
        )

    def query(self, minhash, threshold: Optional[float] = None) -> list:
        return self.query_batch([minhash], threshold=threshold)[0]

    def query_batch(
        self,
        minhashes,
        threshold: Optional[float] = None,
        return_scores: bool = False,
        rerank: Optional[bool] = None,
    ) -> list:
        """Batched query across all shards; one all_gather per call."""
        do_rerank = self.rerank if rerank is None else rerank
        if self._sigs is None or not self._n_real:
            return [[] for _ in minhashes]
        q_sigs = _as_signature_matrix(minhashes)
        if q_sigs.shape[1] != self.h:
            raise ValueError(
                "Expecting minhash with length %d, got %d" % (self.h, q_sigs.shape[1])
            )
        if self._query_fn is None:
            self._query_fn = self._make_query_fn()
        rep = NamedSharding(self.mesh, P(None, None))
        ids, scores, trunc = self._query_fn(
            self._sorted_fp,
            self._sorted_ids,
            self._sigs,
            jax.device_put(jnp.asarray(q_sigs), rep),
            jnp.int32(self._n_real),
        )
        self.last_truncated = int(trunc)
        ids_host = np.asarray(ids)
        sc_host = np.asarray(scores)
        cutoff = self.threshold if threshold is None else threshold
        out = []
        for qi in range(q_sigs.shape[0]):
            seen = {}
            row_ids, row_sc = ids_host[qi], sc_host[qi]
            for j in np.nonzero(row_ids >= 0)[0]:
                pos = int(row_ids[j])
                if pos not in seen:
                    seen[pos] = float(row_sc[j])
            if do_rerank:
                seen = {p: s for p, s in seen.items() if s >= cutoff}
            if return_scores:
                out.append(
                    sorted(
                        ((self._keys[p], s) for p, s in seen.items()),
                        key=lambda t: -t[1],
                    )
                )
            else:
                out.append([self._keys[p] for p in seen])
        return out

    def top_k(self, minhashes, k: int) -> list:
        """Top-k (key, score) per query across all shards."""
        rows = self.query_batch(minhashes, return_scores=True, rerank=False)
        return [row[:k] for row in rows]

"""ShardedHNSW — document-sharded ANN graph serving over a mesh.

The mesh form of :class:`datasketch_tpu.models.tpu_hnsw.TpuHNSW`
(reference semantics: ``/root/reference/datasketch/hnsw.py:146-226,
605-780``): the corpus shards over a mesh axis, each device builds and
owns an independent NSW graph over its slice
(:func:`datasketch_tpu.ops.knn_graph.build_nsw_graph` per shard — equal
slice sizes make every shard's padded graph arrays shape-identical, so
the whole structure stacks into sharded device arrays), a query batch
replicates, every shard runs the masked beam search of
:mod:`datasketch_tpu.ops.hnsw_ops` over its local graph, and only ``k``
candidates per shard ride the ``all_gather``; the replicated final
top-k merges by distance (shard-disjoint global ids need no dedupe).

Sharding the graph this way trades a slightly easier search problem per
shard (each beam only explores N/S points) for an S-way parallel build
and query — the standard IVF/sharded-ANN serving layout, and the direct
mesh analogue of the reference's "one shared index in Redis, many
clients" scale-out (``/root/reference/datasketch/storage.py:819+``).
"""

from __future__ import annotations

from typing import Callable, Hashable, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from datasketch_tpu.ops import hnsw_ops, knn_graph

__all__ = ["ShardedHNSW"]


class ShardedHNSW:
    """Device ANN index sharded over a mesh axis.

    Args:
        mesh: device mesh; documents shard over ``shard_axis``.
        distance_metric / m / ef / level_ratio / tile: as
            :class:`~datasketch_tpu.models.tpu_hnsw.TpuHNSW`.
        shard_axis: mesh axis name to shard documents over.
    """

    def __init__(self, mesh: Mesh, distance_metric: Union[str, Callable] = "l2",
                 m: int = 16, ef: int = 64, level_ratio: int = 8,
                 tile: int = 256, shard_axis: str = "data"):
        if m < 2:
            raise ValueError("m must be at least 2")
        self.mesh = mesh
        self.metric = distance_metric
        self.m = m
        self.ef = ef
        self.level_ratio = level_ratio
        self.tile = tile
        self.shard_axis = shard_axis
        self.n_shards = mesh.shape[shard_axis]
        self._keys: list = []  # corpus order, incl. tombstoned
        self._key_to_pos: dict = {}  # live keys only
        self._points_host: Optional[np.ndarray] = None  # [n_real, D]
        self._deleted_real: Optional[np.ndarray] = None  # bool[n_real]
        self._n_real = 0
        self._local_n = 0
        # stacked sharded device arrays ([S, ...], P(axis, ...))
        self._points = None
        self._adj0 = None
        self._deleted = None
        self._entry = None
        self._upper: list = []  # per level: (nodes [S, n_l], adj [S, n_l, deg])
        self._query_fns: dict = {}

    # ------------------------------------------------------------- building

    def _require_minhash_metric(self, name: str) -> None:
        if self.metric != "minhash_jaccard":
            raise ValueError(
                "%s requires distance_metric='minhash_jaccard' (points "
                "are MinHash signatures)" % name
            )

    def index_tokens(self, keys: Sequence[Hashable], token_docs,
                     num_perm: int = 128, seed: int = 1) -> None:
        """Bulk-build the sharded ANN graphs straight from PRE-TOKENIZED
        integer documents (ids hashed ON-CHIP; contract of
        :meth:`datasketch_tpu.models.tpu_hnsw.TpuHNSW.index_tokens`).
        Requires ``distance_metric='minhash_jaccard'``."""
        self._require_minhash_metric("index_tokens")
        if len(keys) != len(token_docs):
            raise ValueError("keys and token_docs must have equal length")
        from datasketch_tpu.models.minhash import MinHash

        self.index(keys, MinHash.bulk_signatures(
            token_docs, num_perm=num_perm, seed=seed, hashfunc="device",
        ))

    def index_text(self, keys: Sequence[Hashable], texts, k: int = 9,
                   num_perm: int = 128, seed: int = 1) -> None:
        """Bulk-build the sharded ANN graphs straight from RAW TEXT via
        on-device k-shingling (contract of
        :meth:`datasketch_tpu.models.tpu_hnsw.TpuHNSW.index_text`).
        Requires ``distance_metric='minhash_jaccard'``."""
        self._require_minhash_metric("index_text")
        if len(keys) != len(texts):
            raise ValueError("keys and texts must have equal length")
        from datasketch_tpu.models.minhash import MinHash

        self.index(keys, MinHash.bulk_from_text(
            texts, k=k, num_perm=num_perm, seed=seed, hashfunc="device",
        ))

    def index(self, keys: Sequence[Hashable], points) -> None:
        """Bulk (re)build the sharded graphs from (keys, points).

        Calling again re-shards the grown corpus; tombstoned keys drop
        out of the rebuilt graph (same invariant as ``TpuHNSW.index``).
        """
        keys = list(keys)
        pts = np.asarray(points, dtype=np.float32)
        if pts.ndim != 2 or pts.shape[0] != len(keys):
            raise ValueError("keys and points must have equal length")
        seen = set()
        for k in keys:
            if k in self._key_to_pos or k in seen:
                raise ValueError("The given key already exists: %r" % (k,))
            seen.add(k)
        if self._n_real:
            live = [k for k in self._keys if k in self._key_to_pos]
            old_pts = self._points_host[[self._key_to_pos[k] for k in live]]
            keys = live + keys
            pts = np.concatenate([old_pts, pts], axis=0)
        self._keys = keys
        self._key_to_pos = {k: i for i, k in enumerate(keys)}
        self._points_host = pts
        self._deleted_real = np.zeros(len(keys), dtype=bool)
        self._n_real = len(keys)
        self._build()

    def _build(self) -> None:
        pts = self._points_host
        n, d = pts.shape
        s = self.n_shards
        n_pad = 128
        while n_pad < n:
            n_pad *= 2
        n_pad = -(-n_pad // s) * s
        local_n = n_pad // s
        if n_pad != n:
            # filler = uniform points in the data bounding box: routable,
            # barred from results by the deleted mask, and NEVER copies of
            # real points — distance-0 duplicates would absorb a real
            # point's in-edges during diversity pruning and leave queries
            # finding only masked clones of it
            rng = np.random.RandomState(n_pad & 0x7FFFFFFF)
            lo, hi = pts.min(axis=0), pts.max(axis=0)
            span = np.where(hi > lo, hi - lo, 1.0)
            filler = (
                rng.random_sample((n_pad - n, d)).astype(np.float32) * span
                + lo
            )
            pts_pad = np.concatenate([pts, filler], axis=0)
        else:
            pts_pad = pts
        # per-shard graphs: equal local_n => identical level structure and
        # array shapes on every shard, so everything stacks
        graphs = [
            knn_graph.build_nsw_graph(
                pts_pad[i * local_n : (i + 1) * local_n],
                m=self.m,
                metric=self.metric,
                tile=self.tile,
                level_ratio=self.level_ratio,
                seed=7 + i,
            )
            for i in range(s)
        ]
        mesh, axis = self.mesh, self.shard_axis
        shard3 = NamedSharding(mesh, P(axis, None, None))
        shard2 = NamedSharding(mesh, P(axis, None))
        shard1 = NamedSharding(mesh, P(axis))
        self._points = jax.device_put(
            pts_pad.reshape(s, local_n, d), shard3
        )
        self._adj0 = jax.device_put(
            np.stack([np.asarray(g.adj0) for g in graphs]), shard3
        )
        self._entry = jax.device_put(
            np.array([g.entry for g in graphs], dtype=np.int32), shard1
        )
        self._upper = [
            (
                jax.device_put(
                    np.stack(
                        [np.asarray(g.upper_nodes[lv]) for g in graphs]
                    ),
                    shard2,
                ),
                jax.device_put(
                    np.stack(
                        [np.asarray(g.upper_adj[lv]) for g in graphs]
                    ),
                    shard3,
                ),
            )
            for lv in range(len(graphs[0].upper_nodes))
        ]
        self._local_n = local_n
        self._query_fns = {}
        self._upload_deleted()

    def _upload_deleted(self) -> None:
        s, local_n = self.n_shards, self._local_n
        pad = np.ones(s * local_n, dtype=bool)
        pad[: self._n_real] = self._deleted_real
        self._deleted = jax.device_put(
            pad.reshape(s, local_n),
            NamedSharding(self.mesh, P(self.shard_axis, None)),
        )

    # ------------------------------------------------------------ mutation

    def remove(self, key: Hashable) -> None:
        """Tombstone `key`: masked from every query (soft delete)."""
        if key not in self._key_to_pos:
            raise ValueError("The given key does not exist")
        pos = self._key_to_pos.pop(key)
        self._deleted_real[pos] = True
        self._upload_deleted()

    # --------------------------------------------------------------- query

    def _make_query_fn(self, k_out: int, ef: int, n_upper: int):
        mesh, axis = self.mesh, self.shard_axis
        dist = hnsw_ops._distance_fn(self.metric)
        local_n = self._local_n
        big = np.float32(3.4e38)

        def body(points, adj0, deleted, entry, queries, *upper_flat):
            pts, a0, dele = points[0], adj0[0], deleted[0]
            entries = jnp.full(
                (queries.shape[0],), entry[0], dtype=jnp.int32
            )
            for i in range(n_upper):
                nodes = upper_flat[2 * i][0]
                adj = upper_flat[2 * i + 1][0]
                entry_local = jnp.searchsorted(nodes, entries).astype(
                    jnp.int32
                )
                entries = hnsw_ops._greedy_level(
                    pts, nodes, adj, entry_local, queries, dist
                )
            ids, dists = hnsw_ops._beam_search(
                pts, a0, dele, entries, queries, dist, ef, ef
            )
            ids, dists = ids[:, :k_out], dists[:, :k_out]
            base = jax.lax.axis_index(axis) * local_n
            gids = jnp.where(ids >= 0, ids + base, -1)
            g_ids = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
            g_d = jax.lax.all_gather(dists, axis, axis=1, tiled=True)
            # merge by distance; shard-disjoint global ids need no dedupe
            masked = jnp.where(g_ids >= 0, g_d, big)
            top_negd, pos = jax.lax.top_k(-masked, k_out)
            top_ids = jnp.take_along_axis(g_ids, pos, axis=1)
            top_d = -top_negd
            return jnp.where(top_d < 1e37, top_ids, -1), top_d

        in_specs = [
            P(axis, None, None),  # points
            P(axis, None, None),  # adj0
            P(axis, None),  # deleted
            P(axis),  # entry
            P(None, None),  # queries (replicated)
        ]
        for _ in range(n_upper):
            in_specs += [P(axis, None), P(axis, None, None)]
        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=tuple(in_specs),
                out_specs=(P(None, None), P(None, None)),
                check_vma=False,
            )
        )

    def query(self, point, k: int = 10, ef: Optional[int] = None) -> list:
        """(key, distance) pairs for one query, nearest first."""
        return self.query_batch(np.asarray(point)[None, :], k, ef)[0]

    def query_batch(self, points, k: int = 10, ef: Optional[int] = None
                    ) -> list:
        """One sharded dispatch, one k-wide all_gather, one D2H fetch."""
        out = self._query_dispatch(points, k, ef)
        if isinstance(out, list):
            return out
        return self._query_finish(out, k)

    def query_stream(self, batches, k: int = 10, ef: Optional[int] = None,
                     depth: int = 4):
        """Pipelined :meth:`query_batch` over an iterable of batches
        (see :mod:`datasketch_tpu.utils.pipeline`); keep batch sizes
        uniform — each distinct padded shape compiles once."""
        from datasketch_tpu.utils.pipeline import stream_batches

        return stream_batches(
            batches,
            lambda b: self._query_dispatch(b, k, ef),
            lambda o: o if isinstance(o, list) else self._query_finish(o, k),
            depth=depth,
        )

    def _query_dispatch(self, points, k: int, ef: Optional[int]):
        if k <= 0:
            raise ValueError("k must be positive")
        q = np.asarray(points, dtype=np.float32)
        if self._points is None:
            return [[] for _ in range(q.shape[0])]
        ef = self.ef if ef is None else ef
        nq = q.shape[0]
        if nq == 0:
            return []
        q_pad = 8
        while q_pad < nq:
            q_pad *= 2
        if q_pad != nq:
            q = np.pad(q, ((0, q_pad - nq), (0, 0)))
        k_out = max(8, 1 << (k - 1).bit_length())
        ef = max(ef, k_out)
        cache_key = (k_out, ef)
        if cache_key not in self._query_fns:
            self._query_fns[cache_key] = self._make_query_fn(
                k_out, ef, len(self._upper)
            )
        rep = NamedSharding(self.mesh, P(None, None))
        upper_flat = [a for pair in self._upper for a in pair]
        ids, dists = self._query_fns[cache_key](
            self._points,
            self._adj0,
            self._deleted,
            self._entry,
            jax.device_put(jnp.asarray(q), rep),
            *upper_flat,
        )
        return ids, dists, nq

    def _query_finish(self, out, k: int) -> list:
        ids, dists, nq = out
        ids_h, dists_h = jax.device_get((ids, dists))
        result = []
        for row_ids, row_d in zip(ids_h[:nq], dists_h[:nq]):
            result.append(
                [
                    (self._keys[int(i)], float(d))
                    for i, d in zip(row_ids[:k], row_d[:k])
                    if i >= 0 and d < 1e37
                ]
            )
        return result

    def warmup(self, batch_sizes=(8, 64), k: int = 10) -> None:
        """Pay per-shape compiles before serving traffic; no-op while
        empty (parity with the other serving indexes)."""
        if self._points is None or not self._n_real:
            return
        rng = np.random.RandomState(0)
        dim = self._points_host.shape[1]
        for q in batch_sizes:
            self.query_batch(
                rng.standard_normal((int(q), dim)).astype(np.float32), k
            )

    # ------------------------------------------------------------- plumbing

    def __contains__(self, key: Hashable) -> bool:
        return key in self._key_to_pos

    def __len__(self) -> int:
        return len(self._key_to_pos)

    def is_empty(self) -> bool:
        return len(self) == 0

    def status(self) -> dict:
        out = {
            "n_shards": self.n_shards,
            "n_indexed": self._n_real,
            "live": len(self._key_to_pos),
            "tombstoned": int(
                self._deleted_real.sum()
            ) if self._deleted_real is not None else 0,
            "levels": 1 + len(self._upper),
            "local_n": self._local_n,
            "device_bytes": 0,
        }
        if self._points is not None:
            out["device_bytes"] = int(
                self._points.size * 4 + self._adj0.size * 4
            )
        return out

    # ---------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        """Persist points + keys + tombstones as ``.npz``; graphs rebuild
        (re-sharded to the loading mesh) on load."""
        from datasketch_tpu.persist import atomic_savez, pack_keys

        if self._points_host is None:
            raise ValueError("Cannot save an empty index")
        atomic_savez(
            path,
            kind=np.array("sharded_hnsw"),
            metric=np.array(
                self.metric if isinstance(self.metric, str) else "custom"
            ),
            points=self._points_host,
            deleted=self._deleted_real,
            keys=pack_keys(self._keys),
            params=np.array(
                [self.m, self.ef, self.level_ratio, self.tile],
                dtype=np.int64,
            ),
        )

    @classmethod
    def load(cls, path: str, mesh: Mesh, shard_axis: str = "data",
             distance_metric: Optional[Union[str, Callable]] = None
             ) -> "ShardedHNSW":
        """SECURITY: the key list inside the file is a pickle payload —
        only load index files you created or trust."""
        from datasketch_tpu.persist import npz_path, unpack_keys

        data = np.load(npz_path(path), allow_pickle=False)
        if str(data["kind"]) != "sharded_hnsw":
            raise ValueError("not a ShardedHNSW checkpoint")
        metric = distance_metric
        if metric is None:
            metric = str(data["metric"])
            if metric == "custom":
                raise ValueError(
                    "index was saved with a custom distance callable; "
                    "pass distance_metric= to load()"
                )
        m, ef, level_ratio, tile = (int(x) for x in data["params"])
        obj = cls(mesh, distance_metric=metric, m=m, ef=ef,
                  level_ratio=level_ratio, tile=tile, shard_axis=shard_axis)
        keys = unpack_keys(data["keys"])
        if keys:
            deleted = data["deleted"].astype(bool)
            obj._keys = keys
            obj._key_to_pos = {
                k: i for i, k in enumerate(keys) if not deleted[i]
            }
            obj._points_host = data["points"].astype(np.float32)
            obj._deleted_real = deleted
            obj._n_real = len(keys)
            obj._build()
        return obj

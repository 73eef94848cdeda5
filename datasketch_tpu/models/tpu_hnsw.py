"""TpuHNSW — device-resident ANN serving index.

The serving-side complement to :class:`datasketch_tpu.models.hnsw.HNSW`
(which keeps the reference's full MutableMapping mutation surface,
``/root/reference/datasketch/hnsw.py:146-226``): the graph lives in
device memory as padded adjacency arrays, bulk builds run on device
(:func:`datasketch_tpu.ops.knn_graph.build_nsw_graph` — tiled exact kNN
+ diversity pruning + nested routing levels), and queries are batched
masked beam searches (:mod:`datasketch_tpu.ops.hnsw_ops`).

Mutation model (matches the other Tpu* indexes): ``add`` buffers on
host and rebuilds lazily at the next query; ``remove`` tombstones via
the deleted mask; ``from_hnsw`` snapshots a host-built index for
serving.
"""

from __future__ import annotations

from typing import Callable, Hashable, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from datasketch_tpu.ops import hnsw_ops, knn_graph

__all__ = ["TpuHNSW"]


class TpuHNSW:
    """Device ANN index over a hierarchical NSW graph.

    Args:
        distance_metric: ``'l2'``, ``'cosine'``, ``'minhash_jaccard'``,
            or a jittable ``(query, points_matrix) -> dists`` callable.
        m: out-degree of the navigable graph (base layer capped at 2m).
        ef: default beam width for queries.
    """

    def __init__(
        self,
        distance_metric: Union[str, Callable] = "l2",
        m: int = 16,
        ef: int = 64,
        level_ratio: int = 8,
        tile: int = 256,
    ) -> None:
        if m < 2:
            raise ValueError("m must be at least 2")
        self.metric = distance_metric
        self.m = m
        self.ef = ef
        self.level_ratio = level_ratio
        self.tile = tile

        self._graph: Optional[hnsw_ops.DeviceGraph] = None
        self._key_to_pos: dict = {}
        self._deleted_host: Optional[np.ndarray] = None
        self._pending: list = []  # (key, point) awaiting rebuild

    # ------------------------------------------------------------------ build

    def index(self, keys: Sequence[Hashable], points) -> None:
        """Bulk (re)build the graph on device from (keys, points)."""
        keys = list(keys)
        pts = np.asarray(points)
        if pts.shape[0] != len(keys):
            raise ValueError("keys and points must have equal length")
        # Check buffered add()s too: a clash detected only when
        # _flush_pending() later re-enters index() would raise from inside
        # an unrelated query() AFTER the pending buffer was already
        # cleared, losing every other buffered point.
        seen = {k for k, _ in self._pending}
        for k in keys:
            if k in self._key_to_pos or k in seen:
                raise ValueError("The given key already exists: %r" % (k,))
            seen.add(k)
        if self._graph is not None:
            old_keys = [
                k for k in self._graph.keys if k in self._key_to_pos
            ]
            old_alive = [self._key_to_pos[k] for k in old_keys]
            old_pts = np.asarray(self._graph.points)[old_alive]
            keys = old_keys + keys
            pts = np.concatenate([old_pts, pts], axis=0)
        self._rebuild(keys, pts)

    def index_tokens(self, keys: Sequence[Hashable], token_docs,
                     num_perm: int = 128, seed: int = 1) -> None:
        """Bulk-build the ANN graph straight from PRE-TOKENIZED integer
        documents: ids hash ON-CHIP into MinHash signatures (the
        ``minhash_jaccard`` metric's point form) — the contract of
        :meth:`datasketch_tpu.models.tpu_lsh.TpuMinHashLSH.index_tokens`.
        Requires ``distance_metric='minhash_jaccard'``; query with
        signatures built the same way at equal seed."""
        self._require_minhash_metric("index_tokens")
        if len(keys) != len(token_docs):
            raise ValueError("keys and token_docs must have equal length")
        from datasketch_tpu.models.minhash import MinHash

        self.index(keys, MinHash.bulk_signatures(
            token_docs, num_perm=num_perm, seed=seed, hashfunc="device",
        ))

    def index_text(self, keys: Sequence[Hashable], texts, k: int = 9,
                   num_perm: int = 128, seed: int = 1) -> None:
        """Bulk-build the ANN graph straight from RAW TEXT via on-device
        k-shingling (contract of
        :meth:`datasketch_tpu.models.tpu_lsh.TpuMinHashLSH.index_text`).
        Requires ``distance_metric='minhash_jaccard'``."""
        self._require_minhash_metric("index_text")
        if len(keys) != len(texts):
            raise ValueError("keys and texts must have equal length")
        from datasketch_tpu.models.minhash import MinHash

        self.index(keys, MinHash.bulk_from_text(
            texts, k=k, num_perm=num_perm, seed=seed, hashfunc="device",
        ))

    def _require_minhash_metric(self, name: str) -> None:
        if self.metric != "minhash_jaccard":
            raise ValueError(
                "%s requires distance_metric='minhash_jaccard' (points "
                "are MinHash signatures)" % name
            )

    def add(self, key: Hashable, point) -> None:
        """Buffer one (key, point); the graph rebuilds at the next query.

        Bulk rebuilds are how graphs mutate on an accelerator — the
        reference's per-insert graph surgery (``hnsw.py:451-516``) stays
        available on the host class."""
        if key in self._key_to_pos or any(k == key for k, _ in self._pending):
            raise ValueError("The given key already exists")
        self._pending.append((key, np.asarray(point)))

    def _flush_pending(self) -> None:
        if not self._pending:
            return
        keys = [k for k, _ in self._pending]
        pts = np.stack([p for _, p in self._pending])
        self._pending = []
        self.index(keys, pts)

    def _rebuild(self, keys: list, pts: np.ndarray) -> None:
        self._graph = knn_graph.build_nsw_graph(
            pts,
            keys=keys,
            m=self.m,
            metric=self.metric,
            tile=self.tile,
            level_ratio=self.level_ratio,
        )
        self._key_to_pos = {k: i for i, k in enumerate(keys)}
        self._deleted_host = np.zeros(len(keys), dtype=bool)

    @classmethod
    def from_hnsw(cls, host_index, distance_metric="l2", ef: int = 64
                  ) -> "TpuHNSW":
        """Snapshot a host :class:`~datasketch_tpu.models.hnsw.HNSW`
        (including its soft-delete tombstones) for device serving."""
        obj = cls(distance_metric=distance_metric, ef=ef)
        obj._graph = hnsw_ops.export_graph(host_index)
        if obj._graph.deleted is not None:
            obj._deleted_host = np.asarray(obj._graph.deleted)
        else:
            obj._deleted_host = np.zeros(len(obj._graph.keys), dtype=bool)
        # Tombstoned keys stay OUT of _key_to_pos (same invariant as
        # load()/remove()): they must read as absent, and a later
        # index() rebuild — which re-derives the corpus from
        # _key_to_pos — must not resurrect them.
        obj._key_to_pos = {
            k: i
            for i, k in enumerate(obj._graph.keys)
            if not obj._deleted_host[i]
        }
        return obj

    # ------------------------------------------------------------ mutation

    def remove(self, key: Hashable) -> None:
        """Tombstone `key`: masked from every query (soft delete)."""
        self._flush_pending()
        if key not in self._key_to_pos:
            raise ValueError("The given key does not exist")
        pos = self._key_to_pos.pop(key)
        self._deleted_host[pos] = True
        self._graph.deleted = jnp.asarray(self._deleted_host)

    # --------------------------------------------------------------- query

    def query(self, point, k: int = 10, ef: Optional[int] = None) -> list:
        """(key, distance) pairs for one query, nearest first."""
        return self.query_batch(np.asarray(point)[None, :], k, ef)[0]

    def query_batch(self, points, k: int = 10, ef: Optional[int] = None
                    ) -> list:
        out = self._query_dispatch(points, k, ef)
        if isinstance(out, list):
            return out
        return self._query_finish(out)

    def query_stream(self, batches, k: int = 10, ef: Optional[int] = None,
                     depth: int = 4):
        """Pipelined :meth:`query_batch` over an iterable of batches
        (see :mod:`datasketch_tpu.utils.pipeline`); keep batch sizes
        uniform — each distinct padded shape compiles once."""
        from datasketch_tpu.utils.pipeline import stream_batches

        return stream_batches(
            batches,
            lambda b: self._query_dispatch(b, k, ef),
            lambda o: o if isinstance(o, list) else self._query_finish(o),
            depth=depth,
        )

    def _query_dispatch(self, points, k: int, ef: Optional[int]):
        self._flush_pending()
        if self._graph is None:
            return [[] for _ in range(np.asarray(points).shape[0])]
        ef = self.ef if ef is None else ef
        q = np.asarray(points)
        nq = q.shape[0]
        q_pad = 8
        while q_pad < nq:
            q_pad *= 2
        if q_pad != nq:
            q = np.pad(q, ((0, q_pad - nq), (0, 0)))
        g = self._graph
        deleted = g.deleted
        if deleted is None:
            deleted = jnp.zeros((g.n,), dtype=bool)
        ids, dists = hnsw_ops._query_jit(
            g.points,
            g.adj0,
            deleted,
            tuple(zip(g.upper_nodes, g.upper_adj)),
            g.entry,
            jnp.asarray(q),
            hnsw_ops._distance_fn(self.metric),
            k,
            ef,
            ef,
        )
        return ids, dists, nq

    def _query_finish(self, out) -> list:
        ids, dists, nq = out
        ids, dists = jax.device_get((ids, dists))
        result = []
        for row_ids, row_d in zip(ids[:nq], dists[:nq]):
            result.append(
                [
                    (self._graph.keys[int(i)], float(d))
                    for i, d in zip(row_ids, row_d)
                    if i >= 0 and d < 1e37
                ]
            )
        return result

    # ------------------------------------------------------------ plumbing

    def __contains__(self, key: Hashable) -> bool:
        return key in self._key_to_pos or any(
            k == key for k, _ in self._pending
        )

    def __len__(self) -> int:
        return len(self._key_to_pos) + len(self._pending)

    def is_empty(self) -> bool:
        return len(self) == 0

    def status(self) -> dict:
        self._flush_pending()
        if self._graph is None:
            return {"n": 0, "levels": 0, "tombstoned": 0}
        g = self._graph
        return {
            "n": int(g.n),
            "live": int(len(self._key_to_pos)),
            "tombstoned": int(self._deleted_host.sum()),
            "levels": 1 + len(g.upper_nodes),
            "degree0": int(g.adj0.shape[1]),
            "bytes_points": int(np.prod(g.points.shape)) * 4,
            "bytes_adj": int(np.prod(g.adj0.shape)) * 4,
        }

    # ------------------------------------------------------------ persistence

    def save(self, path: str) -> None:
        """Persist graph + points + tombstones as ``.npz``."""
        from datasketch_tpu.persist import atomic_savez, pack_keys

        self._flush_pending()
        if self._graph is None:
            raise ValueError("Cannot save an empty index")
        g = self._graph
        payload = {
            "kind": np.array("tpu_hnsw"),
            "metric": np.array(
                self.metric if isinstance(self.metric, str) else "custom"
            ),
            "m": np.int64(self.m),
            "ef": np.int64(self.ef),
            "entry": np.int64(g.entry),
            "points": np.asarray(g.points),
            "adj0": np.asarray(g.adj0),
            "deleted": self._deleted_host,
            "keys": pack_keys(list(g.keys)),
            "n_upper": np.int64(len(g.upper_nodes)),
        }
        for i, (nodes, adj) in enumerate(zip(g.upper_nodes, g.upper_adj)):
            payload[f"upper_nodes_{i}"] = np.asarray(nodes)
            payload[f"upper_adj_{i}"] = np.asarray(adj)
        atomic_savez(path, **payload)

    @classmethod
    def load(cls, path: str, distance_metric: Optional[
            Union[str, Callable]] = None) -> "TpuHNSW":
        """SECURITY: the key list inside the file is a pickle payload —
        only load index files you created or trust."""
        from datasketch_tpu.persist import npz_path, unpack_keys

        data = np.load(npz_path(path), allow_pickle=False)
        if str(data["kind"]) != "tpu_hnsw":
            raise ValueError("not a TpuHNSW checkpoint")
        metric = distance_metric
        if metric is None:
            metric = str(data["metric"])
            if metric == "custom":
                raise ValueError(
                    "index was saved with a custom distance callable; "
                    "pass distance_metric= to load()"
                )
        obj = cls(distance_metric=metric, m=int(data["m"]), ef=int(data["ef"]))
        keys = unpack_keys(data["keys"])
        deleted = data["deleted"].astype(bool)
        obj._graph = hnsw_ops.DeviceGraph(
            points=jnp.asarray(data["points"]),
            adj0=jnp.asarray(data["adj0"]),
            upper_nodes=[
                jnp.asarray(data[f"upper_nodes_{i}"])
                for i in range(int(data["n_upper"]))
            ],
            upper_adj=[
                jnp.asarray(data[f"upper_adj_{i}"])
                for i in range(int(data["n_upper"]))
            ],
            entry=int(data["entry"]),
            keys=keys,
            deleted=jnp.asarray(deleted),
        )
        obj._deleted_host = deleted
        obj._key_to_pos = {
            k: i for i, k in enumerate(keys) if not deleted[i]
        }
        return obj

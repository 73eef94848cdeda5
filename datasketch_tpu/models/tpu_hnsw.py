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

    # appends below this corpus size just rebuild (the full device build
    # is already sub-second there and needs no append machinery)
    _MIN_APPEND_N = 256

    def __init__(
        self,
        distance_metric: Union[str, Callable] = "l2",
        m: int = 16,
        ef: int = 64,
        level_ratio: int = 8,
        tile: int = 256,
        rebuild_fraction: float = 0.2,
    ) -> None:
        if m < 2:
            raise ValueError("m must be at least 2")
        self.metric = distance_metric
        self.m = m
        self.ef = ef
        self.level_ratio = level_ratio
        self.tile = tile
        self.rebuild_fraction = rebuild_fraction

        self._graph: Optional[hnsw_ops.DeviceGraph] = None
        self._key_to_pos: dict = {}
        self._deleted_host: Optional[np.ndarray] = None
        self._pending: list = []  # (key, point) awaiting link/rebuild
        self._n_real = 0  # live+tombstoned rows; the rest is capacity pad
        self._appended = 0  # rows appended since the last full build
        self._adj0_host: Optional[np.ndarray] = None  # lazy device mirror

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
        """Buffer one (key, point); linked into the graph at the next
        query.

        Small buffered batches are LINKED INCREMENTALLY against the
        frozen graph (beam-search the neighbors, diversity-prune, append
        padded adjacency rows, re-prune overflowed reverse rows — the
        device form of the reference's per-insert graph surgery,
        ``/root/reference/datasketch/hnsw.py:451-516``); a full device
        rebuild runs only when appends since the last build exceed
        ``rebuild_fraction`` of the corpus (appended nodes skip the
        upper routing levels, so recall would drift if appends
        accumulated unboundedly)."""
        if key in self._key_to_pos or any(k == key for k, _ in self._pending):
            raise ValueError("The given key already exists")
        self._pending.append((key, np.asarray(point)))

    def flush(self) -> None:
        """Link any buffered :meth:`add` points into the graph NOW
        (queries flush implicitly; explicit flush separates the link
        cost from query latency — what `benchmarks/hnsw_incremental.py`
        measures)."""
        self._flush_pending()

    def _flush_pending(self) -> None:
        if not self._pending:
            return
        keys = [k for k, _ in self._pending]
        pts = np.stack([p for _, p in self._pending])
        self._pending = []
        if (
            self._graph is None
            or self._n_real < self._MIN_APPEND_N
            or self._appended + len(keys)
            > self.rebuild_fraction * self._n_real
        ):
            self.index(keys, pts)
        else:
            self._append_batch(keys, pts)

    def _rebuild(self, keys: list, pts: np.ndarray) -> None:
        g = knn_graph.build_nsw_graph(
            pts,
            keys=keys,
            m=self.m,
            metric=self.metric,
            tile=self.tile,
            level_ratio=self.level_ratio,
        )
        self._key_to_pos = {k: i for i, k in enumerate(keys)}
        self._install(g, len(keys))

    def _install(self, g, n_real: int) -> None:
        """Adopt a freshly built graph, padding device arrays to a pow-2
        CAPACITY: appends then keep one compiled query program per
        query-batch shape (each distinct row count would otherwise
        recompile through the remote-TPU path). Padding rows are
        tombstoned and edgeless — unreachable and masked from results.
        """
        cap = 128
        while cap < n_real:
            cap *= 2
        extra = cap - g.points.shape[0]
        deleted = np.zeros(cap, dtype=bool)
        deleted[n_real:] = True
        if extra:
            g.points = jnp.pad(g.points, ((0, extra), (0, 0)))
            g.adj0 = jnp.pad(
                g.adj0, ((0, extra), (0, 0)), constant_values=-1
            )
        g.deleted = jnp.asarray(deleted)
        self._graph = g
        self._deleted_host = deleted
        self._n_real = n_real
        self._appended = 0
        self._adj0_host = None

    # ------------------------------------------------------- incremental link

    def _ensure_capacity(self, need: int) -> None:
        g = self._graph
        cap = g.points.shape[0]
        if need <= cap:
            return
        new_cap = cap
        while new_cap < need:
            new_cap *= 2
        extra = new_cap - cap
        g.points = jnp.pad(g.points, ((0, extra), (0, 0)))
        g.adj0 = jnp.pad(g.adj0, ((0, extra), (0, 0)), constant_values=-1)
        self._deleted_host = np.pad(
            self._deleted_host, (0, extra), constant_values=True
        )
        g.deleted = jnp.asarray(self._deleted_host)
        if self._adj0_host is not None:
            self._adj0_host = np.pad(
                self._adj0_host, ((0, extra), (0, 0)), constant_values=-1
            )

    def _ensure_adj0_host(self) -> np.ndarray:
        """Host mirror of the device adjacency (one D2H per build cycle;
        kept in sync by the append path's in-place updates)."""
        if self._adj0_host is None:
            self._adj0_host = np.asarray(self._graph.adj0).copy()
        return self._adj0_host

    @staticmethod
    def _scatter_rows(arr, rows: np.ndarray, vals: np.ndarray):
        """``arr.at[rows].set(vals)`` with the row count padded to a
        pow-2 bucket (duplicated trailing rows are idempotent), bounding
        the set of compiled scatter programs."""
        b = rows.shape[0]
        bpad = 8
        while bpad < b:
            bpad *= 2
        if bpad != b:
            rows = np.pad(rows, (0, bpad - b), mode="edge")
            vals = np.pad(
                vals, ((0, bpad - b),) + ((0, 0),) * (vals.ndim - 1),
                mode="edge",
            )
        return arr.at[jnp.asarray(rows)].set(jnp.asarray(vals))

    def _append_batch(self, keys: list, pts: np.ndarray) -> None:
        """Link a buffered batch against the frozen graph: O(B) beam
        searches + bounded scatters, instead of the O(N) full rebuild
        (round-3 weakness #4). New nodes get ``m`` diversity-pruned
        forward edges; reverse edges fill spare adjacency capacity, and
        rows that overflow are re-pruned on device over old+new
        candidates (hnswlib's shrink heuristic, vectorized)."""
        g = self._graph
        n0 = self._n_real
        b = len(keys)
        pts = np.ascontiguousarray(pts).astype(g.points.dtype, copy=False)
        deg_cap = g.adj0.shape[1]
        m = self.m
        dist = hnsw_ops._distance_fn(self.metric)
        self._ensure_capacity(n0 + b)
        g = self._graph

        # 1. neighbor candidates: beam-search the frozen graph (chunked,
        # pow-2 padded — bounded compile shapes)
        kc = min(3 * m, n0)
        ef = max(self.ef, kc)
        uppers = tuple(zip(g.upper_nodes, g.upper_adj))
        cand_rows = []
        chunk = 1024
        for i in range(0, b, chunk):
            qb = pts[i : i + chunk]
            real = qb.shape[0]
            qpad = 8
            while qpad < real:
                qpad *= 2
            if qpad != real:
                qb = np.pad(qb, ((0, qpad - real), (0, 0)))
            ids, _ = hnsw_ops._query_jit(
                g.points, g.adj0, g.deleted, uppers, g.entry,
                jnp.asarray(qb), dist, kc, ef, ef,
            )
            cand_rows.append(np.asarray(ids)[:real])
        cands = np.concatenate(cand_rows, axis=0)

        # 2. forward edges: diversity-prune the candidates (device)
        fwd = np.asarray(
            knn_graph.prune_candidates(
                jnp.asarray(pts), jnp.asarray(cands), g.points, m, dist
            )
        )

        # 3. new points land on device before any re-prune gathers them
        new_ids = np.arange(n0, n0 + b, dtype=np.int32)
        g.points = self._scatter_rows(g.points, new_ids, pts)

        # 4. adjacency update on the host mirror
        adj = self._ensure_adj0_host()
        adj[new_ids] = -1
        adj[new_ids, :m] = fwd
        src = np.repeat(new_ids, fwd.shape[1])
        dst = fwd.ravel()
        ok = dst >= 0
        src, dst = src[ok], dst[ok]
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        fill = (adj[:n0] >= 0).sum(axis=1).astype(np.int64)
        first = np.searchsorted(dst, dst, side="left")
        rank = np.arange(dst.shape[0]) - first
        slot = fill[dst] + rank
        fits = slot < deg_cap
        adj[dst[fits], slot[fits]] = src[fits]

        # 5. overflowed reverse rows: re-prune old neighbors + newcomers
        if (~fits).any():
            rows_over = dst[~fits]
            srcs_over = src[~fits]
            ov_v = np.unique(rows_over)
            r2 = np.arange(rows_over.shape[0]) - np.searchsorted(
                rows_over, rows_over, side="left"
            )
            # Bucket the overflow multiplicity to a power of two: the
            # candidate-matrix width (deg_cap + max_new) is a static
            # shape for prune_candidates, so a raw max_new would compile
            # a fresh program per distinct pile-up depth (minutes-scale
            # through the remote tunnel). Extra -1 columns are ignored
            # by the pruner.
            max_new = 1
            while max_new < int(r2.max()) + 1:
                max_new *= 2
            cmat = np.full(
                (ov_v.shape[0], deg_cap + max_new), -1, dtype=np.int32
            )
            cmat[:, :deg_cap] = adj[ov_v]
            cmat[np.searchsorted(ov_v, rows_over), deg_cap + r2] = srcs_over
            pruned = np.asarray(
                knn_graph.prune_candidates(
                    g.points[jnp.asarray(ov_v)], jnp.asarray(cmat),
                    g.points, deg_cap, dist,
                )
            )
            adj[ov_v] = pruned
            touched = np.unique(np.concatenate([dst[fits], ov_v]))
        else:
            touched = np.unique(dst[fits])

        # 6. ship the changed adjacency rows (new + touched) in one scatter
        rows = np.concatenate([new_ids, touched.astype(np.int32)])
        g.adj0 = self._scatter_rows(g.adj0, rows, adj[rows])

        # 7. metadata: appended rows go live
        self._deleted_host[n0 : n0 + b] = False
        g.deleted = jnp.asarray(self._deleted_host)
        g.keys.extend(keys)
        for i, k in enumerate(keys):
            self._key_to_pos[k] = n0 + i
        self._n_real += b
        self._appended += b

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
        obj._n_real = len(obj._graph.keys)
        obj._appended = 0
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
            "n": self._n_real,
            "live": int(len(self._key_to_pos)),
            "tombstoned": int(
                self._deleted_host[: self._n_real].sum()
            ),
            "appended_since_build": self._appended,
            "capacity": int(g.n),
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
        obj._n_real = len(keys)
        obj._appended = 0
        return obj

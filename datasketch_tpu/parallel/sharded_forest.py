"""ShardedMinHashLSHForest — document-sharded top-k forest over a mesh.

The mesh form of :class:`datasketch_tpu.models.tpu_forest.
TpuMinHashLSHForest` (reference semantics:
``/root/reference/datasketch/lshforest.py:9-128``): each device owns
``N / n_shards`` documents' signatures and their per-tree sorted prefix
arrays, a query batch is replicated, every shard runs the fused forest
query (per-level run narrowing + level-weighted Jaccard top-k) over its
slice, and only ``k`` candidates per shard ride the ``all_gather``; the
final cross-shard top-k re-ranks by the same (prefix depth, Jaccard) key
and runs replicated. Table construction is the host lexsort build
(immune to the remote-TPU multi-key-sort compile pathology), one slice
per shard, uploaded sharded in one ``device_put``.
"""

from __future__ import annotations

from typing import Hashable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from datasketch_tpu.models.tpu_lsh import _as_signature_matrix
from datasketch_tpu.ops import forest_ops

__all__ = ["ShardedMinHashLSHForest"]


class ShardedMinHashLSHForest:
    """Top-k Jaccard forest sharded over a mesh axis.

    Args:
        mesh: device mesh; documents shard over ``shard_axis``.
        num_perm / l / cap: as
            :class:`~datasketch_tpu.models.tpu_forest.TpuMinHashLSHForest`.
        shard_axis: mesh axis name to shard documents over.
    """

    def __init__(self, mesh: Mesh, num_perm: int = 128, l: int = 8,
                 cap: int = 64, shard_axis: str = "data",
                 rank: str = "forest", cascade_perm=None, pool: int = 0,
                 method: str = "auto"):
        if l <= 0 or num_perm <= 0:
            raise ValueError("num_perm and l must be positive")
        if l > num_perm:
            raise ValueError("l cannot be greater than num_perm")
        if rank not in ("forest", "jaccard"):
            raise ValueError("rank must be 'forest' or 'jaccard'")
        if method not in ("auto", "forest", "scan"):
            raise ValueError("method must be 'auto', 'forest' or 'scan'")
        self.rank = rank
        # serving route — see TpuMinHashLSHForest: 'scan' answers with
        # the exact per-shard fused top-k (recall 1.0 over stored
        # sketches, jaccard-ranked), 'auto' picks it whenever each
        # shard's slice is smaller than the walk's worst-case gather
        # volume AND ranking is 'jaccard'
        self.method = method
        self.mesh = mesh
        self.l = l
        self.k = int(num_perm / l)
        self.num_perm = num_perm
        self.width = self.k * self.l
        if cascade_perm is not None and cascade_perm < self.width:
            raise ValueError("cascade_perm must be >= the prefix width k*l")
        self.cascade_perm = cascade_perm
        # rows stored (and Jaccard-scored) at score_width; prefix trees
        # read only the first k*l slots (see TpuMinHashLSHForest)
        self.score_width = cascade_perm if cascade_perm else self.width
        if pool < 0:
            raise ValueError("pool must be >= 0")
        self.pool = pool  # 0 = per-rank default (forest_ops.forest_topk)
        self.cap = cap
        self.shard_axis = shard_axis
        self.n_shards = mesh.shape[shard_axis]
        self._keys: list = []
        self._key_set: set = set()
        self._sigs = None  # uint32[N_pad, width] sharded P(axis, None)
        self._sorted_fps = None  # uint32[l, k, N_pad] sharded on last axis
        self._sorted_ids = None  # int32[l, N_pad] LOCAL ids per shard slice
        self._n_real = 0
        self._n_real_dev = None
        self._query_fns: dict = {}  # (k_out, rank) -> compiled query
        self.last_truncated = 0

    # ------------------------------------------------------------- building

    def index_tokens(self, keys: Sequence[Hashable], token_docs,
                     seed: int = 1) -> None:
        """Bulk-build straight from PRE-TOKENIZED integer documents (ids
        hashed ON-CHIP, signatures device-resident end to end — contract
        of :meth:`datasketch_tpu.models.tpu_lsh.TpuMinHashLSH.
        index_tokens`). Query with ``hashfunc='device'`` sketches at
        equal seed."""
        if len(keys) != len(token_docs):
            raise ValueError("keys and token_docs must have equal length")
        from datasketch_tpu.models.minhash import MinHash

        self.index(keys, MinHash.bulk_signatures(
            token_docs, num_perm=self.score_width, seed=seed,
            hashfunc="device",
        ))

    def index_text(self, keys: Sequence[Hashable], texts, k: int = 9,
                   seed: int = 1) -> None:
        """Bulk-build straight from RAW TEXT via on-device k-shingling
        (contract of :meth:`datasketch_tpu.models.tpu_lsh.TpuMinHashLSH.
        index_text`). Query with ``MinHash.bulk_from_text(...,
        hashfunc='device')`` sketches at equal ``(k, seed)``."""
        if len(keys) != len(texts):
            raise ValueError("keys and texts must have equal length")
        from datasketch_tpu.models.minhash import MinHash

        self.index(keys, MinHash.bulk_from_text(
            texts, k=k, num_perm=self.score_width, seed=seed,
            hashfunc="device",
        ))

    def index(self, keys: Sequence[Hashable], minhashes) -> None:
        """Bulk-build (or extend) the sharded forest.

        Tables are host-lexsorted per shard slice and uploaded sharded;
        calling again re-shards the grown corpus.
        """
        keys = list(keys)
        sigs = _as_signature_matrix(minhashes)
        if sigs.shape[0] != len(keys):
            raise ValueError("keys and minhashes must have equal length")
        if sigs.shape[0] and sigs.shape[1] < self.score_width:
            raise ValueError("The num_perm of MinHash out of range")
        # validate the WHOLE batch before mutating _key_set: a mid-batch
        # duplicate must not poison the earlier (rejected) keys
        seen = set()
        for kk in keys:
            if kk in self._key_set or kk in seen:
                raise ValueError("The given key has already been added")
            seen.add(kk)
        self._key_set.update(seen)
        sigs = np.asarray(sigs)[:, : self.score_width]
        if self._n_real:
            old = self._to_host(self._sigs)[: self._n_real]
            sigs = np.concatenate([old, sigs], axis=0)
        self._keys.extend(keys)
        self._build(sigs)

    def _to_host(self, arr) -> np.ndarray:
        """Full host copy, multi-process safe; COLLECTIVE on a
        multi-process mesh (see :func:`~datasketch_tpu.parallel.mesh.
        fetch_global` for the ordering rule)."""
        from datasketch_tpu.parallel.mesh import fetch_global

        return fetch_global(arr, self.mesh)

    def _build(self, sigs: np.ndarray) -> None:
        mesh, axis = self.mesh, self.shard_axis
        n = sigs.shape[0]
        self._n_real = n
        self._n_real_dev = jnp.int32(n)
        n_pad = 128
        while n_pad < n:
            n_pad *= 2
        n_pad = -(-n_pad // self.n_shards) * self.n_shards
        if n_pad != n:
            rng = np.random.RandomState(n_pad & 0x7FFFFFFF)
            filler = rng.randint(
                0, 1 << 32, size=(n_pad - n, self.score_width),
                dtype=np.uint64,
            ).astype(np.uint32)
            sigs = np.concatenate([sigs, filler], axis=0)
        local_n = n_pad // self.n_shards
        fps_parts, ids_parts = [], []
        for s in range(self.n_shards):
            sl = sigs[s * local_n : (s + 1) * local_n]
            f, i = forest_ops.build_forest_host(sl, self.l, self.k)
            fps_parts.append(f)
            ids_parts.append(i)  # LOCAL ids (0..local_n) — offset at query
        self._sigs = jax.device_put(
            sigs, NamedSharding(mesh, P(axis, None))
        )
        self._sorted_fps = jax.device_put(
            np.concatenate(fps_parts, axis=2),
            NamedSharding(mesh, P(None, None, axis)),
        )
        self._sorted_ids = jax.device_put(
            np.concatenate(ids_parts, axis=1),
            NamedSharding(mesh, P(None, axis)),
        )
        self._query_fns = {}

    # -------------------------------------------------------------- queries

    def _make_query_fn(self, k_out: int, rank: str):
        mesh, axis = self.mesh, self.shard_axis
        l, k_prefix, cap = self.l, self.k, self.cap
        pool = self.pool

        def body(sorted_fps, sorted_ids, db_sigs, q_sigs, n_real):
            local_n = db_sigs.shape[0]
            base = jax.lax.axis_index(axis) * local_n
            nv = jnp.clip(n_real - base, 0, local_n)
            ids, jac, lev, trunc = forest_ops.forest_query_fused(
                sorted_fps, sorted_ids, db_sigs, q_sigs,
                l, k_prefix, cap, k_out, n_valid=nv, rank=rank, pool=pool,
            )
            gids = jnp.where(ids >= 0, ids + base, -1)
            g_ids = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
            g_jac = jax.lax.all_gather(jac, axis, axis=1, tiled=True)
            g_lev = jax.lax.all_gather(lev, axis, axis=1, tiled=True)
            # cross-shard merge uses the SAME ranking key as forest_topk
            # (shard-disjoint global ids need no dedupe)
            if rank == "forest":
                score = jnp.where(
                    g_ids >= 0,
                    2.0 * g_lev.astype(jnp.float32) + g_jac,
                    -1.0,
                )
            else:
                score = jnp.where(g_ids >= 0, g_jac, -1.0)
            top_sc, pos = jax.lax.top_k(score, k_out)
            top_ids = jnp.take_along_axis(g_ids, pos, axis=1)
            top_ids = jnp.where(top_sc >= 0, top_ids, -1)
            top_jac = jnp.take_along_axis(g_jac, pos, axis=1)
            top_lev = jnp.take_along_axis(g_lev, pos, axis=1)
            return top_ids, top_jac, top_lev, jax.lax.psum(trunc, axis)

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(None, None, axis), P(None, axis), P(axis, None),
                          P(None, None), P()),
                out_specs=(P(None, None), P(None, None), P(None, None), P()),
                check_vma=False,
            )
        )

    def _make_scan_fn(self, k_out: int):
        """Exact top-k: each shard STREAMS its slice of the signature
        table (``lsh_ops.topk_scan`` — sequential HBM reads, recall 1.0
        over stored sketches) and only ``k_out`` candidates per shard
        ride the all_gather; the forest analogue of
        ``ShardedMinHashLSH._make_topk_scan_fn`` (same collective
        shape). Ordering is pure estimated Jaccard — the scan route of
        :class:`~datasketch_tpu.models.tpu_forest.TpuMinHashLSHForest`.
        """
        from datasketch_tpu.ops import lsh_ops

        mesh, axis = self.mesh, self.shard_axis

        def body(db_sigs, q_sigs, n_real):
            local_n = db_sigs.shape[0]
            base = jax.lax.axis_index(axis) * local_n
            nv = jnp.clip(n_real - base, 0, local_n)
            loc_ids, loc_sc = lsh_ops.topk_scan(
                db_sigs, q_sigs, k_out, n_valid=nv
            )
            gids = jnp.where(loc_ids >= 0, loc_ids + base, -1)
            g_ids = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
            g_sc = jax.lax.all_gather(loc_sc, axis, axis=1, tiled=True)
            score = jnp.where(g_ids >= 0, g_sc, -1.0)
            top_sc, pos = jax.lax.top_k(score, k_out)
            top_ids = jnp.take_along_axis(g_ids, pos, axis=1)
            top_ids = jnp.where(top_sc >= 0, top_ids, -1)
            return top_ids, top_sc, n_real * 0  # scan never truncates

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axis, None), P(None, None), P()),
                out_specs=(P(None, None), P(None, None), P()),
                check_vma=False,
            )
        )

    def _resolve_method(self, method: str, rank: str, q_pad: int) -> str:
        """'auto' resolution, per shard: the exact scan wins when each
        shard's slice is smaller than the walk's worst-case gather
        volume (same bytes-moved rule as the single-chip forest, with
        the table split ``n_shards`` ways); only for jaccard ranking —
        prefix-depth ordering is the reference contract of
        rank='forest'."""
        if method == "auto":
            if rank != "jaccard":
                return "forest"
            walk_slots = q_pad * self.l * self.k * self.cap
            local_n = int(self._sigs.shape[0]) // self.n_shards
            return "scan" if local_n <= walk_slots else "forest"
        return method

    def query(self, minhash, k: int, rank: Optional[str] = None,
              method: Optional[str] = None) -> list:
        """Top-k keys, ordered per the index's ``rank`` mode."""
        return self.query_batch([minhash], k, rank=rank, method=method)[0]

    def query_batch(self, minhashes, k: int, return_scores: bool = False,
                    rank: Optional[str] = None,
                    method: Optional[str] = None) -> list:
        """Top-k for a query batch: one sharded dispatch, one all_gather.
        ``rank`` overrides the ordering mode ('forest' | 'jaccard');
        ``method`` the serving route ('auto' | 'forest' | 'scan')."""
        out = self._query_dispatch(minhashes, k, rank=rank, method=method)
        if isinstance(out, list):
            return out
        return self._query_finish(out, k, return_scores)

    def query_stream(self, batches, k: int, return_scores: bool = False,
                     depth: int = 4, rank: Optional[str] = None,
                     method: Optional[str] = None):
        """Pipelined :meth:`query_batch` over an iterable of batches:
        ``depth`` batches in flight, eager async D2H copies (see
        :mod:`datasketch_tpu.utils.pipeline`). Keep batch sizes uniform."""
        from datasketch_tpu.utils.pipeline import stream_batches

        if k <= 0:
            raise ValueError("k must be positive")

        def _finish(out):
            if isinstance(out, list):
                return out
            return self._query_finish(out, k, return_scores)

        return stream_batches(
            batches,
            lambda b: self._query_dispatch(b, k, rank=rank, method=method),
            _finish, depth=depth,
        )

    def _query_dispatch(self, minhashes, k: int,
                        rank: Optional[str] = None,
                        method: Optional[str] = None):
        if k <= 0:
            raise ValueError("k must be positive")
        if rank is None:
            rank = self.rank
        if rank not in ("forest", "jaccard"):
            raise ValueError("rank must be 'forest' or 'jaccard'")
        if method is None:
            method = self.method
        if method not in ("auto", "forest", "scan"):
            raise ValueError("method must be 'auto', 'forest' or 'scan'")
        if self._sigs is None or not self._n_real:
            return [[] for _ in minhashes]
        q = _as_signature_matrix(minhashes)
        if q.shape[0] == 0:
            return []
        if q.shape[1] < self.score_width:
            raise ValueError("The num_perm of MinHash out of range")
        q = np.asarray(q)[:, : self.score_width]
        nq = q.shape[0]
        q_pad = 8
        while q_pad < nq:
            q_pad *= 2
        if q_pad != nq:
            q = np.pad(q, ((0, q_pad - nq), (0, 0)))
        k_out = max(8, 1 << (k - 1).bit_length())
        method = self._resolve_method(method, rank, q_pad)
        rep = NamedSharding(self.mesh, P(None, None))
        q_dev = jax.device_put(jnp.asarray(q), rep)
        if method == "scan":
            if (k_out, "scan") not in self._query_fns:
                self._query_fns[k_out, "scan"] = self._make_scan_fn(k_out)
            ids, jac, trunc = self._query_fns[k_out, "scan"](
                self._sigs, q_dev, self._n_real_dev
            )
            return ids, jac, trunc, nq
        if (k_out, rank) not in self._query_fns:
            self._query_fns[k_out, rank] = self._make_query_fn(k_out, rank)
        ids, jac, lev, trunc = self._query_fns[k_out, rank](
            self._sorted_fps,
            self._sorted_ids,
            self._sigs,
            q_dev,
            self._n_real_dev,
        )
        return ids, jac, trunc, nq

    def _query_finish(self, out, k: int, return_scores: bool) -> list:
        ids, jac, trunc, nq = out
        ids_h, jac_h, trunc_h = jax.device_get((ids, jac, trunc))
        self.last_truncated = int(trunc_h)
        result = []
        for row_ids, row_jac in zip(ids_h[:nq], jac_h[:nq]):
            hits = [
                (self._keys[int(i)], float(s))
                for i, s in zip(row_ids[:k], row_jac[:k])
                if i >= 0
            ]
            result.append(hits if return_scores else [kk for kk, _ in hits])
        return result

    def warmup(self, batch_sizes=(8, 64), k: int = 10) -> None:
        """Pay per-shape compiles before serving traffic; no-op while
        empty (parity with the single-chip forest)."""
        if self._sigs is None or not self._n_real:
            return
        rng = np.random.RandomState(0)
        for q in batch_sizes:
            sigs = rng.randint(
                0, 1 << 32, size=(int(q), self.score_width), dtype=np.uint64
            ).astype(np.uint32)
            self.query_batch(sigs, k)

    # ------------------------------------------------------------- plumbing

    def __contains__(self, key: Hashable) -> bool:
        return key in self._key_set

    def __len__(self) -> int:
        return len(self._keys)

    def is_empty(self) -> bool:
        return self._n_real == 0

    def status(self) -> dict:
        out = {
            "n_shards": self.n_shards,
            "n_indexed": len(self._keys),
            "n_padded": 0,
            "trees": self.l,
            "prefix_len": self.k,
            "cap": self.cap,
            "last_truncated": self.last_truncated,
            "device_bytes": 0,
        }
        if self._sigs is not None:
            out["n_padded"] = int(self._sigs.shape[0]) - self._n_real
            out["device_bytes"] = int(
                self._sigs.size * 4
                + self._sorted_fps.size * 4
                + self._sorted_ids.size * 4
            )
        return out

    # ---------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        """Persist signatures + keys as .npz; tables are re-lexsorted (and
        re-sharded to the loading mesh) on load. On a multi-process mesh
        this is a COLLECTIVE — call it from every process."""
        from datasketch_tpu.persist import atomic_savez, pack_keys

        sigs = (
            self._to_host(self._sigs)[: self._n_real]
            if self._sigs is not None
            else np.zeros((0, self.score_width), dtype=np.uint32)
        )
        atomic_savez(
            path,
            sigs=sigs,
            keys=pack_keys(self._keys),
            params=np.array(
                [self.num_perm, self.l, self.cap,
                 int(self.rank == "jaccard"),
                 self.cascade_perm or 0, self.pool,
                 ("auto", "forest", "scan").index(self.method)],
                dtype=np.int64,
            ),
        )

    @classmethod
    def load(cls, path: str, mesh: Mesh, shard_axis: str = "data",
             ) -> "ShardedMinHashLSHForest":
        """SECURITY: the key list inside the file is a pickle payload —
        only load index files you created or trust."""
        from datasketch_tpu.persist import npz_path, unpack_keys

        data = np.load(npz_path(path), allow_pickle=False)
        params = [int(x) for x in data["params"]]
        num_perm, l, cap = params[:3]
        rank = "jaccard" if len(params) > 3 and params[3] else "forest"
        cascade = params[4] if len(params) > 4 and params[4] else None
        pool = params[5] if len(params) > 5 else 0
        method = (
            ("auto", "forest", "scan")[params[6]]
            if len(params) > 6 else "auto"
        )
        forest = cls(mesh, num_perm=num_perm, l=l, cap=cap,
                     shard_axis=shard_axis, rank=rank,
                     cascade_perm=cascade, pool=pool, method=method)
        keys = unpack_keys(data["keys"])
        if keys:
            forest._keys = keys
            forest._key_set = set(keys)
            forest._build(data["sigs"])
        return forest

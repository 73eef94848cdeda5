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
        max_results: Optional[int] = None,
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
        self.max_results = max_results
        self.shard_axis = shard_axis
        self.n_shards = mesh.shape[shard_axis]

        self._keys: list = []
        self._key_to_pos: dict = {}
        self._sigs = None  # uint32[N_pad, P] sharded P(axis, None)
        self._sorted_fp = None  # uint32[b, N_pad] sharded P(None, axis)
        self._sorted_ids = None  # int32[b, N_pad] sharded P(None, axis)
        self._n_real = 0
        self._n_real_dev = None  # cached device scalar (uploads cost a tunnel RTT)
        self._alive = None  # bool[N_real] tombstones (False = removed)
        self._alive_dev = None  # cached replicated device mask [N_pad]
        self.last_truncated = 0
        self._query_fns: dict = {}  # max_out -> compiled threshold query
        self._query_scan_fns: dict = {}  # max_out -> compiled scan query
        self._topk_fns: dict = {}  # k -> compiled fused band top-k
        self._topk_scan_fns: dict = {}  # k -> compiled streaming-scan top-k

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
        seen = set()
        for k in keys:
            if k in self._key_to_pos or k in seen:
                raise ValueError("The given key already exists: %r" % (k,))
            seen.add(k)
        base = len(self._keys)
        for i, k in enumerate(keys):
            self._key_to_pos[k] = base + i
        self._keys.extend(keys)
        old_alive = self._alive
        if self._sigs is not None:
            if getattr(self._sigs, "is_fully_addressable", True):
                # concat ON DEVICE: the corpus never round-trips host
                sigs = jnp.concatenate(
                    [self._sigs[: self._n_real], jnp.asarray(sigs)], axis=0
                )
            else:
                # multi-process mesh: per-shard data lives in other
                # processes; collect once, rebuild re-shards
                sigs = np.concatenate(
                    [self._to_host(self._sigs)[: self._n_real],
                     np.asarray(sigs)], axis=0
                )
        self._build(sigs)
        self._alive = np.ones(self._n_real, dtype=bool)
        if old_alive is not None:
            self._alive[: old_alive.shape[0]] = old_alive
        self._alive_dev = None

    def index_tokens(self, keys: Sequence[Hashable], token_docs,
                     seed: int = 1, scheme: str = "permutation") -> None:
        """Bulk-build straight from PRE-TOKENIZED integer documents.

        Same contract as
        :meth:`datasketch_tpu.models.tpu_lsh.TpuMinHashLSH.index_tokens`:
        raw token ids are uploaded and hashed ON-CHIP (fmix32 fused into
        the signature kernel); signatures stay device-resident end to end
        (``out='device'``) before being re-sharded over the mesh. Query
        with sketches built at the same seed and ``hashfunc='device'``.
        """
        from datasketch_tpu.models.minhash import MinHash

        sigs = MinHash.bulk_signatures(
            token_docs, scheme=scheme, num_perm=self.h, seed=seed,
            hashfunc="device", out="device",
        )
        self.index(keys, sigs)

    def index_text(self, keys: Sequence[Hashable], texts, k: int = 9,
                   seed: int = 1) -> None:
        """Bulk-build from RAW TEXT via on-device k-shingling, sharded.

        Same contract as
        :meth:`datasketch_tpu.models.tpu_lsh.TpuMinHashLSH.index_text`:
        raw bytes upload (1 byte/char), VPU window hashing
        (:mod:`datasketch_tpu.ops.text_ops`), device-resident signatures
        re-sharded over the mesh. Query with
        ``MinHash.bulk_from_text(..., hashfunc='device')`` sketches at
        equal ``(k, seed)``.
        """
        if len(keys) != len(texts):
            raise ValueError("keys and texts must have equal length")
        from datasketch_tpu.models.minhash import MinHash

        sigs = MinHash.bulk_from_text(
            texts, k=k, num_perm=self.h, seed=seed, hashfunc="device",
            out="device",
        )
        self.index(keys, sigs)

    def _token_query_sigs(self, token_docs, seed: int):
        from datasketch_tpu.models.minhash import MinHash

        return MinHash.bulk_signatures(
            token_docs, num_perm=self.h, seed=seed, hashfunc="device",
            out="device",
        )

    def _text_query_sigs(self, texts, shingle_k: int, seed: int):
        from datasketch_tpu.models.minhash import MinHash

        return MinHash.bulk_from_text(
            texts, k=shingle_k, num_perm=self.h, seed=seed,
            hashfunc="device", out="device",
        )

    def query_tokens(self, token_docs, seed: int = 1, **kwargs) -> list:
        """Threshold-query straight from pre-tokenized integer documents
        (ids hashed ON-CHIP, signatures stay device-resident; ``seed``
        must match the indexed corpus); extra kwargs pass to
        :meth:`query_batch`."""
        return self.query_batch(self._token_query_sigs(token_docs, seed),
                                **kwargs)

    def top_k_tokens(self, token_docs, k: int, seed: int = 1,
                     **kwargs) -> list:
        """Top-k straight from pre-tokenized integer documents (see
        :meth:`query_tokens`); extra kwargs pass to :meth:`top_k`."""
        return self.top_k(self._token_query_sigs(token_docs, seed), k,
                          **kwargs)

    def query_text(self, texts, shingle_k: int = 9, seed: int = 1,
                   **kwargs) -> list:
        """Threshold-query straight from raw texts (shingles hashed
        ON-CHIP, signatures stay device-resident; ``(shingle_k, seed)``
        must match the indexed corpus); extra kwargs pass to
        :meth:`query_batch`."""
        return self.query_batch(
            self._text_query_sigs(texts, shingle_k, seed), **kwargs
        )

    def top_k_text(self, texts, k: int, shingle_k: int = 9, seed: int = 1,
                   **kwargs) -> list:
        """Top-k straight from raw texts (see :meth:`query_text`);
        extra kwargs pass to :meth:`top_k`."""
        return self.top_k(self._text_query_sigs(texts, shingle_k, seed),
                          k, **kwargs)

    def _build(self, sigs) -> None:
        mesh, axis = self.mesh, self.shard_axis
        n = sigs.shape[0]
        self._n_real = n
        self._n_real_dev = jnp.int32(n)
        # pad to a power-of-two multiple of the shard count: bounds the set
        # of compile shapes (remote-TPU compiles can take minutes for
        # unlucky sizes) and keeps shards equal
        n_pad = 128
        while n_pad < n:
            n_pad *= 2
        n_pad = -(-n_pad // self.n_shards) * self.n_shards
        if isinstance(sigs, np.ndarray):
            # chunked upload: a single-shot H2D of a multi-hundred-MB host
            # corpus rides the slow path (~6-12 MB/s through the tunnel)
            from datasketch_tpu.ops.transfer import device_upload

            sigs = device_upload(np.ascontiguousarray(sigs, dtype=np.uint32))
        pad = n_pad - n
        if pad:
            # Pseudo-random filler spreads across buckets; padded ids are
            # masked out at query time (gid >= n_real -> -1).
            rng = np.random.RandomState(n_pad & 0x7FFFFFFF)
            filler = rng.randint(
                0, 1 << 32, size=(pad, self.h), dtype=np.uint64
            ).astype(np.uint32)
            sigs = jnp.concatenate([jnp.asarray(sigs), jnp.asarray(filler)])
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
        self._query_fns = {}  # shapes changed; retrace lazily
        self._query_scan_fns = {}
        self._topk_fns = {}
        self._topk_scan_fns = {}

    # ----------------------------------------------------------- mutation

    def remove(self, key: Hashable) -> None:
        """Tombstone `key`: masked from every query, space reclaimed by
        :meth:`compact` (mirrors ``TpuMinHashLSH.remove``)."""
        if key not in self._key_to_pos:
            raise ValueError("The given key does not exist")
        pos = self._key_to_pos.pop(key)
        self._alive[pos] = False
        self._keys[pos] = None
        self._alive_dev = None

    def merge(self, other, check_overlap: bool = False) -> None:
        """Union another sharded (or TpuMinHashLSH) index into this one:
        device-side concat of both corpora, one re-shard/rebuild. The mesh
        analogue of ``MinHashLSH.merge`` (SURVEY §2.4: merge -> re-shard)."""
        if (self.h, self.b, self.r) != (other.h, other.b, other.r):
            raise ValueError(
                "Cannot merge indexes with different initialization "
                "parameters."
            )
        # A TpuMinHashLSH may hold buffered inserts whose rows are not in
        # _sigs_dev yet; merging without flushing would register their keys
        # with no signature rows (corrupt index, out-of-range removes).
        flush = getattr(other, "_flush_pending", None)
        if flush is not None:
            flush()
        other_keys = getattr(other, "_keys")
        if check_overlap and set(self._key_to_pos) & {
            k for k in other_keys if k is not None
        }:
            raise ValueError("The keys are overlapping, duplicate key exists.")
        other_sigs = getattr(other, "_sigs", None)
        if other_sigs is None:
            other_sigs = getattr(other, "_sigs_dev", None)
        other_n = getattr(other, "_n_real", 0)
        if other_sigs is None or not other_n:
            return
        base = len(self._keys)
        for i, k in enumerate(other_keys):
            if k is not None:
                self._key_to_pos[k] = base + i
        self._keys.extend(other_keys)
        old_alive, other_alive = self._alive, getattr(other, "_alive", None)
        if self._sigs is None:
            merged = other_sigs[:other_n]
        elif getattr(self._sigs, "is_fully_addressable", True) and getattr(
            other_sigs, "is_fully_addressable", True
        ):
            merged = jnp.concatenate(
                [self._sigs[: self._n_real], other_sigs[:other_n]], axis=0
            )
        else:
            fetch_other = getattr(other, "_to_host", np.asarray)
            merged = np.concatenate(
                [self._to_host(self._sigs)[: self._n_real],
                 fetch_other(other_sigs)[:other_n]], axis=0
            )
        n_self = 0 if old_alive is None else old_alive.shape[0]
        self._build(merged)
        self._alive = np.ones(self._n_real, dtype=bool)
        if old_alive is not None:
            self._alive[:n_self] = old_alive
        if other_alive is not None:
            self._alive[n_self : n_self + other_alive.shape[0]] = other_alive
        self._alive_dev = None

    def status(self) -> dict:
        """Operational health counters: shard layout, live/tombstoned rows,
        bucket occupancy vs ``bucket_cap``, device memory footprint."""
        n_live = len(self._key_to_pos)
        out = {
            "n_shards": self.n_shards,
            "n_live": n_live,
            "n_tombstoned": self._n_real - n_live,
            "n_padded": 0,
            "rows_per_shard": 0,
            "bands": self.b,
            "rows_per_band": self.r,
            "bucket_cap": self.bucket_cap,
            "last_truncated": self.last_truncated,
            "device_bytes": 0,
            "max_bucket": 0,
        }
        if self._sigs is not None:
            n_pad = int(self._sigs.shape[0])
            out["n_padded"] = n_pad - self._n_real
            out["rows_per_shard"] = n_pad // self.n_shards
            out["device_bytes"] = int(
                self._sigs.size * 4
                + self._sorted_fp.size * 4
                + self._sorted_ids.size * 4
            )
            # each shard's table is sorted independently: compute run
            # stats per (band, shard) block so runs never appear to span
            # shard boundaries
            fp = self._to_host(self._sorted_fp).reshape(
                self.b * self.n_shards, -1
            )
            max_run, _ = lsh_ops.bucket_stats(jnp.asarray(fp))
            out["max_bucket"] = int(np.asarray(max_run).max())
        return out

    def compact(self) -> None:
        """Drop tombstoned rows and rebuild the shard tables (device-side
        gather; the surviving corpus never leaves the mesh)."""
        if self._sigs is None or self._alive is None or self._alive.all():
            return
        live = np.nonzero(self._alive)[0]
        if getattr(self._sigs, "is_fully_addressable", True):
            sigs = jnp.take(self._sigs, jnp.asarray(live), axis=0)
        else:
            sigs = self._to_host(self._sigs)[live]
        self._keys = [self._keys[i] for i in live]
        self._key_to_pos = {k: i for i, k in enumerate(self._keys)}
        self._build(sigs)
        self._alive = np.ones(self._n_real, dtype=bool)
        self._alive_dev = None

    # -------------------------------------------------------- persistence

    def _to_host(self, arr) -> np.ndarray:
        """Full host copy, multi-process safe; COLLECTIVE on a
        multi-process mesh (see :func:`~datasketch_tpu.parallel.mesh.
        fetch_global` for the ordering rule)."""
        from datasketch_tpu.parallel.mesh import fetch_global

        return fetch_global(arr, self.mesh)

    def host_snapshot(self) -> dict:
        """Host-side copy of the queryable state (``{"keys", "sigs",
        "alive"}``) — one cross-shard gather; feeds
        :class:`datasketch_tpu.serving.FailoverIndex` so a sharded
        deployment can keep answering from the host when the mesh is
        unhealthy."""
        sigs = (
            self._to_host(self._sigs)[: self._n_real]
            if self._sigs is not None
            else np.zeros((0, self.h), np.uint32)
        )
        alive = None
        if self._alive is not None and not bool(self._alive.all()):
            alive = self._alive.copy()
        return {"keys": list(self._keys), "sigs": sigs, "alive": alive}

    def save(self, path: str) -> None:
        """Persist signatures/keys/tombstones as .npz; shard tables are
        rebuilt (and re-sharded to the loading mesh) on load."""
        sigs = (
            self._to_host(self._sigs)[: self._n_real]
            if self._sigs is not None
            else np.zeros((0, self.h), dtype=np.uint32)
        )
        from datasketch_tpu.persist import atomic_savez, pack_keys

        atomic_savez(
            path,
            sigs=sigs,
            keys=pack_keys(self._keys),
            alive=self._alive
            if self._alive is not None
            else np.ones(0, dtype=bool),
            params=np.array(
                [self.h, self.b, self.r, self.bucket_cap, int(self.rerank)],
                dtype=np.int64,
            ),
            threshold=np.float64(self.threshold),
        )

    @classmethod
    def load(cls, path: str, mesh: Mesh, shard_axis: str = "data",
             ) -> "ShardedMinHashLSH":
        """Rebuild on `mesh` — the shard count may differ from the saving
        mesh; tables are re-derived from the signatures."""
        from datasketch_tpu.persist import npz_path, unpack_keys

        data = np.load(npz_path(path), allow_pickle=False)
        h, b, r, cap, rerank = (int(x) for x in data["params"])
        index = cls(
            mesh,
            threshold=float(data["threshold"]),
            num_perm=h,
            params=(b, r),
            bucket_cap=cap,
            rerank=bool(rerank),
            shard_axis=shard_axis,
        )
        keys = unpack_keys(data["keys"])
        if keys:
            index._keys = keys
            index._key_to_pos = {
                k: i for i, k in enumerate(keys) if k is not None
            }
            index._build(data["sigs"])
            index._alive = data["alive"].astype(bool)
        return index

    # ------------------------------------------------------------------ query

    def __contains__(self, key: Hashable) -> bool:
        return key in self._key_to_pos

    def __len__(self) -> int:
        return len(self._key_to_pos)

    def is_empty(self) -> bool:
        return len(self._key_to_pos) == 0

    def _alive_mask_dev(self):
        """Replicated bool[N_pad] mask (True = queryable), cached until a
        remove/compact/index invalidates it."""
        if self._alive_dev is None or (
            self._alive_dev.shape[0] != self._sigs.shape[0]
        ):
            mask = np.zeros(self._sigs.shape[0], dtype=bool)
            if self._alive is not None:
                mask[: self._n_real] = self._alive
            else:
                mask[: self._n_real] = True
            self._alive_dev = jax.device_put(
                jnp.asarray(mask), NamedSharding(self.mesh, P(None))
            )
        return self._alive_dev

    def _local_candidates(self, sorted_fp, sorted_ids, db_sigs, q_sigs,
                          n_real, alive):
        """Shard-local probe + rerank; returns GLOBAL ids (dead/padded
        masked to -1) and scores. Runs inside shard_map."""
        axis = self.shard_axis
        q_fps = lsh_ops.band_fingerprints(q_sigs, self.b, self.r)
        ids, trunc = lsh_ops.query_tables(
            sorted_fp, sorted_ids, q_fps, cap=self.bucket_cap
        )
        nq = q_sigs.shape[0]
        flat = ids.reshape(nq, -1)  # local ids within this shard
        scores = lsh_ops.rerank_jaccard(db_sigs, q_sigs, flat)
        shard = jax.lax.axis_index(axis)
        gid = jnp.where(flat >= 0, flat + shard * db_sigs.shape[0], -1)
        gid = jnp.where(gid < n_real, gid, -1)
        ok = alive[jnp.where(gid >= 0, gid, 0)]
        gid = jnp.where((gid >= 0) & ok, gid, -1)
        return gid, scores, trunc

    def _make_query_fn(self, max_out: int):
        """Threshold query with a DEVICE-side finish: each shard dedupes,
        threshold-filters, and compacts its candidates on-chip
        (lsh_ops.threshold_select), so only ``max_out`` slots per shard
        ride the all_gather and the host does boolean indexing only (a
        per-query np.unique loop would cap batched threshold q/s)."""
        mesh, axis = self.mesh, self.shard_axis

        def qbody(sorted_fp, sorted_ids, db_sigs, q_sigs, n_real, alive,
                  cutoff):
            gid, scores, trunc = self._local_candidates(
                sorted_fp, sorted_ids, db_sigs, q_sigs, n_real, alive
            )
            sel_ids, sel_sc, n_match = lsh_ops.threshold_select(
                scores, gid, cutoff, max_out
            )
            over = jnp.sum(jnp.maximum(n_match - max_out, 0))
            g_ids = jax.lax.all_gather(sel_ids, axis, axis=1, tiled=True)
            g_sc = jax.lax.all_gather(sel_sc, axis, axis=1, tiled=True)
            # global ids are disjoint across shards (no cross-shard dupes);
            # one score-desc sort orders the gathered pool
            order = jnp.argsort(-g_sc, axis=1)
            g_ids = jnp.take_along_axis(g_ids, order, axis=1)
            g_sc = jnp.take_along_axis(g_sc, order, axis=1)
            return g_ids, g_sc, jax.lax.psum(trunc + over, axis)

        return jax.jit(
            jax.shard_map(
                qbody,
                mesh=mesh,
                in_specs=(P(None, axis), P(None, axis), P(axis, None),
                          P(None, None), P(), P(None), P()),
                out_specs=(P(None, None), P(None, None), P()),
                # all_gather/psum outputs are device-invariant; jax's
                # varying-manual-axes inference can't always prove it.
                check_vma=False,
            )
        )

    def _make_query_scan_fn(self, max_out: int):
        """Threshold query by exact per-shard streaming scan: every
        shard scores its whole signature slice (recall 1.0 over stored
        sketches), keeps its ``max_out`` best >= cutoff, and only those
        ride the all_gather; the final score-desc order runs replicated.
        Match counts are summed so overflow past the cap is reported."""
        mesh, axis = self.mesh, self.shard_axis

        def body(db_sigs, q_sigs, n_real, alive, cutoff):
            local_n = db_sigs.shape[0]
            base = jax.lax.axis_index(axis) * local_n
            local_alive = jax.lax.dynamic_slice_in_dim(alive, base, local_n)
            nv = jnp.clip(n_real - base, 0, local_n)
            ids, sc, cnt = lsh_ops.topk_scan(
                db_sigs, q_sigs, max_out, n_valid=nv, alive=local_alive,
                count_ge=cutoff,
            )
            over = jnp.sum(jnp.maximum(cnt - max_out, 0))
            gids = jnp.where(ids >= 0, ids + base, -1)
            g_ids = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
            g_sc = jax.lax.all_gather(sc, axis, axis=1, tiled=True)
            order = jnp.argsort(-g_sc, axis=1)
            g_ids = jnp.take_along_axis(g_ids, order, axis=1)
            g_sc = jnp.take_along_axis(g_sc, order, axis=1)
            return g_ids, g_sc, jax.lax.psum(over, axis)

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axis, None), P(None, None), P(), P(None), P()),
                out_specs=(P(None, None), P(None, None), P()),
                check_vma=False,
            )
        )

    def _make_topk_fn(self, k: int):
        """Fused top-k: each shard dedupes + top-k's LOCALLY, only k
        candidates per shard ride the all_gather (vs b*cap for the full
        query path), and the final cross-shard top-k runs replicated."""
        mesh, axis = self.mesh, self.shard_axis

        def tkbody(sorted_fp, sorted_ids, db_sigs, q_sigs, n_real, alive):
            gid, scores, trunc = self._local_candidates(
                sorted_fp, sorted_ids, db_sigs, q_sigs, n_real, alive
            )
            loc_ids, loc_sc = lsh_ops.topk_candidates(
                scores, gid, k, max_dup=self.b
            )
            g_ids = jax.lax.all_gather(loc_ids, axis, axis=1, tiled=True)
            g_sc = jax.lax.all_gather(loc_sc, axis, axis=1, tiled=True)
            # global ids are disjoint across shards: no cross-shard dupes,
            # a plain top_k over the gathered pool suffices
            top_sc, pos = jax.lax.top_k(g_sc, k)
            top_ids = jnp.take_along_axis(g_ids, pos, axis=1)
            top_ids = jnp.where(top_sc >= 0, top_ids, -1)
            return top_ids, top_sc, jax.lax.psum(trunc, axis)

        return jax.jit(
            jax.shard_map(
                tkbody,
                mesh=mesh,
                in_specs=(P(None, axis), P(None, axis), P(axis, None),
                          P(None, None), P(), P(None)),
                out_specs=(P(None, None), P(None, None), P()),
                check_vma=False,
            )
        )

    def _make_topk_scan_fn(self, k: int):
        """Exact top-k: each shard STREAMS its slice of the signature
        table (lsh_ops.topk_scan — sequential HBM reads, recall 1.0 over
        stored sketches) and only k candidates per shard ride the
        all_gather. Wins over band probing whenever the local slice is
        smaller than the Q*b*cap gather budget; the crossover scales
        with the shard count."""
        mesh, axis = self.mesh, self.shard_axis

        def body(db_sigs, q_sigs, n_real, alive):
            local_n = db_sigs.shape[0]
            base = jax.lax.axis_index(axis) * local_n
            local_alive = jax.lax.dynamic_slice_in_dim(alive, base, local_n)
            nv = jnp.clip(n_real - base, 0, local_n)
            loc_ids, loc_sc = lsh_ops.topk_scan(
                db_sigs, q_sigs, k, n_valid=nv, alive=local_alive
            )
            gids = jnp.where(loc_ids >= 0, loc_ids + base, -1)
            g_ids = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
            g_sc = jax.lax.all_gather(loc_sc, axis, axis=1, tiled=True)
            top_sc, pos = jax.lax.top_k(g_sc, k)
            top_ids = jnp.take_along_axis(g_ids, pos, axis=1)
            top_ids = jnp.where(top_sc >= 0, top_ids, -1)
            return top_ids, top_sc, n_real * 0  # scan never truncates

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axis, None), P(None, None), P(), P(None)),
                out_specs=(P(None, None), P(None, None), P()),
                check_vma=False,
            )
        )

    def warmup(self, batch_sizes=(8, 64), k: int = 10,
               method: str = "auto") -> None:
        """Pay per-shape compiles before serving traffic (the sharded
        twin of ``TpuMinHashLSH.warmup``): one synthetic ``top_k`` and
        one ``query_batch`` per batch size, results discarded. No-op on
        an empty index."""
        if self._sigs is None or not self._n_real:
            return
        rng = np.random.RandomState(0)
        for q in batch_sizes:
            sigs = rng.randint(
                0, 1 << 32, size=(int(q), self.h), dtype=np.uint64
            ).astype(np.uint32)
            self.top_k(sigs, k, method=method)
            self.query_batch(sigs, method=method)

    def query(self, minhash, threshold: Optional[float] = None) -> list:
        return self.query_batch([minhash], threshold=threshold)[0]

    def query_batch(
        self,
        minhashes,
        threshold: Optional[float] = None,
        return_scores: bool = False,
        rerank: Optional[bool] = None,
        method: str = "auto",
    ) -> list:
        """Batched query across all shards; one all_gather per call.

        method: ``'bands'`` probes each shard's band tables;
        ``'scan'`` streams each shard's signature slice — returns EVERY
        key whose estimated Jaccard clears the threshold (recall 1.0
        over stored sketches, up to ``max_results``/1024 per shard;
        requires rerank); ``'auto'`` picks scan when the per-shard slice
        is under the gather budget (same rule as :meth:`top_k`).
        """
        if method not in ("auto", "bands", "scan"):
            raise ValueError("method must be 'auto', 'bands' or 'scan'")
        do_rerank = self.rerank if rerank is None else rerank
        if self._sigs is None or not self._n_real:
            return [[] for _ in minhashes]
        q_sigs = _as_signature_matrix(minhashes)
        if q_sigs.shape[1] != self.h:
            raise ValueError(
                "Expecting minhash with length %d, got %d" % (self.h, q_sigs.shape[1])
            )
        local_rows = self._sigs.shape[0] // max(1, self.n_shards)
        if method == "auto":
            gather_slots = q_sigs.shape[0] * self.b * self.bucket_cap
            method = (
                "scan"
                if do_rerank and local_rows <= gather_slots
                else "bands"
            )
        cutoff = self.threshold if threshold is None else threshold
        rep = NamedSharding(self.mesh, P(None, None))
        if method == "scan":
            if not do_rerank:
                raise ValueError(
                    "method='scan' requires rerank (it scores every "
                    "stored signature)"
                )
            max_out = min(self.max_results or 1024, local_rows)
            if max_out not in self._query_scan_fns:
                self._query_scan_fns[max_out] = self._make_query_scan_fn(
                    max_out
                )
            ids, scores, trunc = self._query_scan_fns[max_out](
                self._sigs,
                jax.device_put(jnp.asarray(q_sigs), rep),
                self._n_real_dev,
                self._alive_mask_dev(),
                jnp.float32(cutoff),
            )
            ids_host, sc_host, trunc_h = jax.device_get(
                (ids, scores, trunc)
            )
            self.last_truncated = int(trunc_h)
            from datasketch_tpu.models.tpu_lsh import _decode_rows

            return _decode_rows(
                ids_host, sc_host, self._keys, q_sigs.shape[0],
                return_scores,
            )
        c_local = self.b * self.bucket_cap
        max_out = (
            c_local
            if self.max_results is None
            else min(self.max_results, c_local)
        )
        if max_out not in self._query_fns:
            self._query_fns[max_out] = self._make_query_fn(max_out)
        cut = float(cutoff) if do_rerank else -1.0
        ids, scores, trunc = self._query_fns[max_out](
            self._sorted_fp,
            self._sorted_ids,
            self._sigs,
            jax.device_put(jnp.asarray(q_sigs), rep),
            self._n_real_dev,
            self._alive_mask_dev(),
            jnp.float32(cut),
        )
        ids_host, sc_host, trunc_h = jax.device_get((ids, scores, trunc))
        self.last_truncated = int(trunc_h)
        from datasketch_tpu.models.tpu_lsh import _decode_rows

        return _decode_rows(
            ids_host, sc_host, self._keys, q_sigs.shape[0], return_scores
        )

    def top_k(self, minhashes, k: int, return_scores: bool = True,
              method: str = "auto") -> list:
        """Top-k (key, score) per query: per-shard candidate generation,
        then one k-wide all_gather — candidate traffic over ICI is k per
        shard either way.

        method: ``'bands'`` probes the shard's band tables; ``'scan'``
        streams the shard's whole signature slice (exact over stored
        sketches); ``'auto'`` picks scan when the per-shard slice is
        below the Q*b*cap gather budget."""
        out = self._top_k_dispatch(minhashes, k, method)
        if isinstance(out, list):
            return out
        return self._top_k_finish(out, return_scores)

    def top_k_stream(self, batches, k: int, return_scores: bool = True,
                     depth: int = 4, method: str = "auto"):
        """Pipelined :meth:`top_k` over an iterable of query batches —
        ``depth`` batches in flight, eager async D2H copies (see
        :mod:`datasketch_tpu.utils.pipeline`). Keep batch sizes uniform."""
        from datasketch_tpu.utils.pipeline import stream_batches

        def _finish(out):
            if isinstance(out, list):
                return out
            return self._top_k_finish(out, return_scores)

        return stream_batches(
            batches, lambda b: self._top_k_dispatch(b, k, method), _finish,
            depth=depth,
        )

    def _top_k_dispatch(self, minhashes, k: int, method: str = "auto"):
        if method not in ("auto", "bands", "scan"):
            raise ValueError("method must be 'auto', 'bands' or 'scan'")
        if self._sigs is None or not self._n_real:
            return [[] for _ in minhashes]
        q_sigs = _as_signature_matrix(minhashes)
        if q_sigs.shape[1] != self.h:
            raise ValueError(
                "Expecting minhash with length %d, got %d"
                % (self.h, q_sigs.shape[1])
            )
        if method == "auto":
            n_shards = self.mesh.shape[self.shard_axis]
            local_rows = self._sigs.shape[0] // max(1, n_shards)
            gather_slots = q_sigs.shape[0] * self.b * self.bucket_cap
            method = "scan" if local_rows <= gather_slots else "bands"
        fns = self._topk_scan_fns if method == "scan" else self._topk_fns
        if k not in fns:
            fns[k] = (
                self._make_topk_scan_fn(k)
                if method == "scan"
                else self._make_topk_fn(k)
            )
        rep = NamedSharding(self.mesh, P(None, None))
        q_dev = jax.device_put(jnp.asarray(q_sigs), rep)
        if method == "scan":
            return fns[k](
                self._sigs, q_dev, self._n_real_dev, self._alive_mask_dev()
            )
        return fns[k](
            self._sorted_fp,
            self._sorted_ids,
            self._sigs,
            q_dev,
            self._n_real_dev,
            self._alive_mask_dev(),
        )

    def _top_k_finish(self, out, return_scores: bool) -> list:
        ids, scores, trunc = out
        ids_host, sc_host, trunc_h = jax.device_get((ids, scores, trunc))
        self.last_truncated = int(trunc_h)
        result = []
        for row_ids, row_sc in zip(ids_host, sc_host):
            hits = [
                (self._keys[int(p)], float(s))
                for p, s in zip(row_ids, row_sc)
                if p >= 0
            ]
            result.append(hits if return_scores else [kk for kk, _ in hits])
        return result

"""TpuMinHashLSHForest — device-resident LSH Forest for top-k queries.

Product surface over :mod:`datasketch_tpu.ops.forest_ops`, mirroring the
reference forest's two-phase add/index lifecycle and top-k query semantics
(``/root/reference/datasketch/lshforest.py:9-128``) with the whole query
path fused into one device dispatch. Accepts MinHash / WeightedMinHash
objects or raw signature matrices, like :class:`TpuMinHashLSH`.
"""

from __future__ import annotations

import functools
from typing import Hashable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from datasketch_tpu.models.tpu_lsh import _as_signature_matrix
from datasketch_tpu.ops import forest_ops

__all__ = ["TpuMinHashLSHForest"]

_JAC_FX = 1 << 20  # fixed-point scale for packing jaccard into int32


@functools.partial(
    jax.jit, static_argnames=("l", "k_prefix", "cap", "k_out", "rank",
                              "pool")
)
def _fused_packed(sorted_fps, sorted_ids, db_sigs, q_sigs, l, k_prefix,
                  cap, k_out, n_valid, rank, pool):
    """Fused query with ALL outputs packed into one int32 buffer.

    One device buffer means one host fetch; through the remote-TPU tunnel
    every extra buffer fetch costs a ~30ms round trip. Planes: 0 = ids,
    1 = jaccard fixed-point, 2 = matched level, 3 = truncation count.
    """
    ids, jac, lev, trunc = forest_ops.forest_query_fused(
        sorted_fps, sorted_ids, db_sigs, q_sigs, l, k_prefix, cap, k_out,
        n_valid=n_valid, rank=rank, pool=pool,
    )
    jac_fx = jnp.round(jac * _JAC_FX).astype(jnp.int32)
    tr = jnp.broadcast_to(trunc.astype(jnp.int32), ids.shape)
    return jnp.stack([ids, jac_fx, lev, tr], axis=1)  # [Q, 4, k_out]


@functools.partial(jax.jit, static_argnames=("k_out",))
def _scan_packed(db_sigs, q_sigs, k_out, n_valid):
    """Exact fused-scan top-k packed into the same [Q, 4, k_out] buffer
    layout as :func:`_fused_packed` (level plane 0, truncation 0 — the
    scan touches every row, nothing to cap)."""
    from datasketch_tpu.ops import lsh_ops

    ids, sc = lsh_ops.topk_scan(db_sigs, q_sigs, k_out, n_valid=n_valid)
    jac_fx = jnp.round(sc * _JAC_FX).astype(jnp.int32)
    z = jnp.zeros_like(ids)
    return jnp.stack([ids, jac_fx, z, z], axis=1)


class TpuMinHashLSHForest:
    """Top-k Jaccard index with prefix-tree semantics, resident on device.

    Args:
        num_perm: Signature length of indexed sketches.
        l: Number of prefix trees; each consumes ``k = num_perm // l``
            signature slots (reference parameterization).
        cap: Max rows gathered per (query, tree, prefix level); truncation
            is reported via :attr:`last_truncated`, never silent.
        rank: Result ordering. ``'forest'`` (default) = reference
            semantics: longest matching prefix first, estimated Jaccard
            as tiebreak. ``'jaccard'`` = pure estimated-Jaccard ordering
            of the same candidate pool — the rerank the reference docs
            recommend users add by hand, fused; measurably better
            recall-vs-exact-top-k at equal q/s (the candidate walk is
            identical). Per-query override via ``query_batch(rank=...)``.
        cascade_perm: Optional signature cascade (same trick as
            ``TpuMinHashLSH``): prefix trees keep using the first
            ``num_perm`` slots, but indexed/query sketches must carry
            ``cascade_perm`` slots and the Jaccard rerank scores over
            ALL of them — a lower-variance estimate that lifts top-k
            recall for pure HBM (no extra probes). Signatures are
            prefix-stable (``init_permutations`` draws interleaved), so
            a ``cascade_perm``-wide sketch's first ``num_perm`` slots
            are bit-identical to a plain one's.
        pool: Rerank pool size (0 = per-rank default, see
            :func:`datasketch_tpu.ops.forest_ops.forest_topk`). The pool
            is picked by prefix DEPTH, and depth ties are arbitrary —
            once more candidates tie at the deepest levels than fit
            (big corpora, wide ``cap``), true neighbours get displaced;
            widening the pool fixes it for only extra rerank gathers.
            Measured on the 16k-set protocol: pool 512 + cascade 256 =
            recall@10 0.855 -> 0.902 at ~equal q/s (saturates ~0.905 —
            beyond that the prefix walk itself is the ceiling).
    """

    def __init__(self, num_perm: int = 128, l: int = 8, cap: int = 64,
                 rank: str = "forest", cascade_perm: Optional[int] = None,
                 pool: int = 0, method: str = "auto"):
        if l <= 0 or num_perm <= 0:
            raise ValueError("num_perm and l must be positive")
        if l > num_perm:
            raise ValueError("l cannot be greater than num_perm")
        if rank not in ("forest", "jaccard"):
            raise ValueError("rank must be 'forest' or 'jaccard'")
        if method not in ("auto", "forest", "scan"):
            raise ValueError("method must be 'auto', 'forest' or 'scan'")
        self.rank = rank
        # 'forest' = prefix-tree walk (reference semantics); 'scan' =
        # exact fused top-k over every stored signature (recall 1.0 by
        # construction, jaccard-ranked); 'auto' = scan whenever rank is
        # 'jaccard' AND the corpus is smaller than the walk's worst-case
        # gather volume (q_pad * l * k_prefix * cap slots — the
        # bytes-moved rule of TpuMinHashLSH.top_k). rank='forest' always
        # walks: prefix-depth ordering is the reference contract and the
        # scan cannot reproduce it.
        self.method = method
        self.l = l
        self.k = int(num_perm / l)
        self.num_perm = num_perm
        # Effective signature width. The reference accepts any minhash of
        # length >= k*l and reads only the first k*l values
        # (lshforest.py:46-66); when num_perm % l != 0 that is SHORTER
        # than num_perm, so storing num_perm-wide rows would crash on
        # reference-valid input. All rows/queries are sliced to width.
        self.width = self.k * self.l
        if cascade_perm is not None and cascade_perm < self.width:
            raise ValueError("cascade_perm must be >= the prefix width k*l")
        self.cascade_perm = cascade_perm
        # rows are stored (and Jaccard-scored) at score_width; prefix
        # trees read only the first k*l slots
        self.score_width = cascade_perm if cascade_perm else self.width
        if pool < 0:
            raise ValueError("pool must be >= 0")
        self.pool = pool  # 0 = per-rank default (forest_ops.forest_topk)
        self.cap = cap
        self._keys: list = []  # position -> user key (indexed rows)
        self._key_set: set = set()
        self._pending: list = []  # (key, sig row) staged by add()
        self._sigs_dev = None  # uint32[N_pad, P]
        self._sorted_fps = None  # uint32[l, k, N_pad]
        self._sorted_ids = None  # int32[l, N_pad]
        self._n_real = 0
        self._n_real_dev = None  # cached device scalar (uploads cost a tunnel RTT)
        self.last_truncated = 0

    # ------------------------------------------------------------- building

    def add(self, key: Hashable, minhash) -> None:
        """Stage (key, minhash); searchable after the next :meth:`index`."""
        row = _as_signature_matrix([minhash])[0]
        if row.shape[0] < self.score_width:
            raise ValueError("The num_perm of MinHash out of range")
        if key in self._key_set:
            raise ValueError("The given key has already been added")
        self._key_set.add(key)
        self._pending.append((key, row[: self.score_width]))

    def index(self, keys: Optional[Sequence[Hashable]] = None,
              minhashes=None) -> None:
        """Make staged keys searchable; optionally bulk-add first.

        ``index()`` matches the reference lifecycle;
        ``index(keys, minhashes)`` is the device-native bulk build (one
        multi-key sort per tree for the whole corpus).
        """
        if (keys is None) != (minhashes is None):
            raise ValueError("provide both keys and minhashes, or neither")
        if keys is not None:
            keys = list(keys)
            sigs = _as_signature_matrix(minhashes)
            if isinstance(sigs, jax.Array):
                # device batches (e.g. WeightedMinHashGenerator
                # .minhash_many(out='device') kt pairs, already mixed to
                # slots on device by _as_signature_matrix): ONE compact
                # uint32[N, P] fetch — the prefix tables are built by
                # host lexsort, and per-row iteration below would
                # otherwise pay a tunnel round trip per row
                sigs = np.asarray(sigs)
            if sigs.shape[0] != len(keys):
                raise ValueError("keys and minhashes must have equal length")
            if sigs.shape[0] and sigs.shape[1] < self.score_width:
                raise ValueError("The num_perm of MinHash out of range")
            # validate the WHOLE batch before mutating _key_set: a
            # mid-batch duplicate must not poison the earlier keys
            seen = set()
            for k in keys:
                if k in self._key_set or k in seen:
                    raise ValueError("The given key has already been added")
                seen.add(k)
            self._key_set.update(seen)
            self._pending.extend(zip(keys, sigs[:, : self.score_width]))
        if not self._pending:
            return
        new_keys, new_rows = zip(*self._pending)
        self._pending = []
        tail = np.stack(new_rows).astype(np.uint32)
        self._finish_index(new_keys, tail)

    def index_tokens(self, keys: Sequence[Hashable], token_docs,
                     seed: int = 1, scheme: str = "permutation") -> None:
        """Bulk-build straight from PRE-TOKENIZED integer documents —
        ids hashed ON-CHIP; same contract as
        :meth:`datasketch_tpu.models.tpu_lsh.TpuMinHashLSH.index_tokens`.
        Query with ``hashfunc='device'`` sketches at equal seed."""
        if len(keys) != len(token_docs):
            raise ValueError("keys and token_docs must have equal length")
        from datasketch_tpu.models.minhash import MinHash

        sigs = MinHash.bulk_signatures(
            token_docs, scheme=scheme, num_perm=self.score_width, seed=seed,
            hashfunc="device",
        )
        self.index(list(keys), sigs)

    def index_text(self, keys: Sequence[Hashable], texts, k: int = 9,
                   seed: int = 1) -> None:
        """Bulk-build straight from RAW TEXT via on-device k-shingling —
        same contract as
        :meth:`datasketch_tpu.models.tpu_lsh.TpuMinHashLSH.index_text`.
        Query with ``MinHash.bulk_from_text(..., hashfunc='device')``
        sketches at equal ``(k, seed)``."""
        if len(keys) != len(texts):
            raise ValueError("keys and texts must have equal length")
        from datasketch_tpu.models.minhash import MinHash

        sigs = MinHash.bulk_from_text(
            texts, k=k, num_perm=self.score_width, seed=seed,
            hashfunc="device",
        )
        self.index(list(keys), sigs)

    def _finish_index(self, new_keys, tail) -> None:
        if self._sigs_dev is None:
            all_sigs = jnp.asarray(tail)
        else:
            all_sigs = jnp.concatenate(
                [self._sigs_dev[: self._n_real], jnp.asarray(tail)], axis=0
            )
        self._keys.extend(new_keys)
        self._rebuild(all_sigs)

    def _rebuild(self, all_sigs) -> None:
        # Pad rows to a power of two (>=128) to bound the set of compiled
        # shapes; filler rows get pseudo-random signatures so they spread
        # across prefix runs, and are masked from results via n_valid.
        n_real = all_sigs.shape[0]
        n_pad = 128
        while n_pad < n_real:
            n_pad *= 2
        sigs_np = np.asarray(all_sigs, dtype=np.uint32)
        if n_pad != n_real:
            rng = np.random.RandomState(n_pad & 0x7FFFFFFF)
            filler = rng.randint(
                0, 1 << 32, size=(n_pad - n_real, self.score_width),
                dtype=np.uint64,
            ).astype(np.uint32)
            sigs_np = np.concatenate([sigs_np, filler], axis=0)
        self._n_real = n_real
        self._n_real_dev = jnp.int32(n_real)
        self._sigs_dev = jnp.asarray(sigs_np)
        # host lexsort build + one upload: bit-identical to the device sort
        # but immune to the remote-TPU multi-key-sort compile pathology
        sorted_fps, sorted_ids = forest_ops.build_forest_host(
            sigs_np, self.l, self.k
        )
        self._sorted_fps = jnp.asarray(sorted_fps)
        self._sorted_ids = jnp.asarray(sorted_ids)

    # -------------------------------------------------------------- queries

    def query(self, minhash, k: int, rank: Optional[str] = None,
              method: Optional[str] = None) -> list:
        """Top-k keys, ordered per the index's ``rank`` mode."""
        return self.query_batch([minhash], k, rank=rank, method=method)[0]

    def query_batch(self, minhashes, k: int, return_scores: bool = False,
                    rank: Optional[str] = None,
                    method: Optional[str] = None):
        """Top-k for a query batch in one device dispatch.

        Returns a list per query of keys — or of (key, jaccard) pairs when
        ``return_scores`` — nearest first. ``rank`` overrides the index's
        ordering mode for this call ('forest' | 'jaccard'); ``method``
        the serving route ('auto' | 'forest' | 'scan', see ``__init__``).
        """
        out = self._query_dispatch(minhashes, k, rank=rank, method=method)
        if isinstance(out, list):
            return out
        return self._query_finish(out, k, return_scores)

    def query_stream(self, batches, k: int, return_scores: bool = False,
                     depth: int = 4, rank: Optional[str] = None,
                     method: Optional[str] = None):
        """Pipelined :meth:`query_batch` over an iterable of batches:
        keeps ``depth`` batches in flight with eager async D2H copies,
        hiding the per-batch host<->device round trip (see
        :mod:`datasketch_tpu.utils.pipeline`). Keep batch sizes uniform —
        each distinct padded shape compiles once."""
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
            _finish, depth=depth
        )

    def _resolve_method(self, method: str, rank: str, q_pad: int) -> str:
        """'auto' resolution: the exact scan wins below the crossover
        where the whole table is smaller than the prefix walk's
        worst-case gather volume (q_pad * l * k_prefix * cap slots) —
        and only for jaccard ranking (the scan IS a jaccard ordering;
        prefix-depth ordering is the reference contract of
        rank='forest'). Measured on the 16k-set protocol the walk
        saturates recall@10 ~0.905 while the scan is exact at HIGHER
        q/s (BASELINE.md round-4/5 notes)."""
        if method == "auto":
            if rank != "jaccard":
                return "forest"
            walk_slots = q_pad * self.l * self.k * self.cap
            n_rows = int(self._sigs_dev.shape[0])
            return "scan" if n_rows <= walk_slots else "forest"
        return method

    def _query_dispatch(self, minhashes, k: int, rank: Optional[str] = None,
                        method: Optional[str] = None):
        """Dispatch one batch; returns (device packed, nq) or a ready
        host result (empty-index / empty-batch short-circuits)."""
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
        if self._sorted_fps is None:
            return [[] for _ in minhashes]
        q = _as_signature_matrix(minhashes)
        if q.shape[0] == 0:
            return []
        if q.shape[1] < self.score_width:
            raise ValueError("The num_perm of MinHash out of range")
        q = q[:, : self.score_width]
        nq = q.shape[0]
        # bucket the query batch (shape-stability, same rationale as rows)
        q_pad = 8
        while q_pad < nq:
            q_pad *= 2
        if q_pad != nq:
            pad = ((0, q_pad - nq), (0, 0))
            # device query batches (kt pairs mixed on device) stay on
            # device — np.pad would silently round-trip them to host
            q = jnp.pad(q, pad) if isinstance(q, jax.Array) else np.pad(
                q, pad
            )
        k_pad = max(8, 1 << (k - 1).bit_length())
        method = self._resolve_method(method, rank, q_pad)
        if method == "scan":
            packed = _scan_packed(
                self._sigs_dev, jnp.asarray(q), k_pad, self._n_real_dev
            )
        else:
            packed = _fused_packed(
                self._sorted_fps,
                self._sorted_ids,
                self._sigs_dev,
                jnp.asarray(q),
                self.l,
                self.k,
                self.cap,
                k_pad,
                self._n_real_dev,
                rank,
                self.pool,
            )
        packed.copy_to_host_async()
        return packed, nq

    def _query_finish(self, out, k: int, return_scores: bool):
        packed, nq = out
        packed = np.asarray(packed)
        ids = packed[:nq, 0, :k]
        jac = packed[:nq, 1, :k].astype(np.float64) / _JAC_FX
        self.last_truncated = int(packed[0, 3, 0])
        result = []
        for row_ids, row_jac in zip(ids, jac):
            hits = [
                (self._keys[i], float(s))
                for i, s in zip(row_ids, row_jac)
                if i >= 0
            ]
            result.append(hits if return_scores else [kk for kk, _ in hits])
        return result

    def warmup(self, batch_sizes=(8, 64), k: int = 10) -> None:
        """Pay per-shape XLA compiles before serving traffic (parity with
        ``TpuMinHashLSH.warmup``): one synthetic ``query_batch`` per batch
        size, results discarded. No-op before :meth:`index`."""
        if self._sorted_fps is None:
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
        return len(self._keys) + len(self._pending)

    def is_empty(self) -> bool:
        """True until :meth:`index` has made at least one key searchable."""
        return self._n_real == 0

    def get_minhash_hashvalues(self, key: Hashable) -> np.ndarray:
        """The indexed uint32 signature row for `key` (device fetch)."""
        try:
            pos = self._keys.index(key)
        except ValueError:
            for pk, row in self._pending:
                if pk == key:
                    return np.asarray(row)
            raise KeyError(
                f"The provided key does not exist in the LSHForest: {key}"
            ) from None
        return np.asarray(self._sigs_dev[pos])

    def status(self) -> dict:
        """Operational health counters: indexed/pending rows, padding,
        per-level run occupancy vs ``cap``, device memory footprint."""
        out = {
            "n_indexed": len(self._keys),
            "n_pending": len(self._pending),
            "n_padded": 0,
            "trees": self.l,
            "prefix_len": self.k,
            "cap": self.cap,
            "last_truncated": self.last_truncated,
            "device_bytes": 0,
            "max_leaf_run": 0,
        }
        if self._sorted_fps is not None:
            out["n_padded"] = int(self._sigs_dev.shape[0]) - self._n_real
            out["device_bytes"] = int(
                self._sigs_dev.size * 4
                + self._sorted_fps.size * 4
                + self._sorted_ids.size * 4
            )
            from datasketch_tpu.ops.lsh_ops import bucket_stats

            # deepest level (full prefixes): the tightest occupancy bound
            leaf = self._sorted_fps[:, self.k - 1, :]
            max_run, _ = bucket_stats(leaf)
            out["max_leaf_run"] = int(np.asarray(max_run).max())
        return out

    def save(self, path: str) -> None:
        """Persist signatures + keys as .npz (tables rebuild on load).

        Staged-but-unindexed keys are flushed first (``index()``) so
        nothing silently vanishes from the round trip.
        """
        from datasketch_tpu.persist import atomic_savez, pack_keys

        self.index()
        atomic_savez(
            path,
            sigs=np.asarray(self._sigs_dev)[: self._n_real]
            if self._sigs_dev is not None
            else np.zeros((0, self.score_width), dtype=np.uint32),
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
    def load(cls, path: str) -> "TpuMinHashLSHForest":
        """SECURITY: the key list inside the file is a pickle payload —
        only load index files you created or trust."""
        from datasketch_tpu.persist import npz_path, unpack_keys

        data = np.load(npz_path(path), allow_pickle=False)
        params = [int(x) for x in data["params"]]
        num_perm, l, cap = params[:3]
        # 4th/5th fields (rank mode, cascade) absent in older checkpoints
        rank = "jaccard" if len(params) > 3 and params[3] else "forest"
        cascade = params[4] if len(params) > 4 and params[4] else None
        pool = params[5] if len(params) > 5 else 0
        method = (
            ("auto", "forest", "scan")[params[6]]
            if len(params) > 6 else "auto"
        )
        forest = cls(num_perm=num_perm, l=l, cap=cap, rank=rank,
                     cascade_perm=cascade, pool=pool, method=method)
        keys = unpack_keys(data["keys"])
        sigs = data["sigs"]
        if len(keys):
            forest.index(keys, sigs)
        return forest

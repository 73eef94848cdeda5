"""TpuMinHashLSH — fully device-resident Jaccard-threshold index.

The TPU-native replacement for the reference's storage-backed MinHashLSH at
serving scale: signatures and band tables live in device memory, queries are
batched kernels (searchsorted probes + fused Jaccard rerank), and the
Redis/Cassandra scale-out story becomes mesh sharding
(:mod:`datasketch_tpu.parallel`).

Semantics: same banding scheme and (b, r) optimizer as
:class:`datasketch_tpu.models.lsh.MinHashLSH`; query results additionally
carry MinHash-estimated Jaccard scores (the rerank the reference docs tell
users to do by hand, ``/root/reference/datasketch/lsh.py:374-378``).
"""

from __future__ import annotations

from typing import Hashable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from datasketch_tpu.models.lsh import _optimal_param
from datasketch_tpu.ops import lsh_ops

__all__ = ["TpuMinHashLSH"]


def _as_signature_matrix(minhashes) -> np.ndarray:
    """Stack MinHash/WeightedMinHash objects or arrays into uint32[N, P].

    WeightedMinHash state is ``(k, t)`` int pairs per sample
    (``/root/reference/datasketch/weighted_minhash.py:147``); each pair is
    mixed to one uint32 slot — slot equality iff pair equality (up to a
    2^-32 mix collision), preserving the Jaccard-estimation semantics the
    banding and rerank rely on.
    """
    from datasketch_tpu.ops.cws_ops import kt_slots, kt_slots_np

    if isinstance(minhashes, np.ndarray) and minhashes.ndim == 2:
        # matrix fast path (MinHash.bulk_signatures output)
        return np.ascontiguousarray(minhashes, dtype=np.uint32)
    if isinstance(minhashes, np.ndarray) and minhashes.ndim == 3:
        # host batch of (k, t) pairs: [N, sample_size, 2]
        return kt_slots_np(minhashes)
    if isinstance(minhashes, jax.Array) and minhashes.ndim == 2:
        # device-resident matrix: keep it on device (no host round trip)
        return minhashes.astype(jnp.uint32)
    if isinstance(minhashes, jax.Array) and minhashes.ndim == 3:
        # device-resident (k, t) pairs (WeightedMinHashGenerator
        # .minhash_many(out='device') / ops.cws_ops.cws_many output):
        # mixed to slots ON DEVICE — CWS weights never round-trip to host
        return kt_slots(minhashes)
    rows = []
    for m in minhashes:
        hv = np.asarray(m.hashvalues if hasattr(m, "hashvalues") else m)
        if hv.ndim == 2:  # WeightedMinHash (k, t) pairs
            rows.append(kt_slots_np(hv))
        else:
            rows.append(hv.astype(np.uint64).astype(np.uint32))
    return np.stack(rows) if rows else np.zeros((0, 0), dtype=np.uint32)


def _decode_rows(ids_host, sc_host, keys, nq: int,
                 return_scores: bool) -> list:
    """Shared host decode of compacted query results: boolean-index each
    row's valid prefix and map positions to user keys. ``sc_host`` may be
    None when scores were never computed (candidates-only path)."""
    out = []
    for qi in range(nq):
        row_ids = ids_host[qi]
        hit = row_ids >= 0
        if return_scores:
            out.append(
                [(keys[int(p)], float(s))
                 for p, s in zip(row_ids[hit], sc_host[qi][hit])]
            )
        else:
            out.append([keys[int(p)] for p in row_ids[hit]])
    return out


class TpuMinHashLSH:
    """Device-resident MinHash LSH.

    Args:
        threshold: Jaccard threshold the banding is optimized for; also the
            default rerank cutoff in :meth:`query`.
        num_perm: Signature length.
        weights: (fp_weight, fn_weight) for the (b, r) optimizer.
        params: Explicit (b, r) override.
        bucket_cap: Max bucket members gathered per (query, band). Query
            results report truncation; raise this for skewed data.
        rerank: If True (default), filter candidates by MinHash-estimated
            Jaccard >= threshold on device before returning.
        max_results: If set, threshold queries return at most this many
            (highest-scoring) keys per query and only that many slots ride
            the device->host fetch; overflow is counted in
            ``last_truncated``. None (default) = exact, all candidates.
        cascade_perm: signature-cascade width. When set (> num_perm),
            indexed and query signatures must be this wide; BANDING
            still uses the first ``num_perm`` slots (the (b, r)
            optimizer stays at the base width, and MinHash permutation
            families are prefix-stable at equal seed, so cascade
            sketches band identically to base-width ones), while every
            rerank/scan SCORE uses the full width — estimation noise
            drops by sqrt(cascade_perm / num_perm). This is the
            device-native form of the "re-rank candidates yourself"
            advice of ``/root/reference/datasketch/lsh.py:374-378``,
            bought with memory (cascade_perm/num_perm x) instead of
            recall.
    """

    def __init__(
        self,
        threshold: float = 0.9,
        num_perm: int = 128,
        weights: tuple = (0.5, 0.5),
        params: Optional[tuple] = None,
        bucket_cap: int = 128,
        rerank: bool = True,
        max_results: Optional[int] = None,
        cascade_perm: Optional[int] = None,
    ):
        if threshold > 1.0 or threshold < 0.0:
            raise ValueError("threshold must be in [0.0, 1.0]")
        if num_perm < 2:
            raise ValueError("Too few permutation functions")
        if cascade_perm is not None and cascade_perm < num_perm:
            raise ValueError("cascade_perm must be >= num_perm")
        self.threshold = threshold
        self.h = num_perm
        self.cascade_perm = cascade_perm
        # width of stored/query signature rows (scores use all of it;
        # banding only the first b*r <= num_perm columns)
        self.in_width = cascade_perm or num_perm
        if params is not None:
            self.b, self.r = params
            if self.b * self.r > num_perm:
                raise ValueError("b*r must be <= num_perm")
        else:
            self.b, self.r = _optimal_param(threshold, num_perm, *weights)
        self.bucket_cap = bucket_cap
        self.rerank = rerank
        self.max_results = max_results

        # floor for the padded row count: sibling sub-indexes (the
        # containment ensemble's partitions) set a COMMON floor so they
        # all share one compiled program per (b, r) instead of one per
        # partition size
        self.min_rows = 0

        self._keys: list = []  # position -> user key
        self._key_to_pos: dict = {}
        self._sigs_dev = None  # uint32[N, P] on device
        self._sorted_fp = None  # [b, N]
        self._sorted_ids = None  # [b, N]
        self._pending_sigs: list = []  # host tail awaiting reindex
        self._n_real = 0  # live+tombstoned rows; the rest is shape padding
        self._n_real_dev = None  # cached device scalar of _n_real
        self._alive = None  # bool[N] tombstone mask (False = removed)
        self._alive_dev = None  # cached (device_mask, all_alive) pair
        self.last_truncated = 0

    # ------------------------------------------------------------------ build

    def index(self, keys: Sequence[Hashable], minhashes) -> None:
        """Bulk-build the index from parallel (keys, minhashes) sequences.

        Replaces per-key ``insert`` loops: one device sort per band.
        """
        # Buffered insert()s first: base positions below count self._keys,
        # so unflushed rows would otherwise land AFTER this batch's rows
        # while their keys sit BEFORE them — permanently swapping the
        # key<->signature mapping.
        self._flush_pending()
        keys = list(keys)
        sigs = _as_signature_matrix(minhashes)
        if sigs.shape[0] != len(keys):
            raise ValueError("keys and minhashes must have equal length")
        if sigs.shape[0] and sigs.shape[1] != self.in_width:
            raise ValueError(
                "Expecting minhash with length %d, got %d"
                % (self.in_width, sigs.shape[1])
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
        if self._sigs_dev is None:
            all_sigs = sigs  # numpy: _rebuild pads on host, one upload
        else:
            # concat on device: no D2H round-trip of the existing corpus
            all_sigs = jnp.concatenate(
                [self._sigs_dev[: self._n_real], jnp.asarray(sigs)], axis=0
            )
        self._rebuild(all_sigs)

    def index_tokens(self, keys: Sequence[Hashable], token_docs,
                     seed: int = 1, scheme: str = "permutation") -> None:
        """Bulk-build straight from PRE-TOKENIZED integer documents.

        Token ids are uploaded raw and hashed ON-CHIP (fmix32 fused into
        the signature kernel, ``hashfunc='device'``) — the host does zero
        per-token work. The TPU-native form of the reference's pluggable
        fast-hashfunc story (``/root/reference/docs/minhash.rst:79-121``).
        Resulting signatures are not interoperable with SHA1-based ones;
        query with sketches built the same way (``MinHash(
        hashfunc='device')`` or another ``index_tokens`` corpus at equal
        seed).

        Args:
            keys: one key per document.
            token_docs: sequence of int arrays/lists (uint32 token ids).
            seed: permutation-family seed (must match query sketches).
            scheme: signature scheme, as :meth:`MinHash.bulk_signatures`.
        """
        from datasketch_tpu.models.minhash import MinHash

        sigs = MinHash.bulk_signatures(
            token_docs, scheme=scheme, num_perm=self.in_width, seed=seed,
            hashfunc="device", out="device",
        )
        self.index(keys, sigs)

    def index_text(self, keys: Sequence[Hashable], texts, k: int = 9,
                   seed: int = 1) -> None:
        """Bulk-build straight from RAW TEXT via on-device k-shingling.

        The raw bytes are uploaded (1 byte/char — ~4x less than
        host-hashed shingles over the bandwidth-bound link) and every
        overlapping k-byte window is hashed on the VPU
        (:mod:`datasketch_tpu.ops.text_ops`); signatures stay
        device-resident end to end. Query with sketches built by
        ``MinHash.bulk_from_text(..., hashfunc='device')`` at equal
        ``(k, seed)`` — or directly with :meth:`query_text` /
        :meth:`top_k_text`.
        """
        if len(keys) != len(texts):
            raise ValueError("keys and texts must have equal length")
        from datasketch_tpu.models.minhash import MinHash

        sigs = MinHash.bulk_from_text(
            texts, k=k, num_perm=self.in_width, seed=seed,
            hashfunc="device",
            out="device",
        )
        self.index(keys, sigs)

    def _token_query_sigs(self, token_docs, seed: int):
        from datasketch_tpu.models.minhash import MinHash

        return MinHash.bulk_signatures(
            token_docs, num_perm=self.in_width, seed=seed,
            hashfunc="device",
            out="device",
        )

    def _text_query_sigs(self, texts, shingle_k: int, seed: int):
        from datasketch_tpu.models.minhash import MinHash

        return MinHash.bulk_from_text(
            texts, k=shingle_k, num_perm=self.in_width, seed=seed,
            hashfunc="device", out="device",
        )

    def query_tokens(self, token_docs, seed: int = 1, **kwargs) -> list:
        """Threshold-query straight from pre-tokenized integer documents
        (query-side twin of :meth:`index_tokens` — ids hashed ON-CHIP,
        no per-query sketch objects). ``seed`` must match the indexed
        corpus; extra kwargs pass to :meth:`query_batch`."""
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
        """Threshold-query straight from raw texts (query-side twin of
        :meth:`index_text` — shingles hashed ON-CHIP). ``(shingle_k,
        seed)`` must match the indexed corpus; extra kwargs pass to
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

    def insert(self, key: Hashable, minhash, check_duplication: bool = True) -> None:
        """Insert one (key, minhash); buffers and reindexes lazily."""
        if check_duplication and key in self._key_to_pos:
            raise ValueError("The given key already exists")
        hv = _as_signature_matrix([minhash])[0]  # handles WeightedMinHash too
        if hv.shape[0] != self.in_width:
            raise ValueError(
                "Expecting minhash with length %d, got %d"
                % (self.in_width, hv.shape[0])
            )
        self._key_to_pos[key] = len(self._keys)
        self._keys.append(key)
        self._pending_sigs.append(hv)

    def _flush_pending(self) -> None:
        if not self._pending_sigs:
            return
        tail = np.stack(self._pending_sigs)
        self._pending_sigs = []
        if self._sigs_dev is None:
            all_sigs = tail  # numpy: _rebuild pads on host, one upload
        else:
            all_sigs = jnp.concatenate(
                [self._sigs_dev[: self._n_real], jnp.asarray(tail)], axis=0
            )
        self._rebuild(all_sigs)

    def _rebuild(self, all_sigs) -> None:
        # Pad N up to a power of two (>=128): arbitrary corpus sizes would
        # otherwise compile a fresh sort/probe program per size, and XLA
        # compiles through remote-TPU paths can take minutes for unlucky
        # shapes. Padded rows get pseudo-random signatures (so they spread
        # across buckets instead of forming one mega-run) and their ids are
        # masked out of every query via n_valid / the alive mask.
        n_real = all_sigs.shape[0]
        n_pad = 128
        while n_pad < max(n_real, self.min_rows):
            n_pad *= 2
        if n_pad != n_real:
            rng = np.random.RandomState(n_pad & 0x7FFFFFFF)
            filler = rng.randint(
                0, 1 << 32, size=(n_pad - n_real, self.in_width), dtype=np.uint64
            ).astype(np.uint32)
            if isinstance(all_sigs, np.ndarray):
                # host corpus: pad in numpy, ONE upload — a device concat
                # would compile a tiny program per distinct size
                all_sigs = np.concatenate([all_sigs, filler], axis=0)
            else:
                all_sigs = jnp.concatenate(
                    [all_sigs, jnp.asarray(filler)], axis=0
                )
        if isinstance(all_sigs, np.ndarray):
            # chunked upload: one jnp.asarray of a multi-hundred-MB host
            # corpus rides the slow H2D path (~6-12 MB/s through the
            # tunnel); device_upload streams 8MB chunks (~50 MB/s)
            from datasketch_tpu.ops.transfer import device_upload

            all_sigs = device_upload(all_sigs)
        else:
            all_sigs = jnp.asarray(all_sigs)
        self._n_real = n_real
        # device scalar cached: a fresh jnp.int32(...) per query is a tiny
        # H2D transfer whose latency is visible through the axon tunnel
        self._n_real_dev = jnp.int32(n_real)
        self._sigs_dev = all_sigs
        fps = lsh_ops.band_fingerprints(self._sigs_dev, self.b, self.r)
        self._sorted_fp, self._sorted_ids = lsh_ops.build_tables(fps)
        if self._alive is None or self._alive.shape[0] != n_real:
            old = self._alive
            self._alive = np.ones(n_real, dtype=bool)
            if old is not None:
                self._alive[: old.shape[0]] = old
            self._alive_dev = None

    def remove(self, key: Hashable) -> None:
        """Tombstone `key` (parity with MinHashLSH.remove, lsh.py:497-528).

        The signature row stays in the band tables but is masked from every
        query; call :meth:`compact` to reclaim space after many removals.
        """
        self._flush_pending()
        if key not in self._key_to_pos:
            raise ValueError("The given key does not exist")
        pos = self._key_to_pos.pop(key)
        self._alive[pos] = False
        self._keys[pos] = None
        self._alive_dev = None  # invalidate cached device mask

    def merge(self, other: "TpuMinHashLSH", check_overlap: bool = False) -> None:
        """Union another index into this one (device-side concat + one
        rebuild; parameter-equivalence rules of ``MinHashLSH.merge``,
        ``/root/reference/datasketch/lsh.py:233-251``)."""
        if type(self) is not type(other):
            raise ValueError(
                f"Cannot merge type TpuMinHashLSH and type "
                f"{type(other).__name__}."
            )
        if (self.h, self.in_width, self.b, self.r) != (
            other.h, other.in_width, other.b, other.r):
            raise ValueError(
                "Cannot merge TpuMinHashLSH with different initialization "
                "parameters."
            )
        self._flush_pending()
        other._flush_pending()
        if check_overlap and set(self._key_to_pos) & set(other._key_to_pos):
            raise ValueError("The keys are overlapping, duplicate key exists.")
        if other._sigs_dev is None or not other._n_real:
            return
        base = len(self._keys)
        for i, k in enumerate(other._keys):
            if k is not None:
                self._key_to_pos[k] = base + i
        self._keys.extend(other._keys)
        old_alive, other_alive = self._alive, other._alive
        if self._sigs_dev is None:
            merged = other._sigs_dev[: other._n_real]
        else:
            merged = jnp.concatenate(
                [self._sigs_dev[: self._n_real],
                 other._sigs_dev[: other._n_real]], axis=0
            )
        n_self = 0 if old_alive is None else old_alive.shape[0]
        self._rebuild(merged)
        if old_alive is not None:
            self._alive[:n_self] = old_alive
        if other_alive is not None:
            self._alive[n_self : n_self + other_alive.shape[0]] = other_alive
        self._alive_dev = None

    def status(self) -> dict:
        """Operational health counters (the device-index analogue of
        ``Storage.status``): live/tombstoned row counts, padding, bucket
        occupancy vs ``bucket_cap``, and device memory footprint."""
        self._flush_pending()
        n_live = len(self._key_to_pos)
        out = {
            "n_live": n_live,
            "n_tombstoned": self._n_real - n_live,
            "n_padded": 0,
            "bands": self.b,
            "rows_per_band": self.r,
            "bucket_cap": self.bucket_cap,
            "last_truncated": self.last_truncated,
            "device_bytes": 0,
            "max_bucket": 0,
            "distinct_buckets_min": 0,
        }
        if self._sigs_dev is not None:
            out["n_padded"] = int(self._sigs_dev.shape[0]) - self._n_real
            out["device_bytes"] = int(
                self._sigs_dev.size * 4
                + self._sorted_fp.size * 4
                + self._sorted_ids.size * 4
            )
            max_run, n_distinct = lsh_ops.bucket_stats(self._sorted_fp)
            # one D2H round trip for both stats (each separate fetch
            # costs a full tunnel RTT)
            max_run, n_distinct = jax.device_get((max_run, n_distinct))
            out["max_bucket"] = int(max_run.max())
            out["distinct_buckets_min"] = int(n_distinct.min())
        return out

    def compact(self) -> None:
        """Drop tombstoned rows and rebuild the band tables."""
        self._flush_pending()
        if self._sigs_dev is None or self._alive.all():
            return
        live = np.nonzero(self._alive)[0]
        sigs = self._sigs_dev[jnp.asarray(live)]  # gather on device (live < n_real)
        self._keys = [self._keys[i] for i in live]
        self._key_to_pos = {k: i for i, k in enumerate(self._keys)}
        self._alive = None
        self._alive_dev = None
        self._rebuild(sigs)

    # ------------------------------------------------------------------ query

    def _alive_state(self):
        """(device mask or None-if-all-alive), cached until remove/compact."""
        if self._alive_dev is None:
            if self._alive is None or bool(self._alive.all()):
                self._alive_dev = (None, True)
            else:
                self._alive_dev = (jnp.asarray(self._alive), False)
        return self._alive_dev

    def _mask_dead(self, flat_ids):
        """Replace padded and tombstoned candidate ids with -1."""
        flat_ids = jnp.where(flat_ids < self._n_real, flat_ids, -1)
        alive_dev, all_alive = self._alive_state()
        if all_alive:
            return flat_ids
        safe = jnp.where(flat_ids >= 0, flat_ids, 0)
        return jnp.where((flat_ids >= 0) & alive_dev[safe], flat_ids, -1)

    def __contains__(self, key: Hashable) -> bool:
        return key in self._key_to_pos

    def __len__(self) -> int:
        return len(self._key_to_pos)

    def is_empty(self) -> bool:
        return len(self._key_to_pos) == 0

    def query(self, minhash, threshold: Optional[float] = None) -> list:
        """Single query; returns candidate keys (reranked if enabled)."""
        return self.query_batch([minhash], threshold=threshold)[0]

    def query_batch(
        self,
        minhashes,
        threshold: Optional[float] = None,
        return_scores: bool = False,
        method: str = "auto",
    ) -> list:
        """Batched query: one device pass for any number of queries.

        The whole pipeline — probe, rerank, dedupe, cutoff filter,
        compaction — finishes ON DEVICE; the host receives one compact
        buffer per batch (a per-query host ``np.unique`` loop would cap
        batched threshold q/s far below the top-k path's).

        method:
            ``'bands'`` — band probe -> fused rerank/select in one
            dispatch (``lsh_ops.query_fused``).
            ``'scan'`` — exact streaming scan of every stored signature:
            returns ALL keys whose estimated Jaccard >= threshold (up to
            ``max_results`` / 1024 per query), recall 1.0 over stored
            sketches. Requires ``rerank`` (it scores everything).
            ``'auto'`` — scan when the corpus is smaller than the band
            gather budget (same traffic model as :meth:`top_k`).

        Returns a list (per query) of keys, or of (key, score) pairs when
        ``return_scores`` (scores are MinHash-estimated Jaccard,
        descending).
        """
        if method not in ("auto", "bands", "scan"):
            raise ValueError("method must be 'auto', 'bands' or 'scan'")
        self._flush_pending()
        if self._sigs_dev is None or not len(self._keys):
            return [[] for _ in minhashes]
        q_sigs = _as_signature_matrix(minhashes)
        if q_sigs.shape[1] != self.in_width:
            raise ValueError(
                "Expecting minhash with length %d, got %d"
                % (self.in_width, q_sigs.shape[1])
            )
        cutoff = self.threshold if threshold is None else threshold
        item = self._query_dispatch(
            q_sigs, cutoff, method, self.rerank or return_scores
        )
        return self._query_finish(item, q_sigs.shape[0], return_scores)

    def _query_finish(self, item, nq: int, return_scores: bool) -> list:
        """Shared finish for query_batch / query_stream: ONE device_get
        round trip (each separate fetch costs a full tunnel RTT ~30ms),
        truncation accounting, host decode."""
        sel_ids, sel_sc, n_match, truncated, max_out, escalate = item
        fetch = [sel_ids, n_match]
        if sel_sc is not None:
            fetch.append(sel_sc)
        if truncated is not None:
            fetch.append(truncated)
        got = jax.device_get(tuple(fetch))
        ids_host, n_host = got[0], got[1]
        if escalate is not None and (n_host > max_out).any():
            # some query matched more rows than the fast-path k: rerun
            # at the full budget (rare; see _query_dispatch scan branch)
            return self._query_finish(escalate(), nq, return_scores)
        idx = 2
        sc_host = None
        if sel_sc is not None:
            sc_host = got[idx]
            idx += 1
        trunc = int(got[idx]) if truncated is not None else 0
        self.last_truncated = trunc + int(
            np.maximum(n_host - max_out, 0).sum()
        )
        return _decode_rows(ids_host, sc_host, self._keys, nq, return_scores)

    def query_stream(self, batches, threshold: Optional[float] = None,
                     return_scores: bool = False, method: str = "auto",
                     depth: int = 4):
        """Pipelined threshold serving: yields one result list per
        incoming batch, with up to ``depth`` batches in flight and eager
        async D2H copies — the threshold twin of :meth:`top_k_stream`
        (same ~30ms-per-round-trip rationale). Keep batch sizes uniform.
        """
        if method not in ("auto", "bands", "scan"):
            raise ValueError("method must be 'auto', 'bands' or 'scan'")
        from datasketch_tpu.utils.pipeline import stream_batches

        self._flush_pending()
        cutoff = self.threshold if threshold is None else threshold

        def _dispatch(batch):
            batch = list(batch)
            if self._sigs_dev is None or not len(self._keys):
                return (None, len(batch))
            q_sigs = _as_signature_matrix(batch)
            if q_sigs.shape[1] != self.in_width:
                raise ValueError(
                    "Expecting minhash with length %d, got %d"
                    % (self.in_width, q_sigs.shape[1])
                )
            return (
                self._query_dispatch(
                    q_sigs, cutoff, method, self.rerank or return_scores
                ),
                q_sigs.shape[0],
            )

        def _finish(out):
            item, nq = out
            if item is None:
                return [[] for _ in range(nq)]
            return self._query_finish(item, nq, return_scores)

        return stream_batches(batches, _dispatch, _finish, depth=depth)

    def _query_dispatch(self, q_sigs: np.ndarray, cutoff: float,
                        method: str, need_scores: bool = True):
        """Dispatch one threshold batch; returns device (sel_ids,
        sel_sc-or-None, n_match, truncated-or-None) plus the static
        max_out, without forcing any transfer. With ``need_scores``
        False (rerank off, no scores requested) the signature table is
        never touched — candidates-only, reference query semantics."""
        q_dev = jnp.asarray(q_sigs)
        gather_slots = q_sigs.shape[0] * self.b * self.bucket_cap
        if method == "auto":
            method = (
                "scan"
                if self.rerank and self._sigs_dev.shape[0] <= gather_slots
                else "bands"
            )
        if method == "scan":
            if not self.rerank:
                raise ValueError(
                    "method='scan' requires rerank=True (it scores every "
                    "stored signature; without a cutoff the result would "
                    "be the whole corpus)"
                )
            n_pad = self._sigs_dev.shape[0]
            max_out = min(self.max_results or 1024, n_pad)
            # Fused-kernel-sized k first (topk_scan's Mosaic branch caps
            # at 128 and a big-k scan pays both the per-tile [Q, k+tile]
            # lax.top_k and a mostly -1 result fetch through the
            # tunnel); _query_finish escalates to the full max_out only
            # when a query's exact match count overflows — exactness is
            # kept, the fast path stays one dispatch + one small fetch.
            scan_k = min(max_out, 128)
            alive_dev, all_alive = self._alive_state()
            alive_arg = None if all_alive else alive_dev

            def _scan(k_):
                return lsh_ops.topk_scan(
                    self._sigs_dev,
                    q_dev,
                    k_,
                    n_valid=self._n_real_dev,
                    alive=alive_arg,
                    count_ge=jnp.float32(cutoff),
                )

            sel_ids, sel_sc, n_match = _scan(scan_k)
            escalate = None
            if scan_k < max_out:
                escalate = lambda: (  # noqa: E731 - one-shot closure
                    _scan(max_out) + (None, max_out, None)
                )
            return sel_ids, sel_sc, n_match, None, scan_k, escalate
        c = self.b * self.bucket_cap
        max_out = c if self.max_results is None else min(self.max_results, c)
        all_alive = self._alive_state()[1]
        if not need_scores:
            if all_alive:
                sel_ids, n_match, trunc = lsh_ops.query_candidates_fused(
                    self._sorted_fp,
                    self._sorted_ids,
                    q_dev,
                    self.b,
                    self.r,
                    self.bucket_cap,
                    max_out,
                    n_valid=self._n_real_dev,
                )
            else:
                q_fps = lsh_ops.band_fingerprints(q_dev, self.b, self.r)
                ids, trunc = lsh_ops.query_tables(
                    self._sorted_fp, self._sorted_ids, q_fps,
                    cap=self.bucket_cap,
                )
                flat_ids = self._mask_dead(
                    ids.reshape(q_sigs.shape[0], -1)
                )
                sel_ids, n_match = lsh_ops.unique_compact(flat_ids, max_out)
            return sel_ids, None, n_match, trunc, max_out, None
        cut = float(cutoff) if self.rerank else -1.0
        if all_alive:
            # hot path: whole pipeline in one dispatch
            sel_ids, sel_sc, n_match, trunc = lsh_ops.query_fused(
                self._sorted_fp,
                self._sorted_ids,
                self._sigs_dev,
                q_dev,
                self.b,
                self.r,
                self.bucket_cap,
                jnp.float32(cut),
                max_out,
                n_valid=self._n_real_dev,
            )
            return sel_ids, sel_sc, n_match, trunc, max_out, None
        # tombstoned rows: separate probes so the alive mask applies
        q_fps = lsh_ops.band_fingerprints(q_dev, self.b, self.r)
        ids, truncated = lsh_ops.query_tables(
            self._sorted_fp, self._sorted_ids, q_fps, cap=self.bucket_cap
        )
        flat_ids = self._mask_dead(ids.reshape(q_sigs.shape[0], -1))
        scores = lsh_ops.rerank_jaccard(self._sigs_dev, q_dev, flat_ids)
        sel_ids, sel_sc, n_match = lsh_ops.threshold_select(
            scores, flat_ids, jnp.float32(cut), max_out
        )
        return sel_ids, sel_sc, n_match, truncated, max_out, None

    def top_k(self, minhashes, k: int, method: str = "auto") -> list:
        """Top-k most similar indexed keys per query, fully on device.

        method:
            ``'bands'`` — band probe -> fused Jaccard rerank -> dedupe ->
            ``lax.top_k`` (sub-linear candidate generation; wins when the
            corpus is much larger than the band gather budget).
            ``'scan'`` — exact streaming scan of every stored signature
            (recall 1.0 over stored sketches; on TPU the sequential
            ``N x P`` stream beats the band path's ``Q*b*cap x P`` random
            gathers for small/medium corpora).
            ``'auto'`` — pick by traffic model: scan when
            ``N_pad <= Q * b * bucket_cap``.
        """
        if method not in ("auto", "bands", "scan"):
            raise ValueError("method must be 'auto', 'bands' or 'scan'")
        self._flush_pending()
        if self._sigs_dev is None or not len(self._keys):
            return [[] for _ in minhashes]
        q_sigs = _as_signature_matrix(minhashes)
        if q_sigs.shape[1] != self.in_width:
            raise ValueError(
                "Expecting minhash with length %d, got %d"
                % (self.in_width, q_sigs.shape[1])
            )
        top_ids, top_sc, truncated = self._top_k_dispatch(q_sigs, k, method)
        # single D2H round trip (each separate fetch pays a tunnel RTT)
        if truncated is None:
            top_ids, top_sc = jax.device_get((top_ids, top_sc))
            self.last_truncated = 0
        else:
            top_ids, top_sc, trunc = jax.device_get((top_ids, top_sc, truncated))
            self.last_truncated = int(trunc)
        return self._top_k_format(top_ids, top_sc)

    def _top_k_dispatch(self, q_sigs: np.ndarray, k: int, method: str):
        """Dispatch one top-k batch; returns device (ids, scores,
        truncated-or-None) without forcing any transfer."""
        q_dev = jnp.asarray(q_sigs)
        if method == "auto":
            gather_slots = q_sigs.shape[0] * self.b * self.bucket_cap
            method = "scan" if self._sigs_dev.shape[0] <= gather_slots else "bands"
        if method == "scan":
            alive_dev, all_alive = self._alive_state()
            top_ids, top_sc = lsh_ops.topk_scan(
                self._sigs_dev,
                q_dev,
                k,
                n_valid=self._n_real_dev,
                alive=None if all_alive else alive_dev,
            )
            truncated = None  # the scan touches every row; nothing to cap
        elif self._alive_state()[1]:
            # hot path: whole pipeline in one dispatch
            top_ids, top_sc, truncated = lsh_ops.topk_fused(
                self._sorted_fp,
                self._sorted_ids,
                self._sigs_dev,
                q_dev,
                self.b,
                self.r,
                self.bucket_cap,
                k,
                n_valid=self._n_real_dev,
            )
        else:
            q_fps = lsh_ops.band_fingerprints(q_dev, self.b, self.r)
            ids, truncated = lsh_ops.query_tables(
                self._sorted_fp, self._sorted_ids, q_fps, cap=self.bucket_cap
            )
            flat_ids = self._mask_dead(ids.reshape(q_sigs.shape[0], -1))
            scores = lsh_ops.rerank_jaccard(self._sigs_dev, q_dev, flat_ids)
            top_ids, top_sc = lsh_ops.topk_candidates(
                scores, flat_ids, k, max_dup=self.b
            )
        return top_ids, top_sc, truncated

    def _top_k_format(self, top_ids, top_sc) -> list:
        return [
            [
                (self._keys[int(p)], float(s))
                for p, s in zip(row_ids, row_sc)
                if p >= 0
            ]
            for row_ids, row_sc in zip(top_ids, top_sc)
        ]

    def top_k_stream(self, batches, k: int, method: str = "auto",
                     depth: int = 4):
        """Pipelined serving: yields one result list per incoming batch.

        A synchronous :meth:`top_k` pays a full host<->device round trip
        per batch (~30ms through a remote-TPU tunnel) no matter how small
        the batch. This generator keeps up to ``depth`` batches in flight
        — dispatch is async, and D2H copies are started eagerly with
        ``copy_to_host_async`` the moment a batch is dispatched — so the
        round-trip latency of batch i overlaps compute and transfer of
        batches i+1..i+depth (measured ~30ms -> ~5ms per 50-query batch
        at depth 4). The asyncio-gather concurrency of the reference's
        ``AsyncMinHashLSH`` (``/root/reference/datasketch/aio/lsh.py:269``)
        becomes transfer/compute pipelining here.

        Args:
            batches: iterable of minhash batches (each as :meth:`top_k`).
            k / method: as :meth:`top_k`.
            depth: max batches in flight.
        """
        if method not in ("auto", "bands", "scan"):
            raise ValueError("method must be 'auto', 'bands' or 'scan'")
        from datasketch_tpu.utils.pipeline import stream_batches

        self._flush_pending()

        def _dispatch(batch):
            batch = list(batch)
            if self._sigs_dev is None or not len(self._keys):
                return (None, len(batch))  # empty-index marker
            q_sigs = _as_signature_matrix(batch)
            if q_sigs.shape[1] != self.in_width:
                raise ValueError(
                    "Expecting minhash with length %d, got %d"
                    % (self.in_width, q_sigs.shape[1])
                )
            return (self._top_k_dispatch(q_sigs, k, method), len(batch))

        def _finish(out):
            item, n_queries = out
            if item is None:
                return [[] for _ in range(n_queries)]
            top_ids, top_sc, truncated = item
            if truncated is None:
                top_ids, top_sc = jax.device_get((top_ids, top_sc))
                self.last_truncated = 0
            else:
                top_ids, top_sc, trunc = jax.device_get(
                    (top_ids, top_sc, truncated)
                )
                self.last_truncated = int(trunc)
            return self._top_k_format(top_ids, top_sc)

        return stream_batches(batches, _dispatch, _finish, depth=depth)

    def warmup(self, batch_sizes=(8, 64), k: int = 10,
               method: str = "auto") -> None:
        """Pay per-shape XLA compiles before serving traffic.

        Each distinct query-batch shape compiles its own program — on
        remote-attached TPUs that is seconds to minutes of first-request
        latency. Runs one synthetic ``top_k`` and one ``query_batch``
        per batch size (results discarded). No-op on an empty index.
        """
        self._flush_pending()
        if self._sigs_dev is None or not len(self._keys):
            return
        rng = np.random.RandomState(0)
        for q in batch_sizes:
            sigs = rng.randint(
                0, 1 << 32, size=(int(q), self.in_width), dtype=np.uint64
            ).astype(np.uint32)
            self.top_k(sigs, k, method=method)
            self.query_batch(sigs)

    # ------------------------------------------------------------ persistence

    def host_snapshot(self) -> dict:
        """Host-side copy of the queryable state: ``{"keys", "sigs",
        "alive"}`` (``alive`` is None when nothing is tombstoned).

        One D2H fetch while the device is healthy; feeds
        :class:`datasketch_tpu.serving.FailoverIndex`'s degraded-mode
        exact scan so queries survive a wedged device.
        """
        self._flush_pending()
        sigs = (
            np.asarray(self._sigs_dev)[: self._n_real]
            if self._sigs_dev is not None
            else np.zeros((0, self.in_width), np.uint32)
        )
        alive = None
        if self._alive is not None and not bool(self._alive.all()):
            alive = self._alive.copy()
        return {"keys": list(self._keys), "sigs": sigs, "alive": alive}

    def save(self, path: str) -> None:
        """Persist the index to an ``.npz`` (device state exported to host).

        The TPU-native analogue of the reference's pickle/mmap persistence
        (``/root/reference/docs/lsh.rst:174-192``, ``lsh_bloom.py:74-83``):
        signatures, key list, and tombstones round-trip; band tables are
        rebuilt on load (one device sort — cheaper than shipping them).
        ``.npz`` is appended when missing (numpy does so on write anyway).
        """
        self._flush_pending()
        from datasketch_tpu.persist import atomic_savez, npz_path, pack_keys

        path = npz_path(path)
        atomic_savez(
            path,
            sigs=np.asarray(self._sigs_dev)[: self._n_real]
            if self._sigs_dev is not None
            else np.zeros((0, self.in_width), np.uint32),
            alive=self._alive
            if self._alive is not None
            else np.ones(0, dtype=bool),
            keys=pack_keys(self._keys),
            meta=np.array(
                [self.h, self.b, self.r, self.bucket_cap,
                 int(self.rerank), self.in_width],
                dtype=np.int64,
            ),
            threshold=np.float64(self.threshold),
        )

    @classmethod
    def load(cls, path: str) -> "TpuMinHashLSH":
        """Reconstruct an index saved by :meth:`save`.

        SECURITY: the key list inside the file is a pickle payload — only
        load index files you created or trust (same caveat as the
        reference's pickled indexes).
        """
        from datasketch_tpu.persist import npz_path, unpack_keys

        data = np.load(npz_path(path), allow_pickle=False)
        meta = [int(x) for x in data["meta"]]
        h, b, r, cap, rerank = meta[:5]
        # 6th field (cascade width) absent in pre-round-4 checkpoints
        in_width = meta[5] if len(meta) > 5 else h
        index = cls(
            threshold=float(data["threshold"]),
            num_perm=h,
            params=(b, r),
            bucket_cap=cap,
            rerank=bool(rerank),
            cascade_perm=in_width if in_width != h else None,
        )
        keys = unpack_keys(data["keys"])
        sigs = data["sigs"]
        if sigs.shape[0]:
            index._keys = keys
            index._key_to_pos = {
                k: i for i, k in enumerate(keys) if k is not None
            }
            index._alive = data["alive"].copy()
            index._alive_dev = None
            index._rebuild(jnp.asarray(sigs))
        return index

    # ----------------------------------------------------------- band-limited

    def query_b(self, minhashes, b: int) -> list:
        """Candidates probing only the FIRST ``b`` bands (no rerank).

        The device form of ``MinHashLSH._query_b``
        (``/root/reference/datasketch/lsh.py:545-558``), used by the
        containment ensemble where different partitions probe different
        band counts of the same r-index.
        """
        out = self.query_b_dispatch(minhashes, b)
        if isinstance(out, list):
            return out
        return self.query_b_finish(out)

    def query_b_dispatch(self, minhashes, b: int):
        """Async half of :meth:`query_b`: returns device (flat ids,
        truncated, n_queries) without forcing a transfer, so callers
        probing many sub-indexes (the containment ensemble) can pipeline
        the round trips instead of paying one per probe.

        Shape economy: all ``self.b`` bands are probed with the kept
        count ``b`` applied as a DYNAMIC mask, and the query batch is
        padded to a power of two — one compiled program per (index,
        query-bucket) no matter how many distinct band counts callers
        use (remote-TPU compiles are the expensive resource)."""
        if b > self.b:
            raise ValueError("b must be less or equal to the number of bands")
        self._flush_pending()
        if self._sigs_dev is None or not len(self._key_to_pos):
            return [set() for _ in minhashes]
        q_sigs = _as_signature_matrix(minhashes)
        if q_sigs.shape[1] != self.in_width:
            raise ValueError(
                "Expecting minhash with length %d, got %d"
                % (self.in_width, q_sigs.shape[1])
            )
        nq = q_sigs.shape[0]
        q_pad = 8
        while q_pad < nq:
            q_pad *= 2
        if q_pad != nq:
            q_sigs = np.pad(q_sigs, ((0, q_pad - nq), (0, 0)))
        flat, truncated = lsh_ops.query_bands_masked(
            self._sorted_fp,
            self._sorted_ids,
            jnp.asarray(q_sigs),
            self.b,
            self.r,
            self.bucket_cap,
            jnp.int32(b),
        )
        flat = self._mask_dead(flat)
        return flat, truncated, nq

    def query_b_finish(self, out) -> list:
        flat, truncated, nq = out
        ids_host, trunc = jax.device_get((flat, truncated))
        self.last_truncated = int(trunc)
        result = []
        for row in ids_host[:nq]:
            result.append({self._keys[int(p)] for p in np.unique(row[row >= 0])})
        return result

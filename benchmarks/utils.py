"""Shared benchmark machinery: synthetic sets, exact ground truth, SQLite.

Reproduces the evaluation protocol of the reference harness
(``/root/reference/benchmark/indexes/jaccard/utils.py``): recall@k and mean
average precision are computed against an exact-Jaccard run (utils.py:207-237,
279-347), per-query wall times are recorded, and results persist to SQLite
(utils.py:137-188). The reference reads datasets from
ekzhu/set-similarity-search-benchmark; this harness generates synthetic
corpora with matched size/overlap statistics instead (no network egress).
"""

from __future__ import annotations

import json
import os
import sqlite3
import time

import numpy as np

try:  # persistent jit cache: ragged corpora hit several (B, T) shapes
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("DATASKETCH_TPU_JIT_CACHE", "/tmp/datasketch_tpu_jit_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover
    pass


def generate_sets(
    n_sets: int = 10000,
    vocab: int = 50000,
    mean_size: int = 190,
    n_queries: int = 100,
    seed: int = 41,
):
    """Synthetic corpus of integer-token sets with realistic overlap.

    Sizes are lognormal around ``mean_size`` (the 20-Newsgroups 3-shingle
    corpus used by the reference docs has avg cardinality 193,
    ``/root/reference/docs/lsh.rst:71``); tokens are drawn Zipf-like so
    near-duplicate structure emerges; a fraction of sets are explicit
    mutated near-duplicates of earlier sets.

    Returns (sets, keys, query_sets, query_keys); sets are sorted unique
    int64 numpy arrays (the reference's set representation).
    """
    rng = np.random.RandomState(seed)
    zipf_w = 1.0 / np.arange(1, vocab + 1) ** 0.8
    zipf_cum = np.cumsum(zipf_w / zipf_w.sum())

    def zipf_draw(size):
        # inverse-CDF sampling: rng.choice(p=...) recomputes the 50k-entry
        # cumsum on EVERY call (~1ms each — tens of seconds across a 16k
        # corpus); one precomputed cumsum + searchsorted is the same
        # distribution at ~100x the rate (different draw stream, so
        # corpora differ from pre-round-5 captures — same protocol).
        return np.searchsorted(zipf_cum, rng.rand(size)).astype(np.int64)

    # Clustered corpus: each cluster is a base set plus mutations at graded
    # similarity (Jaccard roughly 0.3..0.95 to the base), so exact top-k
    # ground truth consists of genuinely similar sets — the regime the
    # reference's benchmark datasets (Open Data / WDC web tables) exhibit.
    cluster_size = 20
    sets = []
    while len(sets) < n_sets:
        base_size = max(
            8, int(rng.lognormal(np.log(mean_size), 0.5))
        )
        base = np.unique(zipf_draw(base_size))
        sets.append(base.astype(np.int64))
        n_members = min(cluster_size - 1, n_sets - len(sets))
        for j in range(n_members):
            keep_rate = rng.uniform(0.45, 0.98)
            keep = base[rng.rand(len(base)) < keep_rate]
            n_extra = max(1, int(len(base) * rng.uniform(0.02, 0.35)))
            extra = zipf_draw(n_extra)
            sets.append(np.union1d(keep, extra).astype(np.int64))
    sets = sets[:n_sets]
    order = rng.permutation(n_sets)
    sets = [sets[i] for i in order]
    keys = list(range(len(sets)))
    q_idx = rng.choice(len(sets), size=n_queries, replace=False)
    query_sets = [sets[i] for i in q_idx]
    query_keys = [int(i) for i in q_idx]
    return sets, keys, query_sets, query_keys


def sets_to_docs(sets):
    """Encode int64 set elements as 8-byte little-endian byte tokens.

    The shared corpus representation for every benchmark — width and
    endianness must match across scripts for results to be comparable.
    Tokens come from one contiguous ``tobytes`` buffer per set (bytes
    slices are byte-identical to ``int.to_bytes(8, "little")`` but ~4x
    faster across a 16k-set corpus on this 1-core host).
    """
    docs = []
    for s in sets:
        buf = np.ascontiguousarray(s, dtype="<i8").tobytes()
        docs.append([buf[i:i + 8] for i in range(0, len(buf), 8)])
    return docs


def exact_jaccard(q: np.ndarray, s: np.ndarray) -> float:
    inter = np.intersect1d(q, s, assume_unique=True).shape[0]
    if inter == 0:
        return 0.0
    return inter / (len(q) + len(s) - inter)


def exact_topk(sets, query_sets, k: int):
    """Exact linear-scan ground truth (reference exact.py protocol).

    Returns (results, times): results[i] is a list of (key, similarity)
    sorted descending, times[i] the per-query wall time.
    """
    results, times = [], []
    for q in query_sets:
        t0 = time.perf_counter()
        sims = np.array([exact_jaccard(q, s) for s in sets])
        top = np.argsort(-sims)[:k]
        times.append(time.perf_counter() - t0)
        results.append([(int(i), float(sims[i])) for i in top])
    return results, times


def _sets_csr(sets, vocab):
    """Binary CSR incidence matrix [len(sets), vocab] of unique-token sets."""
    import scipy.sparse as sp

    lens = np.fromiter((len(s) for s in sets), dtype=np.int64,
                       count=len(sets))
    indptr = np.concatenate([[0], np.cumsum(lens)])
    indices = (np.concatenate(sets) if len(sets)
               else np.empty(0, np.int64))
    return sp.csr_matrix(
        (np.ones(len(indices), np.float64), indices, indptr),
        shape=(len(sets), vocab),
    )


def exact_topk_sparse(sets, query_sets, k: int):
    """Exact top-k ground truth via one sparse matmul.

    Same results as ``exact_topk`` (intersection sizes are exact integer
    counts; Jaccard from the inclusion-exclusion identity) without its
    per-pair ``np.intersect1d`` python loop — 64 queries over a 16k-set
    corpus drop from ~15s to <1s on this 1-core host. ``exact_topk``
    stays for rows that REPORT per-query exact-scan latency; this is for
    ground truth, where only the result matters. Ties are broken by
    lowest key (deterministic), matching what a stable descending sort
    of the dense scan produces."""
    if not query_sets:
        return []
    vocab = int(max(int(np.max(s)) for s in list(sets) + list(query_sets)
                    if len(s))) + 1  # max(), not s[-1]: sorted order is
    # not part of these helpers' contract
    A = _sets_csr(sets, vocab)
    Q = _sets_csr(query_sets, vocab)
    inter = np.asarray((A @ Q.T).todense())  # [n_sets, n_q] exact counts
    set_sz = np.fromiter((len(s) for s in sets), np.float64, len(sets))
    q_sz = np.fromiter((len(q) for q in query_sets), np.float64,
                       len(query_sets))
    union = set_sz[:, None] + q_sz[None, :] - inter
    sims = np.where(union > 0, inter / np.maximum(union, 1.0), 0.0)
    results = []
    for j in range(sims.shape[1]):
        col = sims[:, j]
        top = np.argpartition(-col, min(k, len(col) - 1))[:k]
        top = top[np.lexsort((top, -col[top]))]
        results.append([(int(i), float(col[i])) for i in top])
    return results


def exact_containment_sparse(sets, query_sets, threshold: float):
    """Exact containment ground truth (one sparse matmul): per query q,
    ``{j : |q & sets[j]| / |q| >= threshold}``."""
    if not query_sets:
        return []
    vocab = int(max(int(np.max(s)) for s in list(sets) + list(query_sets)
                    if len(s))) + 1  # max(), not s[-1]: sorted order is
    # not part of these helpers' contract
    A = _sets_csr(sets, vocab)
    Q = _sets_csr(query_sets, vocab)
    inter = np.asarray((A @ Q.T).todense())
    q_sz = np.fromiter((max(len(q), 1) for q in query_sets), np.float64,
                       len(query_sets))
    cont = inter / q_sz[None, :]
    return [set(np.flatnonzero(cont[:, j] >= threshold).tolist())
            for j in range(cont.shape[1])]


def compute_recalls(results, ground_truths):
    """recall@k against the exact run (reference utils.py:207-221)."""
    recalls = []
    for res, gt in zip(results, ground_truths):
        gt_keys = set(k for k, _ in gt)
        found = sum(1 for k, _ in res if k in gt_keys)
        recalls.append(found / len(gt_keys) if gt_keys else 1.0)
    return recalls


def compute_similarities(results):
    return [[s for _, s in res] for res in results]


def init_results_db(path: str) -> sqlite3.Connection:
    """Results schema mirroring reference utils.py:137-160."""
    conn = sqlite3.connect(path)
    conn.execute(
        """CREATE TABLE IF NOT EXISTS runs (
            key INTEGER PRIMARY KEY,
            name TEXT, k INTEGER, threshold REAL, params TEXT,
            indexing_time REAL, mean_query_time REAL, mean_recall REAL,
            ts DATETIME DEFAULT CURRENT_TIMESTAMP)"""
    )
    conn.execute(
        """CREATE TABLE IF NOT EXISTS query_results (
            run_key INTEGER, query_key INTEGER,
            result TEXT, time REAL)"""
    )
    conn.commit()
    return conn


def save_run(conn, name, k, threshold, params, indexing_time, times, recalls,
             results, query_keys):
    cur = conn.execute(
        "INSERT INTO runs (name, k, threshold, params, indexing_time, "
        "mean_query_time, mean_recall) VALUES (?, ?, ?, ?, ?, ?, ?)",
        (
            name,
            k,
            threshold,
            json.dumps(params),
            indexing_time,
            float(np.mean(times)),
            float(np.mean(recalls)) if recalls else None,
        ),
    )
    run_key = cur.lastrowid
    conn.executemany(
        "INSERT INTO query_results VALUES (?, ?, ?, ?)",
        [
            (run_key, qk, json.dumps(res), t)
            for qk, res, t in zip(query_keys, results, times)
        ],
    )
    conn.commit()
    return run_key

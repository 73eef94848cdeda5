"""Top-k Jaccard search benchmark: exact / TpuMinHashLSH / Forest / HNSW.

Port of ``/root/reference/benchmark/indexes/jaccard/topk_benchmark.py``
(sweep at lines 70-128): every index's results are scored as recall@k
against the exact linear-scan run, with per-query wall times, persisted to
SQLite. Datasets are synthetic (see utils.generate_sets).

Usage: python benchmarks/jaccard_topk.py [n_sets] [out.db]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from benchmarks import utils  # noqa: E402


def build_minhashes(sets, num_perm):
    from datasketch_tpu import MinHash

    docs = utils.sets_to_docs(sets)
    t0 = time.perf_counter()
    mhs = MinHash.bulk(docs, num_perm=num_perm)
    return mhs, time.perf_counter() - t0


def bench_tpu_lsh(mhs, query_idx, k, num_perm, method="bands",
                  pipelined=False):
    from datasketch_tpu.models.tpu_lsh import TpuMinHashLSH

    # top-k tuning: low banding threshold casts a wide candidate net and the
    # fused device rerank restores precision (the reference harness likewise
    # grid-sweeps (b, r); thr=0.15 -> b=51, r=2 here)
    index = TpuMinHashLSH(threshold=0.15, num_perm=num_perm, bucket_cap=512)
    t0 = time.perf_counter()
    index.index(list(range(len(mhs))), mhs)
    indexing = time.perf_counter() - t0

    queries = [mhs[i] for i in query_idx]
    index.top_k(queries, k, method=method)  # warm the query program
    if pipelined:
        # continuous serving: 16 batches in flight amortize the
        # dispatch+fetch round trip (top_k_stream, async D2H copies)
        n_rep = 16
        t0 = time.perf_counter()
        reps = list(index.top_k_stream([queries] * n_rep, k, method=method))
        total = (time.perf_counter() - t0) / n_rep
        batch = reps[0]
    else:
        t0 = time.perf_counter()
        batch = index.top_k(queries, k, method=method)
        total = time.perf_counter() - t0
    times = [total / len(queries)] * len(queries)
    results = [[(key, score) for key, score in row] for row in batch]
    return results, times, indexing


def bench_forest(mhs, query_idx, k, num_perm):
    from datasketch_tpu import MinHashLSHForest

    forest = MinHashLSHForest(num_perm=num_perm)
    t0 = time.perf_counter()
    for i, m in enumerate(mhs):
        forest.add(i, m)
    forest.index()
    indexing = time.perf_counter() - t0

    results, times = [], []
    for i in query_idx:
        t0 = time.perf_counter()
        keys = forest.query(mhs[i], k)
        times.append(time.perf_counter() - t0)
        results.append([(key, mhs[i].jaccard(mhs[key])) for key in keys])
    return results, times, indexing


def bench_hnsw(mhs, query_idx, k, num_perm, m=16, ef=100):
    from datasketch_tpu import HNSW

    def jaccard_distance(x, y):
        return 1.0 - float(np.mean(x == y))

    def batch_jaccard_distance(q, pts):
        # one vectorized pass per beam frontier instead of per-edge calls
        return 1.0 - (np.asarray(pts) == q).mean(axis=1)

    index = HNSW(
        distance_func=jaccard_distance,
        batch_distance_func=batch_jaccard_distance,
        m=m,
        ef_construction=ef,
    )
    t0 = time.perf_counter()
    for i, mh in enumerate(mhs):
        index.insert(i, np.asarray(mh.hashvalues))
    indexing = time.perf_counter() - t0

    index.query(np.asarray(mhs[query_idx[0]].hashvalues), k=k, ef=ef)  # warm
    results, times = [], []
    for i in query_idx:
        t0 = time.perf_counter()
        found = index.query(np.asarray(mhs[i].hashvalues), k=k, ef=ef)
        times.append(time.perf_counter() - t0)
        results.append([(key, 1.0 - d) for key, d in found])
    return results, times, indexing


def bench_hnsw_tpu(mhs, query_idx, k, num_perm, m=16, ef=100):
    """Same graph as bench_hnsw, but queried on device (batched beam)."""
    from datasketch_tpu import HNSW
    from datasketch_tpu.ops import hnsw_ops

    def jaccard_distance(x, y):
        return 1.0 - float(np.mean(x == y))

    def batch_jaccard_distance(q, pts):
        return 1.0 - (np.asarray(pts) == q).mean(axis=1)

    index = HNSW(
        distance_func=jaccard_distance,
        batch_distance_func=batch_jaccard_distance,
        m=m,
        ef_construction=ef,
    )
    t0 = time.perf_counter()
    for i, mh in enumerate(mhs):
        index.insert(i, np.asarray(mh.hashvalues).astype(np.uint32))
    graph = hnsw_ops.export_graph(index)
    indexing = time.perf_counter() - t0

    queries = np.stack(
        [np.asarray(mhs[i].hashvalues).astype(np.uint32) for i in query_idx]
    )
    hnsw_ops.batch_query(graph, queries, k=k, ef=ef, metric="minhash_jaccard")
    t0 = time.perf_counter()
    batch = hnsw_ops.batch_query(
        graph, queries, k=k, ef=ef, metric="minhash_jaccard"
    )
    total = time.perf_counter() - t0
    times = [total / len(queries)] * len(queries)
    results = [[(key, 1.0 - d) for key, d in row] for row in batch]
    return results, times, indexing


def bench_nsw_tpu(mhs, query_idx, k, num_perm, m=16, ef=100):
    """Fully device-built index: exact kNN graph + NSW beam (no host loop)."""
    from datasketch_tpu.ops import hnsw_ops, knn_graph

    pts = np.stack([np.asarray(mh.hashvalues).astype(np.uint32) for mh in mhs])
    t0 = time.perf_counter()
    graph = knn_graph.build_nsw_graph(
        pts, m=m, metric="minhash_jaccard", tile=256
    )
    # dependent fetch, not block_until_ready: the build's H2D uploads are
    # speculated complete through the tunnel (see utils/profiling)
    from datasketch_tpu.utils.profiling import device_sync

    device_sync([graph.adj0])
    indexing = time.perf_counter() - t0

    queries = pts[query_idx]
    hnsw_ops.batch_query(graph, queries, k=k, ef=ef, metric="minhash_jaccard")
    t0 = time.perf_counter()
    batch = hnsw_ops.batch_query(
        graph, queries, k=k, ef=ef, metric="minhash_jaccard"
    )
    total = time.perf_counter() - t0
    times = [total / len(queries)] * len(queries)
    results = [[(key, 1.0 - d) for key, d in row] for row in batch]
    return results, times, indexing


def main():
    n_sets = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    db_path = sys.argv[2] if len(sys.argv) > 2 else "topk_results.db"
    num_perm, k, n_queries = 128, 10, 50

    from benchmarks import datasets

    if datasets.dataset_path():
        # real corpus from ekzhu/set-similarity-search-benchmark (local
        # copy via DATASKETCH_BENCH_DATA); keys are positional
        sets, _, query_sets, query_keys = datasets.load_benchmark_sets(
            n_queries=n_queries, max_sets=n_sets
        )
        print(f"dataset: {datasets.dataset_path()} ({len(sets)} sets)")
        n_sets = len(sets)
    else:
        sets, keys, query_sets, query_keys = utils.generate_sets(
            n_sets=n_sets, n_queries=n_queries
        )
    query_idx = query_keys

    print(f"corpus: {n_sets} sets; exact ground truth (k={k})...")
    gt, exact_times = utils.exact_topk(sets, query_sets, k)
    conn = utils.init_results_db(db_path)
    utils.save_run(conn, "exact", k, None, {}, 0.0, exact_times,
                   [1.0] * len(gt), gt, query_keys)

    mhs, sig_time = build_minhashes(sets, num_perm)
    print(f"signatures: {n_sets} in {sig_time:.3f}s "
          f"({n_sets / sig_time:.0f}/s)")

    for name, fn, params in [
        ("tpu_lsh", bench_tpu_lsh, {"num_perm": num_perm}),
        ("tpu_scan", bench_tpu_lsh, {"num_perm": num_perm, "method": "scan"}),
        ("tpu_scan_stream", bench_tpu_lsh,
         {"num_perm": num_perm, "method": "scan", "pipelined": True}),
        ("lshforest", bench_forest, {"num_perm": num_perm}),
        ("hnsw", bench_hnsw, {"num_perm": num_perm, "m": 16, "ef": 100}),
        ("hnsw_tpu", bench_hnsw_tpu, {"num_perm": num_perm, "m": 16, "ef": 100}),
        ("nsw_tpu", bench_nsw_tpu, {"num_perm": num_perm, "m": 16, "ef": 100}),
    ]:
        extra = {kk: v for kk, v in params.items() if kk != "num_perm"}
        results, times, indexing = fn(mhs, query_idx, k, num_perm, **extra)
        recalls = utils.compute_recalls(results, gt)
        utils.save_run(conn, name, k, None, params, indexing, times, recalls,
                       results, query_keys)
        print(
            f"{name:10s} recall@{k}={np.mean(recalls):.3f} "
            f"mean_q={np.mean(times) * 1000:.2f}ms "
            f"p90_q={np.percentile(times, 90) * 1000:.2f}ms "
            f"index={indexing:.2f}s"
        )
    print(f"exact      mean_q={np.mean(exact_times) * 1000:.2f}ms")
    print(f"results -> {db_path}")


if __name__ == "__main__":
    main()

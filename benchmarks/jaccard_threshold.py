"""Threshold-query benchmark: MinHashLSH / TpuMinHashLSH / MinHashLSHBloom.

Ports two reference protocols:
- LSH precision/recall at a Jaccard threshold vs exact ground truth
  (``/root/reference/docs/lsh.rst:67-77`` metrics);
- LSH vs LSHBloom duplicate detection
  (``/root/reference/benchmark/indexes/jaccard/compare_lsh_vs_lshbloom.py:12-35``).

Usage: python benchmarks/jaccard_threshold.py [n_sets] [threshold]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from benchmarks import utils  # noqa: E402


def exact_threshold(sets, query_sets, threshold):
    out = []
    for q in query_sets:
        hits = set()
        for j, s in enumerate(sets):
            if utils.exact_jaccard(q, s) >= threshold:
                hits.add(j)
        out.append(hits)
    return out


def prf(found_sets, truth_sets):
    ps, rs = [], []
    for found, truth in zip(found_sets, truth_sets):
        if found:
            ps.append(len(found & truth) / len(found))
        if truth:
            rs.append(len(found & truth) / len(truth))
    p, r = float(np.mean(ps or [1.0])), float(np.mean(rs or [1.0]))
    f = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f


def main():
    n_sets = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    num_perm, n_queries = 128, 50

    from datasketch_tpu import MinHash, MinHashLSH, MinHashLSHBloom
    from datasketch_tpu.models.tpu_lsh import TpuMinHashLSH

    from benchmarks import datasets

    if datasets.dataset_path():
        sets, keys, query_sets, query_keys = datasets.load_benchmark_sets(
            n_queries=n_queries, max_sets=n_sets
        )
        print(f"dataset: {datasets.dataset_path()} ({len(sets)} sets)")
        n_sets = len(sets)
    else:
        sets, keys, query_sets, query_keys = utils.generate_sets(
            n_sets=n_sets, n_queries=n_queries
        )
    truth = exact_threshold(sets, query_sets, threshold)

    docs = utils.sets_to_docs(sets)
    mhs = MinHash.bulk(docs, num_perm=num_perm)
    queries = [mhs[i] for i in query_keys]

    # --- host MinHashLSH (candidates only, reference semantics) ------------
    lsh = MinHashLSH(threshold=threshold, num_perm=num_perm)
    t0 = time.perf_counter()
    with lsh.insertion_session() as session:
        for i, m in enumerate(mhs):
            session.insert(i, m)
    t_index = time.perf_counter() - t0
    t0 = time.perf_counter()
    found = [set(lsh.query(m)) for m in queries]
    t_query = (time.perf_counter() - t0) / len(queries)
    p, r, f = prf(found, truth)
    print(f"lsh        P={p:.3f} R={r:.3f} F1={f:.3f} "
          f"q={1000 * t_query:.2f}ms index={t_index:.2f}s")

    # --- device TpuMinHashLSH (with fused rerank) ---------------------------
    tpu = TpuMinHashLSH(threshold=threshold, num_perm=num_perm, bucket_cap=256)
    t0 = time.perf_counter()
    tpu.index(list(range(len(mhs))), mhs)
    t_index = time.perf_counter() - t0
    tpu.query_batch(queries)  # warm
    t0 = time.perf_counter()
    res = tpu.query_batch(queries)
    t_query = (time.perf_counter() - t0) / len(queries)
    found = [set(row) for row in res]
    p, r, f = prf(found, truth)
    print(f"tpu_lsh    P={p:.3f} R={r:.3f} F1={f:.3f} "
          f"q={1000 * t_query:.2f}ms index={t_index:.2f}s "
          f"truncated={tpu.last_truncated}")

    # --- batched threshold vs top-k at equal batch size ---------------------
    # Both paths now finish on device (threshold_select / topk_fused); the
    # threshold path should be within ~2x of top-k queries/sec.
    tpu.top_k(queries, k=10)  # warm
    t0 = time.perf_counter()
    tpu.top_k(queries, k=10)
    t_topk = time.perf_counter() - t0
    t0 = time.perf_counter()
    tpu.query_batch(queries)
    t_thresh = time.perf_counter() - t0
    print(
        f"batched    threshold {len(queries) / t_thresh:.0f} q/s vs "
        f"top-k {len(queries) / t_topk:.0f} q/s "
        f"(ratio {t_thresh / t_topk:.2f}x)"
    )

    # --- LSHBloom membership (is-duplicate boolean) -------------------------
    bloom = MinHashLSHBloom(
        threshold=threshold, num_perm=num_perm, n=n_sets, fp=0.01
    )
    for m in mhs:
        bloom.insert(m)
    dup_rate = float(np.mean([bloom.query(m) for m in queries]))
    print(f"lshbloom   all-indexed-query hit rate={dup_rate:.3f} (expect 1.0)")


if __name__ == "__main__":
    main()

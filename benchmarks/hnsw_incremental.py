"""TpuHNSW incremental-insert benchmark: 1% appends vs full rebuild.

Measures the round-4 incremental link path (frozen-graph beam linking,
`TpuHNSW._append_batch`) against the alternative it replaces — a full
device rebuild — on the shared minhash-Jaccard protocol, the device
form of the reference's per-insert graph surgery
(`/root/reference/datasketch/hnsw.py:451-516`).

Reports:
- full build seconds for the base corpus (N points),
- append seconds for the final 1% (buffered `add` + explicit `flush`),
- the cost ratio (VERDICT r3 target: append 1% at <5% of rebuild cost),
- recall@k over the combined corpus for (a) the appended index and
  (b) a fresh full build on the identical corpus (target: within 1pt).

Usage: python benchmarks/hnsw_incremental.py [n_sets] [k]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from benchmarks import utils  # noqa: E402


def main() -> None:
    n_sets = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    num_perm, m, ef = 128, 16, 100
    n_new = max(1, n_sets // 100)  # the 1% increment
    n_base = n_sets - n_new
    n_queries = 64

    from datasketch_tpu import MinHash, TpuHNSW

    sets, keys, query_sets, _ = utils.generate_sets(
        n_sets=n_sets, n_queries=n_queries, seed=7
    )
    docs = utils.sets_to_docs(sets)
    sigs = MinHash.bulk_signatures(docs, num_perm=num_perm)
    q_sigs = MinHash.bulk_signatures(
        utils.sets_to_docs(query_sets), num_perm=num_perm
    )

    # exact ground truth by true Jaccard over the full corpus
    gt, _ = utils.exact_topk(sets, query_sets, k)

    def recall(index) -> float:
        rows = index.query_batch(q_sigs, k=k, ef=ef)
        hits = 0
        for qi, row in enumerate(rows):
            want = {kk for kk, _ in gt[qi]}
            hits += len(want & {kk for kk, _ in row})
        return hits / (len(rows) * k)

    # --- base build + 1% incremental append ------------------------------
    idx = TpuHNSW(distance_metric="minhash_jaccard", m=m, ef=ef)
    t0 = time.perf_counter()
    idx.index(keys[:n_base], sigs[:n_base])
    idx.query_batch(q_sigs[:1], k=1)  # force build completion
    build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(n_base, n_sets):
        idx.add(keys[i], sigs[i])
    idx.flush()
    idx.query_batch(q_sigs[:1], k=1)
    append_s = time.perf_counter() - t0
    r_inc = recall(idx)

    # --- the alternative: full rebuild on the identical corpus -----------
    fresh = TpuHNSW(distance_metric="minhash_jaccard", m=m, ef=ef)
    t0 = time.perf_counter()
    fresh.index(keys, sigs)
    fresh.query_batch(q_sigs[:1], k=1)
    rebuild_s = time.perf_counter() - t0
    r_fresh = recall(fresh)

    import jax

    print(json.dumps({
        "n_sets": n_sets,
        "n_appended": n_new,
        "build_base_seconds": round(build_s, 2),
        "append_1pct_seconds": round(append_s, 2),
        "full_rebuild_seconds": round(rebuild_s, 2),
        "append_cost_vs_rebuild": round(append_s / rebuild_s, 4),
        "recall_at_k_incremental": round(r_inc, 3),
        "recall_at_k_fresh_build": round(r_fresh, 3),
        "recall_delta": round(r_fresh - r_inc, 3),
        "k": k, "num_perm": num_perm, "m": m, "ef": ef,
        "device": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()

"""LSH vs LSHBloom duplicate-detection comparison.

Port of ``/root/reference/benchmark/indexes/jaccard/
compare_lsh_vs_lshbloom.py:12-35``: index 60% of a corpus, query the
remaining 40%, record per-key ``is_duplicated`` booleans for a keyed LSH
index and for LSHBloom at a sweep of bloom false-positive rates, then
report the agreement percentage per fp. The reference uses
wikipedia-simple via HuggingFace ``load_dataset`` (no egress here), so
the corpus is the benchmarks' standard synthetic clustered-set corpus;
everything else — threshold 0.8, num_perm 128, the fp sweep, the
``[key, is_duplicated]`` CSV columns — matches the reference protocol.

On top of the reference's agreement metric this also reports what the
sweep is FOR: bloom memory vs the keyed index, and insert/query
throughput of both device classes.

Usage: python benchmarks/lsh_vs_bloom.py [n_sets] [out_dir]
"""

from __future__ import annotations

import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from benchmarks import utils  # noqa: E402
from datasketch_tpu import MinHash, TpuMinHashLSH, TpuMinHashLSHBloom  # noqa: E402

SIM_THRESHOLD = 0.8
NUM_PERM = 128
FPS = [0.7, 0.5, 0.25, 0.1, 0.01, 0.001, 0.0001, 0.00001]
INSERT_SPLIT = 0.6


def write_rows(path: str, keys, flags) -> None:
    """The reference's CSV shape: one (key, is_duplicated) row per query."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        for k, dup in zip(keys, flags):
            w.writerow([k, bool(dup)])


def main():
    n_sets = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "."
    os.makedirs(out_dir, exist_ok=True)

    sets, _keys, _qs, _qk = utils.generate_sets(n_sets=n_sets, n_queries=1)
    sigs = MinHash.bulk_signatures(
        utils.sets_to_docs(sets), num_perm=NUM_PERM
    )
    split = int(n_sets * INSERT_SPLIT)
    insert_sigs, query_sigs = sigs[:split], sigs[split:]
    query_keys = list(range(split, n_sets))

    # --- keyed LSH side (banding only: LSHBloom has no rerank to agree with)
    lsh = TpuMinHashLSH(
        threshold=SIM_THRESHOLD, num_perm=NUM_PERM, rerank=False
    )
    t0 = time.perf_counter()
    lsh.index(list(range(split)), insert_sigs)
    t_lsh_insert = time.perf_counter() - t0
    lsh.query_batch(query_sigs[:8])  # warm the serving-shape compile
    t0 = time.perf_counter()
    rows = lsh.query_batch(query_sigs)
    t_lsh_query = time.perf_counter() - t0
    lsh_dup = np.array([len(r) > 0 for r in rows])
    write_rows(os.path.join(out_dir, "lsh.csv"), query_keys, lsh_dup)
    lsh_bytes = split * NUM_PERM * 4  # stored signature matrix
    print(
        f"lsh        insert {split / t_lsh_insert:9.0f} docs/s  query "
        f"{len(query_keys) / t_lsh_query:9.0f} q/s  mem {lsh_bytes:>12,d} B  "
        f"dup_rate {lsh_dup.mean():.3f}"
    )

    print(f"{'fp':>8} {'agree%':>7} {'bloom_B':>12} {'ins_docs/s':>11} "
          f"{'q/s':>9} {'dup_rate':>8}")
    for fp in FPS:
        bloom = TpuMinHashLSHBloom(
            threshold=SIM_THRESHOLD, num_perm=NUM_PERM, n=n_sets, fp=fp
        )
        t0 = time.perf_counter()
        bloom.insert_batch(list(insert_sigs))
        t_ins = time.perf_counter() - t0
        t0 = time.perf_counter()
        flags = bloom.query_batch(list(query_sigs))
        t_q = time.perf_counter() - t0
        write_rows(
            os.path.join(out_dir, f"lsh_bloom_{fp}.csv"), query_keys, flags
        )
        agree = float(np.mean(flags == lsh_dup))
        bloom_bytes = bloom.b * bloom.num_words * 4
        print(
            f"{fp:>8} {100 * agree:>6.1f}% {bloom_bytes:>12,d} "
            f"{split / t_ins:>11.0f} {len(query_keys) / t_q:>9.0f} "
            f"{float(np.mean(flags)):>8.3f}"
        )


if __name__ == "__main__":
    main()

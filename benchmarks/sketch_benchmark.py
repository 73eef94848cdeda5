"""Sketch accuracy/runtime sweeps.

Port of the reference's sketch benchmarks
(``/root/reference/benchmark/sketches/minhash_benchmark.py:19-55`` and
``hyperloglog_benchmark.py:35-44``): MinHash update runtime + Jaccard
absolute error vs num_perm, HLL update time + cardinality error vs p.
Prints a table instead of matplotlib figures.

Usage: python benchmarks/sketch_benchmark.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from benchmarks import utils  # noqa: E402,F401  (jit cache config)
from datasketch_tpu import HyperLogLog, MinHash  # noqa: E402


def minhash_sweep(num_perms=(16, 32, 64, 128, 256), n_items=5000, n_trials=5):
    print("== MinHash: runtime + |err| vs num_perm "
          f"({n_items} items, {n_trials} trials)")
    rng = np.random.RandomState(1)
    print(f"{'num_perm':>8} {'build_ms':>9} {'bulk_ms':>8} {'mean_abs_err':>12}")
    for p in num_perms:
        errs, times = [], []
        bulk_times = []
        for t in range(n_trials):
            a = [b"%d" % i for i in range(n_items)]
            b = [b"%d" % i for i in range(int(n_items * 0.3), n_items)]
            true_j = len(set(a) & set(b)) / len(set(a) | set(b))
            t0 = time.perf_counter()
            m1 = MinHash(num_perm=p)
            m1.update_batch(a)
            times.append(time.perf_counter() - t0)
            m2 = MinHash(num_perm=p)
            m2.update_batch(b)
            errs.append(abs(m1.jaccard(m2) - true_j))
            t0 = time.perf_counter()
            MinHash.bulk([a, b], num_perm=p)
            bulk_times.append(time.perf_counter() - t0)
        print(f"{p:>8} {1000 * np.median(times):>9.2f} "
              f"{1000 * np.median(bulk_times):>8.2f} {np.mean(errs):>12.4f}")


def hll_sweep(ps=(6, 8, 10, 12, 14, 16), n_items=5000, n_trials=5):
    print(f"== HyperLogLog: runtime + rel err vs p ({n_items} uniques)")
    print(f"{'p':>3} {'update_ms':>10} {'rel_err':>8}")
    for p in ps:
        errs, times = [], []
        for t in range(n_trials):
            items = [b"%d-%d" % (t, i) for i in range(n_items)]
            h = HyperLogLog(p=p)
            t0 = time.perf_counter()
            h.update_batch(items)
            times.append(time.perf_counter() - t0)
            errs.append(abs(h.count() - n_items) / n_items)
        print(f"{p:>3} {1000 * np.median(times):>10.2f} {np.mean(errs):>8.4f}")


if __name__ == "__main__":
    minhash_sweep()
    hll_sweep()

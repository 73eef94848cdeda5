"""Sketch accuracy/runtime sweeps.

Port of the reference's sketch benchmarks
(``/root/reference/benchmark/sketches/minhash_benchmark.py:19-55`` and
``hyperloglog_benchmark.py:35-44``): MinHash update runtime + Jaccard
absolute error vs num_perm, HLL update time + cardinality error vs p.
Prints a table instead of matplotlib figures.

Usage: python benchmarks/sketch_benchmark.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

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


def hll_bulk_sweep(p=12, n_docs=512, tokens_per_doc=400, n_trials=3):
    """HLL corpus sketching: sequential update_batch loop vs
    bulk_registers (one flattened scatter for the whole corpus)."""
    from datasketch_tpu.ops import hll_ops

    print(f"== HyperLogLog.bulk_registers: {n_docs} docs x {tokens_per_doc} "
          f"tokens, p={p}")
    docs = [
        [b"d%d-t%d" % (d, i) for i in range(tokens_per_doc)]
        for d in range(n_docs)
    ]
    seq_times, bulk_times = [], []
    HyperLogLog.bulk_registers(docs[:8], p=p)  # warm compile
    for _ in range(n_trials):
        t0 = time.perf_counter()
        for d in docs:
            h = HyperLogLog(p=p, device_mode="disable")
            h.update_batch(d)
        seq_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        regs = HyperLogLog.bulk_registers(docs, p=p)
        bulk_times.append(time.perf_counter() - t0)
    counts = np.asarray(hll_ops.count_batch(regs, p))
    err = float(np.mean(np.abs(counts - tokens_per_doc) / tokens_per_doc))
    t_seq, t_bulk = np.median(seq_times), np.median(bulk_times)
    print(f"sequential {t_seq * 1000:8.1f}ms  bulk {t_bulk * 1000:8.1f}ms "
          f"({t_seq / t_bulk:.1f}x)  rel_err {err:.4f}")


if __name__ == "__main__":
    minhash_sweep()
    hll_sweep()
    hll_bulk_sweep()

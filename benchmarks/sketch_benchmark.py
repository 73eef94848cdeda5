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


def scheme_sweep(num_perm=128, n_docs=512, tokens_per_doc=200, n_trials=3,
                 n_pairs=60):
    """Signature schemes head to head: kernel throughput + estimator
    error at equal num_perm (permutation = reference-compatible;
    oph / cminhash trade compatibility for device efficiency)."""
    import jax.numpy as jnp

    from datasketch_tpu.ops import cminhash, minhash_ops, oph

    print(f"== Signature schemes (num_perm={num_perm}, "
          f"{n_docs} docs x {tokens_per_doc} tokens)")
    rng = np.random.RandomState(5)
    hashes = rng.randint(
        0, 1 << 32, size=(n_docs, tokens_per_doc), dtype=np.uint64
    ).astype(np.uint32)
    lengths = np.full(n_docs, tokens_per_doc, dtype=np.int32)

    kernels = {
        "permutation": lambda h, l: minhash_ops.compute_signatures(
            h, l, 1, num_perm
        ),
        "oph": lambda h, l: oph.oph_signatures(h, l, num_perm, seed=1),
        "cminhash": lambda h, l: cminhash.cminhash_signatures(
            h, l, num_perm, seed=1
        ),
    }
    # estimator error on planted 1/3-jaccard pairs
    universe = rng.randint(
        0, 1 << 32, size=(n_pairs, 900), dtype=np.uint64
    ).astype(np.uint32)
    pair_h = np.zeros((2 * n_pairs, 600), np.uint32)
    pair_h[0::2] = universe[:, :600]
    pair_h[1::2] = universe[:, 300:]
    pair_l = np.full(2 * n_pairs, 600, dtype=np.int32)

    print(f"{'scheme':>12} {'kernel_ms':>10} {'docs_per_s':>11} "
          f"{'mean_abs_err':>12}")
    # stage inputs on device once: this sweep reports KERNEL time, and a
    # numpy input would re-upload every call — through the axon tunnel
    # those H2D-carrying dispatches are speculated complete
    # (block_until_ready lies; see utils/profiling.device_sync), so the
    # loop would time dispatch, not work
    from datasketch_tpu.utils.profiling import device_sync

    dev_hashes, dev_lengths = jnp.asarray(hashes), jnp.asarray(lengths)
    device_sync([dev_hashes, dev_lengths])
    for name, fn in kernels.items():
        out = fn(dev_hashes, dev_lengths)
        device_sync([out])
        best = float("inf")
        for _ in range(n_trials):
            t0 = time.perf_counter()
            device_sync([fn(dev_hashes, dev_lengths)])
            best = min(best, time.perf_counter() - t0)
        sigs = np.asarray(fn(pair_h, pair_l))
        est = (sigs[0::2] == sigs[1::2]).mean(axis=1)
        err = float(np.mean(np.abs(est - 1 / 3)))
        print(f"{name:>12} {best * 1000:10.1f} {n_docs / best:11,.0f} "
              f"{err:12.4f}")


if __name__ == "__main__":
    minhash_sweep()
    hll_sweep()
    hll_bulk_sweep()
    scheme_sweep()

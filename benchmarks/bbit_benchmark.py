"""b-bit MinHash: estimation accuracy vs b + compressed-scan throughput.

Port of the reference's b-bit accuracy sweep
(``/root/reference/benchmark/sketches/b_bit_minhash_benchmark.py``:
mean absolute Jaccard error of the Li & Koenig estimator vs b), plus
the TPU-native half the reference has no analogue for: exact-scan
top-k queries/sec over the PACKED corpus (:class:`TpuBBitIndex`) vs
the full-signature scan (:class:`TpuMinHashLSH` ``method='scan'``) at
equal corpus — the packed scan moves 32/s x fewer HBM bytes per query.

Usage: python benchmarks/bbit_benchmark.py [n_docs] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from benchmarks import utils  # noqa: E402,F401  (jit cache config)
from benchmarks.scale_benchmark import synth_signatures  # noqa: E402
from datasketch_tpu import MinHash, TpuBBitIndex, bBitMinHash  # noqa: E402


def accuracy_sweep(bits=(1, 2, 3, 4, 6, 8, 12, 16, 32), num_perm=128,
                   n_pairs=200):
    """Mean |estimate - true Jaccard| per b over random set pairs."""
    print(f"== b-bit estimator: mean |err| vs b ({n_pairs} pairs, "
          f"num_perm={num_perm})")
    rng = np.random.RandomState(2)
    pairs = []
    for _ in range(n_pairs):
        size = rng.randint(50, 300)
        overlap = rng.rand()
        common = [b"c%d" % i for i in rng.choice(100000, int(size * overlap),
                                                 replace=False)]
        a = common + [b"a%d" % i for i in range(size - len(common))]
        bset = common + [b"b%d" % i for i in range(size - len(common))]
        true_j = len(common) / (2 * size - len(common))
        ma = MinHash(num_perm=num_perm)
        ma.update_batch(a)
        mb = MinHash(num_perm=num_perm)
        mb.update_batch(bset)
        pairs.append((ma, mb, true_j))
    print(f"{'b':>3} {'mean_abs_err':>12} {'bytes/sig':>10}")
    for b in bits:
        errs = [
            abs(bBitMinHash(ma, b).jaccard(bBitMinHash(mb, b)) - tj)
            for ma, mb, tj in pairs
        ]
        from datasketch_tpu.ops import bbit_ops

        nbytes = bbit_ops.words_per_sig(num_perm, b) * 4
        print(f"{b:>3} {np.mean(errs):>12.4f} {nbytes:>10}")


def scan_throughput(n_docs=65536, n_queries=256, k=10, num_perm=128,
                    bits=(1, 2, 4, 8)):
    """Packed b-bit scan q/s + planted-duplicate recall vs the
    full-signature exact scan at equal corpus."""
    from datasketch_tpu import TpuMinHashLSH

    print(f"\n== compressed-scan serving: {n_docs} docs, "
          f"{n_queries}-query batches, k={k}")
    sigs, src, dst = synth_signatures(n_docs, num_perm)
    queries = sigs[dst[-n_queries:]]
    expect = src[-n_queries:]

    def timed(fn):
        fn()  # warm the serving-shape compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rows = fn()
            best = min(best, time.perf_counter() - t0)
        return rows, n_queries / best

    full = TpuMinHashLSH(threshold=0.5, num_perm=num_perm)
    full.index(list(range(n_docs)), sigs)
    rows, full_qps = timed(lambda: full.top_k(queries, k=k, method="scan"))
    full_rec = np.mean(
        [want in [kk for kk, _ in row] for want, row in zip(expect, rows)]
    )
    print(f"{'repr':>10} {'qps':>8} {'recall@10':>9} {'corpus_MB':>9}")
    print(f"{'full u32':>10} {full_qps:>8.1f} {full_rec:>9.3f} "
          f"{n_docs * num_perm * 4 / 1e6:>9.1f}")
    for b in bits:
        idx = TpuBBitIndex(b=b, num_perm=num_perm)
        idx.insert_batch(list(range(n_docs)), sigs)
        rows, qps = timed(lambda: idx.query_batch(queries, k))
        rec = np.mean(
            [want in row for want, row in zip(expect, rows)]
        )
        mb = n_docs * idx.width * 4 / 1e6
        print(f"{'b=%d' % b:>10} {qps:>8.1f} {rec:>9.3f} {mb:>9.1f}")


if __name__ == "__main__":
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    accuracy_sweep()
    scan_throughput(n_docs=n_docs, n_queries=n_queries)

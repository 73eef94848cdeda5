"""LSH Ensemble containment benchmark.

Port of ``/root/reference/benchmark/indexes/containment/
lshensemble_benchmark.py`` metrics: precision / recall / F1 of
containment-threshold queries vs exact containment, swept over num_part,
plus a Weighted MinHash accuracy check (BASELINE.md config #4).

Usage: python benchmarks/containment_benchmark.py [n_sets] [threshold]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from benchmarks import utils  # noqa: E402


def exact_containment(q: np.ndarray, s: np.ndarray) -> float:
    if len(q) == 0:
        return 0.0
    return np.intersect1d(q, s, assume_unique=True).shape[0] / len(q)


def main():
    n_sets = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8
    num_perm, n_queries = 128, 30

    from datasketch_tpu import MinHash, MinHashLSHEnsemble, WeightedMinHashGenerator

    sets, keys, query_sets, query_keys = utils.generate_sets(
        n_sets=n_sets, n_queries=n_queries, mean_size=120
    )
    # containment queries: subsets of corpus sets at random sample rates
    rng = np.random.RandomState(7)
    query_sets = []
    for qk in query_keys:
        s = sets[qk]
        take = rng.rand(len(s)) < rng.uniform(0.3, 1.0)
        q = s[take]
        query_sets.append(q if len(q) else s[:1])

    truth = []
    for q in query_sets:
        truth.append(
            {j for j, s in enumerate(sets) if exact_containment(q, s) >= threshold}
        )

    docs = utils.sets_to_docs(sets)
    mhs = MinHash.bulk(docs, num_perm=num_perm)
    q_docs = utils.sets_to_docs(query_sets)
    q_mhs = MinHash.bulk(q_docs, num_perm=num_perm)

    for num_part in (8, 16, 32):
        ens = MinHashLSHEnsemble(
            threshold=threshold, num_perm=num_perm, num_part=num_part
        )
        t0 = time.perf_counter()
        ens.index(
            [(i, m, len(s)) for i, (m, s) in enumerate(zip(mhs, sets))]
        )
        t_index = time.perf_counter() - t0
        t0 = time.perf_counter()
        found = [
            set(ens.query(qm, len(qs)))
            for qm, qs in zip(q_mhs, query_sets)
        ]
        t_query = (time.perf_counter() - t0) / len(q_mhs)
        ps = [len(f & t) / len(f) for f, t in zip(found, truth) if f]
        rs = [len(f & t) / len(t) for f, t in zip(found, truth) if t]
        p = float(np.mean(ps or [1.0]))
        r = float(np.mean(rs or [1.0]))
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        print(
            f"ensemble num_part={num_part:2d} P={p:.3f} R={r:.3f} F1={f1:.3f} "
            f"q={1000 * t_query:.2f}ms index={t_index:.2f}s"
        )

    # Device ensemble: stacked band probes vs the containment scan
    from datasketch_tpu import TpuMinHashLSHEnsemble

    dev = TpuMinHashLSHEnsemble(
        threshold=threshold, num_perm=num_perm, num_part=8
    )
    dev.index((i, mhs[i], len(sets[i])) for i in range(len(sets)))
    dev_queries = [(q_mhs[i], len(query_sets[i])) for i in range(len(q_mhs))]
    dev.query_batch(dev_queries)  # warm the serving compiles
    for dev_method in ("bands", "scan"):
        t0 = time.perf_counter()
        found = [
            set(f) for f in dev.query_batch(dev_queries, method=dev_method)
        ]
        t_query = (time.perf_counter() - t0) / len(dev_queries)
        ps = [len(f & t) / len(f) for f, t in zip(found, truth) if f]
        rs = [len(f & t) / len(t) for f, t in zip(found, truth) if t]
        p = float(np.mean(ps or [1.0]))
        r = float(np.mean(rs or [1.0]))
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        print(
            f"device {dev_method:>5s}     P={p:.3f} R={r:.3f} F1={f1:.3f} "
            f"q={1000 * t_query:.2f}ms trunc={dev.last_truncated}"
        )

    # Weighted MinHash accuracy (CWS, dim=10k)
    dim, n_pairs = 10000, 20
    gen = WeightedMinHashGenerator(dim, sample_size=128, seed=1)
    errs = []
    t0 = time.perf_counter()
    for i in range(n_pairs):
        v1 = np.abs(rng.randn(dim)) * (rng.rand(dim) < 0.02)
        v2 = v1 * rng.uniform(0.5, 1.5, dim) * (rng.rand(dim) < 0.8)
        true_j = np.minimum(v1, v2).sum() / np.maximum(v1, v2).sum()
        est = gen.minhash(v1).jaccard(gen.minhash(v2))
        errs.append(abs(est - true_j))
    dt = time.perf_counter() - t0
    print(
        f"weighted_minhash dim={dim} sample=128: mean_abs_err="
        f"{np.mean(errs):.4f} ({2 * n_pairs / dt:.0f} sketches/s)"
    )


if __name__ == "__main__":
    main()

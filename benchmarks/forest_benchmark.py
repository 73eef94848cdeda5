"""LSH Forest: host vs device top-k throughput + recall at matched config.

Mirrors the reference's top-k benchmark protocol
(``/root/reference/benchmark/indexes/jaccard/lshforest.py``): synthetic
Zipf-ish corpora, recall measured against exact MinHash-Jaccard ranking.

Usage: python benchmarks/forest_benchmark.py [n_docs] [n_queries]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from datasketch_tpu import MinHash, MinHashLSHForest, TpuMinHashLSHForest  # noqa: E402


def make_corpus(n_docs, vocab=50_000, seed=0):
    rng = np.random.RandomState(seed)
    docs = []
    for i in range(n_docs):
        size = rng.randint(30, 120)
        toks = (rng.zipf(1.5, size=size * 2) % vocab)[:size]
        docs.append([b"t%d" % t for t in set(toks.tolist())])
    return docs


def exact_topk(sigs, q_idx, k):
    q = sigs[q_idx]
    jac = (sigs == q[None, :]).mean(axis=1)
    return set(np.argsort(-jac)[:k].tolist())


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    k = 10
    num_perm, l = 128, 8

    print(f"corpus: {n_docs} docs, {n_q} queries, k={k}")
    docs = make_corpus(n_docs)
    t0 = time.time()
    sigs = MinHash.bulk_signatures(docs, num_perm=num_perm)
    print(f"signatures: {time.time() - t0:.2f}s")

    minhashes = [
        MinHash(num_perm=num_perm, hashvalues=sigs[i]) for i in range(n_docs)
    ]
    truth = [exact_topk(sigs, qi, k) for qi in range(n_q)]

    # host forest
    host = MinHashLSHForest(num_perm=num_perm, l=l)
    t0 = time.time()
    for i, m in enumerate(minhashes):
        host.add(i, m)
    host.index()
    t_host_build = time.time() - t0
    t0 = time.time()
    host_res = host.query_batch(minhashes[:n_q], k)
    t_host_q = time.time() - t0
    host_recall = np.mean(
        [len(set(r) & t) / k for r, t in zip(host_res, truth)]
    )

    # device forest
    dev = TpuMinHashLSHForest(num_perm=num_perm, l=l)
    t0 = time.time()
    dev.index(list(range(n_docs)), sigs)
    t_dev_build = time.time() - t0
    t0 = time.time()
    dev.query_batch(sigs[:n_q], k)  # warm the serving-shape compile
    t_compile = time.time() - t0
    t0 = time.time()
    dev_res = dev.query_batch(sigs[:n_q], k)
    t_dev_q = time.time() - t0
    print(f"device first-query compile: {t_compile:.1f}s")
    dev_recall = np.mean([len(set(r) & t) / k for r, t in zip(dev_res, truth)])

    print(
        f"host:   build {t_host_build:6.2f}s  query {n_q / t_host_q:8.0f} q/s"
        f"  recall@{k} {host_recall:.3f}"
    )
    print(
        f"device: build {t_dev_build:6.2f}s  query {n_q / t_dev_q:8.0f} q/s"
        f"  recall@{k} {dev_recall:.3f}  truncated={dev.last_truncated}"
    )
    print(
        f"speedup: query {t_host_q / t_dev_q:.1f}x, build "
        f"{t_host_build / t_dev_build:.1f}x"
    )


if __name__ == "__main__":
    main()

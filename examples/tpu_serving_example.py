"""Serving-scale pipeline on TPU: bulk signatures -> device index -> dedup.

The TPU-native path (no reference analogue): signature MATRIX construction
with no per-doc objects, a device-resident LSH index with fused reranked
queries, persistence, and a device-built ANN graph for top-k.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from datasketch_tpu import MinHash, TpuMinHashLSH


def main():
    rng = np.random.RandomState(0)
    vocab = [b"tok%d" % i for i in range(5000)]
    corpus = [
        [vocab[j] for j in rng.randint(0, len(vocab), size=80)]
        for _ in range(2000)
    ]
    corpus += [doc[:60] + [b"extra%d" % i for i in range(20)]
               for i, doc in enumerate(corpus[:50])]  # near-duplicates

    # 1. signature matrix: uint32[N, 128], one fused device pass per chunk
    sigs = MinHash.bulk_signatures(corpus, num_perm=128)

    # 2. device index: build once, query in batches
    index = TpuMinHashLSH(threshold=0.7, num_perm=128)
    index.index(list(range(len(corpus))), sigs)

    dup_rows = index.top_k(sigs[2000:2010], k=3)
    print("near-duplicates of the first 10 planted copies:")
    for i, row in enumerate(dup_rows):
        print(f"  copy {2000 + i}: {[(k, round(s, 2)) for k, s in row[:2]]}")

    # 2b. continuous serving: pipeline batches so each round trip
    # overlaps the next batches' compute + transfer (~3x the synchronous
    # queries/sec at 50-query batches)
    batches = [sigs[i : i + 50] for i in range(0, 500, 50)]
    n_hits = sum(len(rows) for rows in index.top_k_stream(batches, k=3))
    print("pipelined stream answered", n_hits, "queries")

    # 2c. health probe before admitting traffic (a wedged device HANGS
    # dispatches rather than raising; the probe is time-bounded)
    from datasketch_tpu.utils import device_healthcheck

    health = device_healthcheck(timeout=30.0)
    print("device health:", health["ok"],
          "latency %.1fms" % (1e3 * (health["latency_s"] or -1)))

    # 3. persistence round trip
    index.save("/tmp/serving_index.npz")
    restored = TpuMinHashLSH.load("/tmp/serving_index.npz")
    assert len(restored) == len(index)
    print("index persisted and restored:", len(restored), "keys")

    # 4. device-built ANN graph for top-k similarity search
    from datasketch_tpu.ops import hnsw_ops, knn_graph

    graph = knn_graph.build_nsw_graph(sigs, m=16, metric="minhash_jaccard")
    res = hnsw_ops.batch_query(graph, sigs[:3], k=5, ef=64,
                               metric="minhash_jaccard")
    print("graph top-5 for doc 0:", [(k, round(1 - d, 2)) for k, d in res[0]])


if __name__ == "__main__":
    main()

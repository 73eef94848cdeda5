"""Weighted MinHash examples (parity with /root/reference/examples/weighted_minhash_examples.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from datasketch_tpu import WeightedMinHashGenerator


def main():
    v1 = np.random.uniform(1, 10, 10)
    v2 = np.random.uniform(1, 10, 10)
    min_sum = np.sum(np.minimum(v1, v2))
    max_sum = np.sum(np.maximum(v1, v2))
    true_jaccard = float(min_sum) / float(max_sum)

    wmg = WeightedMinHashGenerator(10, 5)
    wm1, wm2 = wmg.minhash(v1), wmg.minhash(v2)
    print("Estimated weighted Jaccard is", wm1.jaccard(wm2))
    print("True weighted Jaccard is", true_jaccard)

    # Batched generation over a sparse matrix (device path).
    from scipy.sparse import csr_matrix

    X = csr_matrix(np.random.uniform(0, 4, (8, 10)))
    wms = wmg.minhash_many(X)
    print("Batch of", len([w for w in wms if w is not None]), "weighted sketches")

    # Device serving matrix (round 5): CSR weights -> device-resident
    # (k, t) batch -> indexed and queried without the sketches ever
    # leaving HBM. CSR input ships only (values, dim-indices) — on
    # tunnel-attached TPUs that is the end-to-end throughput lever
    # (~nnz/dim of the dense bytes).
    from datasketch_tpu import TpuMinHashLSH

    gen128 = WeightedMinHashGenerator(10, sample_size=128, seed=1)
    kt = gen128.minhash_many(X, out="device")  # int32[8, 128, 2] on device
    index = TpuMinHashLSH(threshold=0.5, num_perm=128)
    index.index(list(range(X.shape[0])), kt)
    hits = index.top_k(gen128.minhash_many(X[:2], out="device"), k=3)
    print("Weighted device top-3 for rows 0-1:", [[k for k, _ in row] for row in hits])


if __name__ == "__main__":
    main()

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


if __name__ == "__main__":
    main()

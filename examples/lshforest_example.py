"""LSH Forest example (parity with /root/reference/examples/lshforest_example.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from datasketch_tpu import MinHash, MinHashLSHForest

data1 = "minhash is a probabilistic data structure for estimating the similarity between datasets".split()
data2 = "minhash is a probability data structure for estimating the similarity between documents".split()
data3 = "minhash is probability data structure for estimating the similarity between documents".split()


def main():
    m1, m2, m3 = (MinHash(num_perm=128) for _ in range(3))
    m1.update_batch([d.encode("utf8") for d in data1])
    m2.update_batch([d.encode("utf8") for d in data2])
    m3.update_batch([d.encode("utf8") for d in data3])

    forest = MinHashLSHForest(num_perm=128)
    forest.add("m2", m2)
    forest.add("m3", m3)
    forest.index()

    print("m2 indexed:", "m2" in forest)
    print("Top 2 candidates for m1:", forest.query(m1, 2))


if __name__ == "__main__":
    main()

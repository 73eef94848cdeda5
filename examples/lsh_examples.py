"""LSH examples (parity with /root/reference/examples/lsh_examples.py),
plus the TPU-native device-resident index."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from datasketch_tpu import MinHash, MinHashLSH, WeightedMinHashGenerator
from datasketch_tpu.models.tpu_lsh import TpuMinHashLSH

set1 = set("minhash is a probabilistic data structure for estimating the similarity between datasets".split())
set2 = set("minhash is a probability data structure for estimating the similarity between documents".split())
set3 = set("minhash is probability data structure for estimating the similarity between documents".split())


def _mh(s):
    m = MinHash(num_perm=128)
    m.update_batch([d.encode("utf8") for d in s])
    return m


def eg1():
    m1, m2, m3 = _mh(set1), _mh(set2), _mh(set3)
    lsh = MinHashLSH(threshold=0.5, num_perm=128)
    lsh.insert("m2", m2)
    lsh.insert("m3", m3)
    print("Approximate neighbours of m1 (Jaccard > 0.5):", lsh.query(m1))


def eg2():
    mg = WeightedMinHashGenerator(10, 5)
    v1 = np.random.uniform(1, 10, 10)
    v2 = np.random.uniform(1, 10, 10)
    m1, m2 = mg.minhash(v1), mg.minhash(v2)
    lsh = MinHashLSH(threshold=0.1, num_perm=5)
    lsh.insert("m1", m1)
    print("Approximate neighbours of m2 (weighted Jaccard > 0.1):", lsh.query(m2))


def eg3():
    # Device-resident index: batched band lookup + fused Jaccard rerank.
    m1, m2, m3 = _mh(set1), _mh(set2), _mh(set3)
    index = TpuMinHashLSH(threshold=0.5, num_perm=128)
    index.index(["m2", "m3"], [m2, m3])
    print("TPU index, reranked with scores:",
          index.query_batch([m1], return_scores=True)[0])


if __name__ == "__main__":
    eg1()
    eg2()
    eg3()

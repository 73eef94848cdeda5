"""MinHash examples (parity with /root/reference/examples/minhash_examples.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from datasketch_tpu import MinHash

data1 = [
    "minhash", "is", "a", "probabilistic", "data", "structure", "for",
    "estimating", "the", "similarity", "between", "datasets",
]
data2 = [
    "minhash", "is", "a", "probability", "data", "structure", "for",
    "estimating", "the", "similarity", "between", "documents",
]


def eg1():
    m1, m2 = MinHash(), MinHash()
    m1.update_batch([d.encode("utf8") for d in data1])
    m2.update_batch([d.encode("utf8") for d in data2])
    print("Estimated Jaccard for data1 and data2 is", m1.jaccard(m2))

    s1, s2 = set(data1), set(data2)
    actual = float(len(s1 & s2)) / float(len(s1 | s2))
    print("Actual Jaccard for data1 and data2 is", actual)


def eg2():
    # Bulk signature construction — one fused device pass over the corpus.
    corpus = [[w.encode() for w in data1], [w.encode() for w in data2]] * 500
    mhs = MinHash.bulk(corpus, num_perm=128)
    print("Built", len(mhs), "signatures; m[0] vs m[1]:", mhs[0].jaccard(mhs[1]))


if __name__ == "__main__":
    eg1()
    eg2()

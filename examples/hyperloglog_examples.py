"""HyperLogLog examples (parity with /root/reference/examples/hyperloglog_examples.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from datasketch_tpu import HyperLogLog, HyperLogLogPlusPlus

data1 = ["hyperloglog", "is", "a", "probabilistic", "data", "structure",
         "for", "estimating", "the", "cardinality", "of", "dataset",
         "dataset", "a"]


def eg1():
    h = HyperLogLog()
    for d in data1:
        h.update(d.encode("utf8"))
    print("Estimated cardinality is", h.count())
    print("Actual cardinality is", len(set(data1)))


def eg2():
    hpp = HyperLogLogPlusPlus(p=14)
    hpp.update_batch([("item-%d" % i).encode() for i in range(100000)])
    print("HLL++ estimate for 100k uniques:", hpp.count())


if __name__ == "__main__":
    eg1()
    eg2()

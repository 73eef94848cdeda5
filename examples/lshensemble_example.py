"""LSH Ensemble example (parity with /root/reference/examples/lshensemble_example.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from datasketch_tpu import MinHash, MinHashLSHEnsemble

set1 = set("cat dog fish cow".split())
set2 = set("cat dog fish cow pig elephant lion tiger wolf bird human".split())
set3 = set(
    "cat dog car van train plane ship shark wale bird human computer"
    " laptop tablet phone".split()
)


def main():
    m1, m2, m3 = (MinHash(num_perm=128) for _ in range(3))
    m1.update_batch([d.encode("utf8") for d in set1])
    m2.update_batch([d.encode("utf8") for d in set2])
    m3.update_batch([d.encode("utf8") for d in set3])

    lshensemble = MinHashLSHEnsemble(threshold=0.8, num_perm=128, num_part=32)
    lshensemble.index(
        [("m2", m2, len(set2)), ("m3", m3, len(set3))]
    )
    print("m2 indexed:", "m2" in lshensemble)
    print("Sets with containment of set1 > 0.8:",
          list(lshensemble.query(m1, len(set1))))


if __name__ == "__main__":
    main()

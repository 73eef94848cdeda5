"""Degraded-mode serving: FailoverIndex keeps answering when the device dies.

The reference library has no failure handling; a device-resident index
adds a failure mode it never had — a wedged accelerator (or the tunnel
to a remote one) HANGS dispatches instead of raising. This example runs
the full lifecycle: healthy device serving, an out-of-band health probe
tripping the monitor, exact host-scan serving from the snapshot, and
explicit failback.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from datasketch_tpu import FailoverIndex, MinHash, TpuMinHashLSH
from datasketch_tpu.utils.health import HealthMonitor


def main():
    rng = np.random.RandomState(0)
    vocab = [b"tok%d" % i for i in range(3000)]
    corpus = [
        [vocab[j] for j in rng.randint(0, len(vocab), size=60)]
        for _ in range(500)
    ]
    sigs = MinHash.bulk_signatures(corpus, num_perm=128)
    mhs = [MinHash(num_perm=128, hashvalues=row) for row in sigs]

    index = TpuMinHashLSH(threshold=0.5, num_perm=128)
    index.index([f"doc{i}" for i in range(len(mhs))], mhs)

    # Wrap with a monitor. In production, call fo.check() on a timer
    # (its subprocess probe is killable even when a wedged dispatch
    # holds the GIL); max_failures=3 tolerates transient blips.
    fo = FailoverIndex(index, monitor=HealthMonitor(timeout=30.0,
                                                    max_failures=3))
    queries = mhs[:5]

    top = fo.top_k(queries, k=3)
    print("path:", fo.last_path, "| top-1 per query:",
          [row[0][0] for row in top])

    # Simulate the device wedging: trip the monitor directly (a real
    # deployment reaches this state after max_failures failed probes).
    fo.monitor.consecutive_failures = fo.monitor.max_failures
    print("unhealthy?", fo.serving_from_host)

    top = fo.top_k(queries, k=3)
    print("path:", fo.last_path, "| top-1 per query:",
          [row[0][0] for row in top])
    hits = fo.query(queries[0], threshold=0.5)
    print("threshold query (host):", hits[:3])

    # Device recovered (probes pass again): failback is explicit so a
    # flapping tunnel cannot re-wedge the replica behind your back.
    fo.resume_device()
    top = fo.top_k(queries, k=3)
    print("path after resume:", fo.last_path)
    print("status:", {k: v for k, v in fo.status().items() if k != "monitor"})


if __name__ == "__main__":
    main()

"""TpuMinHashLSHEnsemble — device-resident containment-threshold index.

The device form of :class:`datasketch_tpu.models.lshensemble.
MinHashLSHEnsemble` (reference: ``/root/reference/datasketch/
lshensemble.py:61``): same DP size-partitioner and per-x/q (b, r)
parameter tables, but each (partition, r) sub-index is a
:class:`~datasketch_tpu.models.tpu_lsh.TpuMinHashLSH` — bulk-built with one
device sort per band and probed with batched band-limited lookups.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable


import numpy as np

from datasketch_tpu.models.lshensemble import MinHashLSHEnsemble, optimal_partitions
from datasketch_tpu.models.tpu_lsh import TpuMinHashLSH

__all__ = ["TpuMinHashLSHEnsemble"]


class TpuMinHashLSHEnsemble(MinHashLSHEnsemble):
    """Containment index with device-resident sub-indexes.

    Constructor args mirror :class:`MinHashLSHEnsemble` (storage_config /
    prepickle are not applicable and rejected if passed).
    """

    def __init__(
        self,
        threshold: float = 0.9,
        num_perm: int = 128,
        num_part: int = 16,
        m: int = 8,
        weights: tuple = (0.5, 0.5),
        bucket_cap: int = 128,
    ) -> None:
        if threshold > 1.0 or threshold < 0.0:
            raise ValueError("threshold must be in [0.0, 1.0]")
        if num_part < 1:
            raise ValueError("num_part must be at least 1")
        if m < 2 or m > num_perm:
            raise ValueError("m must be in the range of [2, num_perm]")
        self.threshold = threshold
        self.h = num_perm
        self.m = m
        rs = self._init_optimal_params(weights)
        self.indexes = [
            {
                r: TpuMinHashLSH(
                    num_perm=num_perm,
                    params=(int(num_perm / r), r),
                    bucket_cap=bucket_cap,
                    rerank=False,
                )
                for r in rs
            }
            for _ in range(num_part)
        ]
        self.lowers = [None for _ in self.indexes]
        self.uppers = [None for _ in self.indexes]

    def index(self, entries: Iterable) -> None:
        """One-shot bulk build: size partitions by DP, then ONE device
        build per (partition, r) sub-index."""
        if not self.is_empty():
            raise ValueError("Cannot call index again on a non-empty index")
        entries = list(entries)
        if len(entries) == 0:
            raise ValueError("entries is empty")
        for _, _, size in entries:
            if size <= 0:
                raise ValueError("Set size must be positive")
        sizes, counts = np.array(
            sorted(Counter(e[2] for e in entries).most_common())
        ).T
        partitions = optimal_partitions(sizes, counts, len(self.indexes))
        for i, (lower, upper) in enumerate(partitions):
            self.lowers[i], self.uppers[i] = lower, upper
        entries.sort(key=lambda e: e[2])
        groups = [[] for _ in self.indexes]
        curr = 0
        for key, minhash, size in entries:
            if size > self.uppers[curr]:
                curr += 1
            groups[curr].append((key, minhash))
        for part, group in enumerate(groups):
            if not group:
                continue
            keys = [k for k, _ in group]
            mhs = [m for _, m in group]
            for r, sub in self.indexes[part].items():
                sub.index(keys, mhs)

    def query(self, minhash, size: int):
        """Yield candidate keys (containment >= threshold likely)."""
        for row in self.query_batch([(minhash, size)]):
            yield from row

    def query_batch(self, queries) -> list:
        """Batched containment query: ``queries`` is a list of
        (minhash, size) pairs; one device probe per (partition, b) group."""
        queries = list(queries)
        results = [set() for _ in queries]
        for i, index in enumerate(self.indexes):
            u = self.uppers[i]
            if u is None:
                continue
            # group queries by the (b, r) their x/q ratio selects
            by_param = {}
            for qi, (mh, size) in enumerate(queries):
                b, r = self._get_optimal_param(u, size)
                by_param.setdefault((int(b), int(r)), []).append(qi)
            for (b, r), qidx in by_param.items():
                sub = index[r]
                rows = sub.query_b([queries[qi][0] for qi in qidx], b)
                for qi, row in zip(qidx, rows):
                    results[qi] |= row
        return [list(r) for r in results]

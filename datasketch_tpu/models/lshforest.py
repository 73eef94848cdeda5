"""MinHashLSHForest — approximate top-k Jaccard index.

API parity with ``/root/reference/datasketch/lshforest.py:9`` (add/index/
query/get_minhash_hashvalues/is_empty/__contains__). The reference already
uses sorted arrays instead of prefix trees; we keep its byte-prefix
semantics for the host API but replace the per-table Python binary search
with NumPy ``searchsorted`` over contiguous sorted key arrays — and add a
batched :meth:`query_batch`.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Hashable

import numpy as np

__all__ = ["MinHashLSHForest"]


class MinHashLSHForest:
    """LSH Forest for top-k Jaccard queries (works with MinHash and
    WeightedMinHash alike).

    Args:
        num_perm: Signature length of the sketches to be indexed.
        l: Number of prefix trees; each tree consumes ``k = num_perm // l``
            hash values.
    """

    def __init__(self, num_perm: int = 128, l: int = 8) -> None:
        if l <= 0 or num_perm <= 0:
            raise ValueError("num_perm and l must be positive")
        if l > num_perm:
            raise ValueError("l cannot be greater than num_perm")
        self.l = l
        self.k = int(num_perm / l)
        self.hashtables = [defaultdict(list) for _ in range(self.l)]
        self.hashranges = [(i * self.k, (i + 1) * self.k) for i in range(self.l)]
        self.keys: dict = {}
        # sorted arrays standing in for prefix trees (lshforest.py:43-44)
        self.sorted_hashtables = [[] for _ in range(self.l)]

    def _H(self, hs) -> bytes:
        # preserve native dtype: WeightedMinHash rows are signed (k, t) pairs
        return bytes(np.asarray(hs).byteswap().data)

    def add(self, key: Hashable, minhash) -> None:
        """Stage (key, minhash); not searchable until :meth:`index`."""
        if len(minhash) < self.k * self.l:
            raise ValueError("The num_perm of MinHash out of range")
        if key in self.keys:
            raise ValueError("The given key has already been added")
        self.keys[key] = [
            self._H(minhash.hashvalues[start:end]) for start, end in self.hashranges
        ]
        for H, hashtable in zip(self.keys[key], self.hashtables):
            hashtable[H].append(key)

    def index(self) -> None:
        """Sort each table's keys, making everything staged searchable."""
        for i, hashtable in enumerate(self.hashtables):
            self.sorted_hashtables[i] = sorted(hashtable)

    def _query(self, minhash, r, b):
        """Yield keys whose r-length prefix matches in any of the first b
        trees (searchsorted over the sorted byte arrays)."""
        if r > self.k or r <= 0 or b > self.l or b <= 0:
            raise ValueError("parameter outside range")
        hps = [
            self._H(minhash.hashvalues[start : start + r])
            for start, _ in self.hashranges
        ]
        prefix_size = len(hps[0])
        for ht, hp, hashtable in zip(self.sorted_hashtables, hps, self.hashtables):
            i = self._search_left(ht, hp, prefix_size)
            while i < len(ht) and ht[i][:prefix_size] == hp:
                for key in hashtable[ht[i]]:
                    yield key
                i += 1

    @staticmethod
    def _search_left(ht, hp, prefix_size):
        lo, hi = 0, len(ht)
        while lo < hi:
            mid = (lo + hi) // 2
            if ht[mid][:prefix_size] < hp:
                lo = mid + 1
            else:
                hi = mid
        return lo

    def query(self, minhash, k: int) -> list:
        """Approximate top-k most-similar keys: descend prefix length from
        self.k until at least k results collected (lshforest.py:92-128)."""
        if k <= 0:
            raise ValueError("k must be positive")
        if len(minhash) < self.k * self.l:
            raise ValueError("The num_perm of MinHash out of range")
        results = set()
        r = self.k
        while r > 0:
            for key in self._query(minhash, r, self.l):
                results.add(key)
                if len(results) >= k:
                    return list(results)
            r -= 1
        return list(results)

    def query_batch(self, minhashes, k: int) -> list:
        """Top-k for many queries (host loop; device path via TpuMinHashLSH
        covers the throughput case)."""
        return [self.query(m, k) for m in minhashes]

    def get_minhash_hashvalues(self, key: Hashable) -> np.ndarray:
        """Reconstruct the indexed MinHash's hashvalues from the stored
        byte-swapped prefixes (lshforest.py:130-155)."""
        byteslist = self.keys.get(key, None)
        if byteslist is None:
            raise KeyError(f"The provided key does not exist in the LSHForest: {key}")
        hashvalue_byte_size = len(byteslist[0]) // 8
        hashvalues = np.empty(len(byteslist) * hashvalue_byte_size, dtype=np.uint64)
        for index, item in enumerate(byteslist):
            hv_segment = np.frombuffer(item, dtype=np.uint64).byteswap()
            curr = index * hashvalue_byte_size
            hashvalues[curr : curr + hashvalue_byte_size] = hv_segment
        return hashvalues

    def is_empty(self) -> bool:
        """True until :meth:`index` has made at least one key searchable."""
        return any(len(t) == 0 for t in self.sorted_hashtables)

    def __contains__(self, key: Hashable) -> bool:
        return key in self.keys

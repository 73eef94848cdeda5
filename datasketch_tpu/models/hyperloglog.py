"""HyperLogLog / HyperLogLog++ — cardinality sketches.

API parity with ``/root/reference/datasketch/hyperloglog.py:25,323``
(update, count, merge, union, digest, serialize/deserialize, pickle),
TPU-first batch path in :mod:`datasketch_tpu.ops.hll_ops` (scatter-max
updates, vectorized estimators, ``pmax`` merges). The HLL++ empirical bias
tables are the published constants from the Google HLL++ paper appendix,
shipped as a binary asset (``_hllpp_bias.npz``).
"""

from __future__ import annotations

import copy
import functools
import os
import struct
import warnings
from typing import Callable, Optional

import numpy as np

from datasketch_tpu.hashfunc import sha1_hash32, sha1_hash64

__all__ = ["HyperLogLog", "HyperLogLogPlusPlus"]


@functools.lru_cache(maxsize=1)
def _bias_tables():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_hllpp_bias.npz")
    data = np.load(path)
    thresholds = data["thresholds"]
    raw_estimate = {p: data[f"raw_estimate_{p}"] for p in range(4, 19)}
    bias = {p: data[f"bias_{p}"] for p in range(4, 19)}
    return thresholds, raw_estimate, bias


class HyperLogLog:
    """HyperLogLog sketch for one-pass cardinality estimation.

    Args:
        p: Precision in [4, 16]; the sketch keeps ``m = 2**p`` registers.
        reg: Optional existing register array (adopts its precision).
        hashfunc: Token hash returning an int encodable in 32 bits.
        hashobj: Deprecated no-op.
    """

    __slots__ = ("alpha", "hashfunc", "m", "max_rank", "p", "reg")

    _hash_range_bit = 32
    _hash_range_byte = 4

    def _get_alpha(self, p: int) -> float:
        if not (4 <= p <= 16):
            raise ValueError("p=%d should be in range [4 : 16]" % p)
        if p == 4:
            return 0.673
        if p == 5:
            return 0.697
        if p == 6:
            return 0.709
        return 0.7213 / (1.0 + 1.079 / (1 << p))

    def __init__(
        self,
        p: int = 8,
        reg: Optional[np.ndarray] = None,
        hashfunc: Callable = sha1_hash32,
        hashobj: Optional[object] = None,
    ):
        if reg is None:
            self.p = p
            self.m = 1 << p
            self.reg = np.zeros((self.m,), dtype=np.int8)
        else:
            if not isinstance(reg, np.ndarray):
                raise ValueError("The imported register must be a numpy.ndarray.")
            self.m = reg.size
            self.p = int(self.m).bit_length() - 1
            if 1 << self.p != self.m:
                raise ValueError(
                    "The imported register has incorrect size. Expect a power of 2."
                )
            self.reg = reg
        if not callable(hashfunc):
            raise ValueError("The hashfunc must be a callable.")
        if hashobj is not None:
            warnings.warn(
                "hashobj is deprecated, use hashfunc instead.",
                DeprecationWarning,
                stacklevel=2,
            )
        self.hashfunc = hashfunc
        self.alpha = self._get_alpha(self.p)
        self.max_rank = self._hash_range_bit - self.p

    def update(self, b) -> None:
        """Fold one value into the sketch: register[low p bits of hash]
        takes the max with the leading-zero rank of the remaining bits."""
        hv = self.hashfunc(b)
        reg_index = hv & (self.m - 1)
        bits = hv >> self.p
        self.reg[reg_index] = max(self.reg[reg_index], self._get_rank(bits))

    def update_batch(self, bs) -> None:
        """Vectorized multi-value update (TPU extension; the reference has
        no HLL batch path). Hashes on host, scatter-max on device for large
        batches, NumPy for small ones."""
        if self.hashfunc is sha1_hash32:
            from datasketch_tpu.hashfunc import batch_sha1_hash32

            hv = batch_sha1_hash32(list(bs)).astype(np.int64)
        else:
            hv = np.array([self.hashfunc(b) for b in bs], dtype=np.int64)
        if hv.size == 0:
            return
        idx = (hv & (self.m - 1)).astype(np.int64)
        bits = hv >> self.p
        # vectorized bit_length via float log2 is unsafe; use numpy trick
        ranks = self.max_rank - _np_bit_length(bits) + 1
        if np.any(ranks <= 0):
            raise ValueError(
                "Hash value overflow, maximum size is %d bits" % self.max_rank
            )
        np.maximum.at(self.reg, idx, ranks.astype(np.int8))

    def count(self) -> float:
        """Estimate the cardinality seen so far (with small/large-range
        corrections, hyperloglog.py:144-168)."""
        e = self.alpha * float(self.m**2) / np.sum(2.0 ** (-self.reg))
        small_range_threshold = (5.0 / 2.0) * self.m
        if abs(e - small_range_threshold) / small_range_threshold < 0.15:
            warnings.warn(
                "Warning: estimate is close to error correction threshold. "
                "Output may not satisfy HyperLogLog accuracy guarantee.",
                stacklevel=2,
            )
        if e <= small_range_threshold:
            num_zero = self.m - np.count_nonzero(self.reg)
            return self._linearcounting(num_zero)
        if e <= (1.0 / 30.0) * (1 << 32):
            return e
        return self._largerange_correction(e)

    def merge(self, other: "HyperLogLog") -> None:
        """Union with another sketch: elementwise register max."""
        if self.m != other.m or self.p != other.p:
            raise ValueError("Cannot merge HyperLogLog with different precisions.")
        self.reg = np.maximum(self.reg, other.reg)

    def digest(self) -> np.ndarray:
        return copy.copy(self.reg)

    def copy(self) -> "HyperLogLog":
        return self.__class__(reg=self.digest(), hashfunc=self.hashfunc)

    def is_empty(self) -> bool:
        return not np.any(self.reg)

    def clear(self) -> None:
        self.reg = np.zeros((self.m,), dtype=np.int8)

    def __len__(self) -> int:
        return len(self.reg)

    def __eq__(self, other) -> bool:
        return (
            type(self) is type(other)
            and self.p == other.p
            and self.m == other.m
            and np.array_equal(self.reg, other.reg)
        )

    def _get_rank(self, bits) -> int:
        rank = self.max_rank - int(bits).bit_length() + 1
        if rank <= 0:
            raise ValueError(
                "Hash value overflow, maximum size is %d bits" % self.max_rank
            )
        return rank

    def _linearcounting(self, num_zero):
        return self.m * np.log(self.m / float(num_zero))

    def _largerange_correction(self, e):
        return -(1 << 32) * np.log(1.0 - e / (1 << 32))

    @classmethod
    def union(cls, *hyperloglogs: "HyperLogLog") -> "HyperLogLog":
        if len(hyperloglogs) < 2:
            raise ValueError("Cannot union less than 2 HyperLogLog sketches")
        m = hyperloglogs[0].m
        if not all(h.m == m for h in hyperloglogs):
            raise ValueError("Cannot union HyperLogLog sketches with different precisions")
        reg = np.maximum.reduce([h.reg for h in hyperloglogs])
        return cls(reg=reg, hashfunc=hyperloglogs[0].hashfunc)

    def bytesize(self) -> int:
        """Serialized size: 1 byte for p + 1 byte per register."""
        return struct.calcsize("B") + struct.calcsize("B") * self.m

    def serialize(self, buf) -> None:
        """Binary layout parity with hyperloglog.py:280-287: ``B`` p then
        ``m`` register bytes."""
        if len(buf) < self.bytesize():
            raise ValueError(
                "The buffer does not have enough space for holding this HyperLogLog."
            )
        fmt = "B%dB" % self.m
        struct.pack_into(fmt, buf, 0, self.p, *self.reg)

    @classmethod
    def deserialize(cls, buf) -> "HyperLogLog":
        mv = memoryview(buf)
        p = struct.unpack_from("B", mv, 0)[0]
        h = cls(p)
        offset = struct.calcsize("B")
        h.reg = np.array(struct.unpack_from("%dB" % h.m, mv, offset), dtype=np.int8)
        return h

    def __getstate__(self):
        buf = bytearray(self.bytesize())
        self.serialize(buf)
        return buf

    def __setstate__(self, buf):
        mv = memoryview(buf)
        p = struct.unpack_from("B", mv, 0)[0]
        self.__init__(p=p)
        offset = struct.calcsize("B")
        self.reg = np.array(struct.unpack_from("%dB" % self.m, mv, offset), dtype=np.int8)


def _np_bit_length(x: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length() for nonnegative int64 arrays."""
    x = x.astype(np.uint64)
    n = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        y = x >> np.uint64(shift)
        big = y > 0
        n[big] += shift
        x = np.where(big, y, x)
    return n + (x > 0)


class HyperLogLogPlusPlus(HyperLogLog):
    """HyperLogLog++ (64-bit hashes, empirical bias correction,
    threshold-gated linear counting; hyperloglog.py:323-381).

    Extension over the reference (which explicitly omits it,
    ``/root/reference/datasketch/hyperloglog.py:331``): the paper's sparse
    representation (Heule et al. 2013, §5.3). With ``sparse=True`` the
    sketch stores ``(idx25, rank)`` pairs in a dict while small — counting
    by linear counting at 2^25 precision (near-exact for low cardinality)
    — and densifies automatically once the pair set outgrows the dense
    register array. Ranks are computed at dense precision so conversion
    is lossless; all public behavior (merge/serialize/pickle) transparently
    densifies first, keeping wire parity with the reference.
    """

    _hash_range_bit = 64
    _hash_range_byte = 8
    _P_SPARSE = 25

    def __init__(
        self,
        p: int = 8,
        reg: Optional[np.ndarray] = None,
        hashfunc: Callable = sha1_hash64,
        hashobj: Optional[object] = None,
        sparse: bool = False,
    ):
        super().__init__(p=p, reg=reg, hashfunc=hashfunc, hashobj=hashobj)
        self._sparse = sparse and reg is None
        # idx25 -> max dense rank; densify when it outgrows the register
        # array's footprint (dict entry ~= 8x an int8 register).
        self._sparse_items: Optional[dict] = {} if self._sparse else None
        self._sparse_max = max(16, self.m // 8)

    # ------------------------------------------------------------ sparse core

    def _sparse_add(self, idx25, ranks):
        items = self._sparse_items
        for i25, r in zip(idx25.tolist(), ranks.tolist()):
            prev = items.get(i25)
            if prev is None or r > prev:
                items[i25] = r
        if len(items) > self._sparse_max:
            self._to_dense()

    def _to_dense(self) -> None:
        """Lossless sparse -> dense conversion (ranks already dense)."""
        if not self._sparse:
            return
        items = self._sparse_items
        self._sparse = False
        self._sparse_items = None
        if items:
            idx25 = np.fromiter(items.keys(), dtype=np.int64, count=len(items))
            ranks = np.fromiter(items.values(), dtype=np.int8, count=len(items))
            np.maximum.at(self.reg, idx25 & (self.m - 1), ranks)

    @property
    def is_sparse(self) -> bool:
        return self._sparse

    def _get_threshold(self, p):
        return _bias_tables()[0][p - 4]

    def _estimate_bias(self, e, p):
        _, raw_estimate, bias = _bias_tables()
        estimate_vector = raw_estimate[p]
        nearest_neighbors = np.argsort((e - estimate_vector) ** 2)[:6]
        return np.mean(bias[p][nearest_neighbors])

    def update(self, b) -> None:
        if not self._sparse:
            super().update(b)
            return
        hv = self.hashfunc(b)
        rank = self._get_rank(hv >> self.p)
        i25 = int(hv & ((1 << self._P_SPARSE) - 1))
        prev = self._sparse_items.get(i25)
        if prev is None or rank > prev:
            self._sparse_items[i25] = rank
        if len(self._sparse_items) > self._sparse_max:
            self._to_dense()

    def update_batch(self, bs) -> None:
        """Vectorized update using the 64-bit default hash."""
        if self.hashfunc is sha1_hash64:
            from datasketch_tpu.hashfunc import batch_sha1_hash64

            hv = batch_sha1_hash64(list(bs))
        else:
            hv = np.array([self.hashfunc(b) for b in bs], dtype=np.uint64)
        if hv.size == 0:
            return
        idx = (hv & np.uint64(self.m - 1)).astype(np.int64)
        bits = (hv >> np.uint64(self.p)).astype(np.uint64)
        ranks = self.max_rank - _np_bit_length(bits) + 1
        if np.any(ranks <= 0):
            raise ValueError(
                "Hash value overflow, maximum size is %d bits" % self.max_rank
            )
        if self._sparse:
            idx25 = (hv & np.uint64((1 << self._P_SPARSE) - 1)).astype(np.int64)
            self._sparse_add(idx25, ranks.astype(np.int8))
            return
        np.maximum.at(self.reg, idx, ranks.astype(np.int8))

    def _dense_reg(self) -> np.ndarray:
        """Dense register view without mutating sparse state."""
        if not self._sparse:
            return self.reg
        reg = self.reg.copy()
        items = self._sparse_items
        if items:
            idx25 = np.fromiter(items.keys(), dtype=np.int64, count=len(items))
            ranks = np.fromiter(items.values(), dtype=np.int8, count=len(items))
            np.maximum.at(reg, idx25 & (self.m - 1), ranks)
        return reg

    def count(self) -> float:
        """Bias-corrected estimate (hyperloglog.py:369-381); in sparse mode,
        linear counting at 2^25 precision (Heule et al. §5.3)."""
        if self._sparse:
            m25 = float(1 << self._P_SPARSE)
            v = len(self._sparse_items)
            if v == 0:
                return 0.0
            return m25 * np.log(m25 / (m25 - v))
        num_zero = self.m - np.count_nonzero(self.reg)
        if num_zero > 0:
            lc = self._linearcounting(num_zero)
            if lc <= self._get_threshold(self.p):
                return lc
        e = self.alpha * float(self.m**2) / np.sum(2.0 ** (-self.reg))
        if e <= 5 * self.m:
            return e - self._estimate_bias(e, self.p)
        return e

    def merge(self, other: "HyperLogLog") -> None:
        if self._sparse and isinstance(other, HyperLogLogPlusPlus) and other._sparse:
            if self.m != other.m or self.p != other.p:
                raise ValueError(
                    "Cannot merge HyperLogLog with different precisions."
                )
            for i25, r in other._sparse_items.items():
                prev = self._sparse_items.get(i25)
                if prev is None or r > prev:
                    self._sparse_items[i25] = r
            if len(self._sparse_items) > self._sparse_max:
                self._to_dense()
            return
        self._to_dense()
        if isinstance(other, HyperLogLogPlusPlus) and other._sparse:
            if self.m != other.m or self.p != other.p:
                raise ValueError(
                    "Cannot merge HyperLogLog with different precisions."
                )
            np.maximum(self.reg, other._dense_reg(), out=self.reg)
            return
        super().merge(other)

    def digest(self) -> np.ndarray:
        return self._dense_reg().copy()

    def is_empty(self) -> bool:
        if self._sparse:
            return len(self._sparse_items) == 0
        return super().is_empty()

    def clear(self) -> None:
        super().clear()
        if self._sparse_items is not None:
            self._sparse_items = {}
            self._sparse = True

    def copy(self) -> "HyperLogLogPlusPlus":
        new = HyperLogLogPlusPlus(
            p=self.p, hashfunc=self.hashfunc, sparse=self._sparse
        )
        new.reg = self.reg.copy()
        if self._sparse:
            new._sparse_items = dict(self._sparse_items)
        return new

    def __eq__(self, other) -> bool:
        return (
            type(self) is type(other)
            and self.p == other.p
            and self.m == other.m
            and np.array_equal(self._dense_reg(), other._dense_reg())
        )

    def serialize(self, buf) -> None:
        self._to_dense()
        super().serialize(buf)

    def __getstate__(self):
        self._to_dense()
        return super().__getstate__()

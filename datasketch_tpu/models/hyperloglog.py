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

    __slots__ = ("alpha", "device_mode", "hashfunc", "m", "max_rank", "p", "reg")

    _hash_range_bit = 32
    _hash_range_byte = 4
    # Below this many tokens the host scatter beats a device dispatch
    # (the HLL update is a pure scatter-max: far less arithmetic per token
    # than MinHash's permutation matrix, so the crossover sits higher).
    _DEVICE_BATCH_THRESHOLD = 1 << 15

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
        device_mode: str = "auto",
    ):
        if device_mode not in ("disable", "auto", "always"):
            raise ValueError("device_mode must be 'disable', 'auto' or 'always'")
        self.device_mode = device_mode
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
        if hashfunc == "device":
            # pre-tokenized integer streams: fmix32 (or the limb-pair
            # mix64 for the 64-bit HLL++ range), vectorized host twin of
            # the on-device mix (HLL updates are scatter-bound, so the
            # host never does per-token Python work either way)
            from datasketch_tpu.hashfunc import device_hash, device_hash64

            hashfunc = (
                device_hash64 if self._hash_range_bit == 64 else device_hash
            )
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
        batches (per ``device_mode``), NumPy for small ones."""
        from datasketch_tpu.hashfunc import device_hash

        if self.hashfunc is sha1_hash32:
            from datasketch_tpu.hashfunc import batch_sha1_hash32

            hv = batch_sha1_hash32(list(bs)).astype(np.int64)
        elif self.hashfunc is device_hash:
            from datasketch_tpu.ops.hashing import mix32_np

            hv = mix32_np(
                np.asarray(list(bs)).astype(np.uint32)
            ).astype(np.int64)
        else:
            hv = np.array([self.hashfunc(b) for b in bs], dtype=np.int64)
        if hv.size == 0:
            return
        if np.any((hv >> self._hash_range_bit) != 0):
            raise ValueError(
                "Hash value overflow, maximum size is %d bits" % self.max_rank
            )
        use_device = self.device_mode == "always" or (
            self.device_mode == "auto"
            and hv.size >= self._DEVICE_BATCH_THRESHOLD
        )
        if use_device:
            from datasketch_tpu.ops import hll_ops

            row = self._device_sketch_rows(
                hv.astype(np.uint64)[None, :],
                np.array([hv.size], dtype=np.int32),
            )
            np.maximum(self.reg, np.asarray(row)[0], out=self.reg)
            return
        # fused C scatter (index + bit_length rank + register max in one
        # pass); the range check above already guarantees rank >= 1, so
        # the in-place update cannot end in the overflow error state.
        # Only for stock int8 registers — a user-supplied reg= of any
        # other dtype/layout keeps the dtype-agnostic numpy path.
        if (
            self.reg.dtype == np.int8
            and self.reg.flags.c_contiguous
            and self.reg.flags.writeable
        ):
            from datasketch_tpu.native import corpus as _corpus

            if _corpus.hll_scatter(
                self.reg, np.ascontiguousarray(hv.astype(np.uint64)),
                np.array([hv.size], dtype=np.int64), self.p, self.max_rank,
            ) is not None:
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

    def _device_sketch_rows(self, hv: np.ndarray, lengths: np.ndarray):
        """Device register rows for padded uint64 hash rows [B, T].

        T is bucketed to a power of two here (no-op for callers that
        already pad): every distinct batch length would otherwise
        compile a fresh program through the remote-TPU path.
        """
        from datasketch_tpu.ops import hll_ops

        t = 128
        while t < hv.shape[1]:
            t *= 2
        if t != hv.shape[1]:
            hv = np.pad(hv, ((0, 0), (0, t - hv.shape[1])))
        if self._hash_range_bit == 64:
            hi = (hv >> np.uint64(32)).astype(np.uint32)
            lo = (hv & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            return hll_ops.sketch_batch64(hi, lo, lengths, self.p)
        return hll_ops.sketch_batch32(
            hv.astype(np.uint32), lengths, self.p
        )

    @classmethod
    def bulk_registers(cls, bs, **kwargs) -> np.ndarray:
        """Register MATRIX for a corpus: int8[N, 2**p], one device dispatch
        per chunk — the pipeline form of :meth:`bulk`, directly consumable
        by :func:`~datasketch_tpu.ops.hll_ops.count_batch` and
        ``datasketch_tpu.parallel.distributed_hll_union``. Token-hashing
        batches through native SHA-1/SHA-NI for the stock hashfuncs."""
        proto = cls(**kwargs)
        docs = bs if isinstance(bs, list) else list(bs)
        docs = [d if isinstance(d, list) else list(d) for d in docs]
        if not docs:
            return np.zeros((0, proto.m), dtype=np.int8)
        if proto.device_mode == "always":
            # device rows feed on-device pipelines (count_batch /
            # distributed_hll_union) without a host round trip
            from datasketch_tpu.hashfunc import device_hash64

            if proto.hashfunc is device_hash64:
                # 64-bit device hash: ship the RAW uint32 ids (4B/token)
                # and run the mix64 limb rounds on device — half the
                # upload of host-hashed uint64 values. Only valid when
                # every id fits 32 bits (the on-device mix zero-extends);
                # wider ids fall through to the host mix64_np path below,
                # keeping all paths bit-identical.
                arrays = [np.asarray(d, dtype=np.uint64) for d in docs]
                max_id = max(
                    (int(a.max()) for a in arrays if a.size), default=0
                )
                if max_id < (1 << 32):
                    from datasketch_tpu.ops import hll_ops

                    ids, lengths = _pad_pow2_ids(arrays, max_id=max_id)
                    rows = np.asarray(
                        hll_ops.sketch_batch64_ids(ids, lengths, proto.p)
                    )
                    return rows[: len(docs)]
            padded, lengths = proto._pad_hash_corpus(docs)
            rows = np.asarray(proto._device_sketch_rows(padded, lengths))
            return rows[: len(docs)]
        # host fast path: ONE flattened scatter-max over (doc, register)
        # pairs for the whole corpus — an HLL update is all scatter and no
        # arithmetic, so shipping it across the tunnel loses (measured
        # 0.5x); a single np.maximum.at wins even over the sequential loop
        import itertools

        lengths = np.fromiter(map(len, docs), np.int64, count=len(docs))
        flat_tokens = list(itertools.chain.from_iterable(docs))
        hv = proto._hash_flat(flat_tokens)
        regs = np.zeros((len(docs), proto.m), dtype=np.int8)
        # fused C scatter: one pass does doc-base indexing, bit_length
        # rank and the register max (the numpy pipeline below spent
        # ~65ms/1M tokens in np.repeat + frexp + np.maximum.at — ~45%
        # of bulk wall time on the bench host)
        from datasketch_tpu.native import corpus as _corpus

        min_rank = _corpus.hll_scatter(
            regs.reshape(-1), np.ascontiguousarray(hv, dtype=np.uint64),
            lengths, proto.p, proto.max_rank,
        )
        if min_rank is not None:
            if min_rank <= 0:
                raise ValueError(
                    "Hash value overflow, maximum size is %d bits"
                    % proto.max_rank
                )
            return regs
        # numpy fallback (extension unavailable): flat (doc, register)
        # scatter index built in uint64 end to end — the register index
        # rides the hash's low bits with the doc base pre-multiplied
        # before the repeat
        base = np.repeat(
            np.arange(len(docs), dtype=np.uint64) * np.uint64(proto.m),
            lengths,
        )
        flat_idx = base | (hv & np.uint64(proto.m - 1))
        bits = hv >> np.uint64(proto.p)
        ranks = proto.max_rank - _np_bit_length(bits) + 1
        if np.any(ranks <= 0):
            raise ValueError(
                "Hash value overflow, maximum size is %d bits" % proto.max_rank
            )
        np.maximum.at(regs.reshape(-1), flat_idx, ranks.astype(np.int8))
        return regs

    def _hash_flat(self, tokens: list) -> np.ndarray:
        """Hash a flat token list to uint64 via the native batch hasher
        when the hashfunc is stock."""
        from datasketch_tpu.hashfunc import sha1_hash64 as _sha64
        from datasketch_tpu.native import corpus

        if not tokens:
            return np.zeros(0, dtype=np.uint64)
        if self.hashfunc is sha1_hash32 and self._hash_range_bit == 32:
            return corpus.hash_tokens(tokens, corpus.ALGO_SHA1_32).astype(
                np.uint64
            )
        if self.hashfunc is _sha64 and self._hash_range_bit == 64:
            return corpus.hash_tokens(tokens, corpus.ALGO_SHA1_64)
        from datasketch_tpu.hashfunc import device_hash, device_hash64

        if self.hashfunc is device_hash:
            from datasketch_tpu.ops.hashing import mix32_np

            return mix32_np(
                np.asarray(tokens).astype(np.uint32)
            ).astype(np.uint64)
        if self.hashfunc is device_hash64:
            from datasketch_tpu.ops.hashing import mix64_np

            return mix64_np(np.asarray(tokens).astype(np.uint64))
        hv = np.array([self.hashfunc(t) for t in tokens], dtype=np.uint64)
        if np.any((hv >> np.uint64(self._hash_range_bit - 1)) >> 1 != 0):
            raise ValueError(
                "Hash value overflow, maximum size is %d bits" % self.max_rank
            )
        return hv

    @classmethod
    def bulk(cls, bs, **kwargs) -> list:
        """Compute many sketches at once (device batch path); the HLL
        analogue of ``MinHash.bulk``."""
        regs = cls.bulk_registers(bs, **kwargs)
        kwargs.pop("p", None)
        return [cls(reg=row.copy(), **kwargs) for row in regs]

    def _pad_hash_corpus(self, docs: list):
        """Hash + pad docs to uint64[B_pow2, T_pow2] + lengths (the same
        pow-of-two shape bucketing as MinHash bulk, to cap compile count)."""
        from datasketch_tpu.hashfunc import sha1_hash64 as _sha64
        from datasketch_tpu.native import corpus

        from datasketch_tpu.hashfunc import device_hash

        if self.hashfunc is sha1_hash32 and self._hash_range_bit == 32:
            algo = corpus.ALGO_SHA1_32
        elif self.hashfunc is _sha64 and self._hash_range_bit == 64:
            algo = corpus.ALGO_SHA1_64
        else:
            algo = None
        from datasketch_tpu.hashfunc import device_hash64

        if self.hashfunc is device_hash or self.hashfunc is device_hash64:
            # vectorized host mix; falls through to the shared T/B
            # pow-of-two bucketing below (compile-shape discipline)
            from datasketch_tpu.ops.hashing import mix32_np, mix64_np

            if self.hashfunc is device_hash64:
                hashed = [
                    mix64_np(np.asarray(d).astype(np.uint64)) for d in docs
                ]
            else:
                hashed = [
                    mix32_np(np.asarray(d).astype(np.uint32)).astype(
                        np.uint64
                    )
                    for d in docs
                ]
            lengths = np.array([len(h) for h in hashed], dtype=np.int32)
            t = 128
            while t < max(1, int(lengths.max()) if len(lengths) else 1):
                t *= 2
            padded = np.zeros((len(hashed), t), dtype=np.uint64)
            for i, h in enumerate(hashed):
                padded[i, : len(h)] = h
        elif algo is not None:
            max_len = max((len(d) for d in docs), default=1)
            t_bucket = 128
            while t_bucket < max_len:
                t_bucket *= 2
            padded, lengths = corpus.hash_corpus_padded(
                docs, algo, pad_multiple=t_bucket
            )
            padded = padded.astype(np.uint64)
        else:
            hashed = [
                np.array([self.hashfunc(t) for t in d], dtype=np.uint64)
                for d in docs
            ]
            lengths = np.array([len(h) for h in hashed], dtype=np.int32)
            max_len = max(1, int(lengths.max()) if len(lengths) else 1)
            t = 128
            while t < max_len:
                t *= 2
            padded = np.zeros((len(hashed), t), dtype=np.uint64)
            for i, h in enumerate(hashed):
                if np.any((h >> np.uint64(self._hash_range_bit)) != 0):
                    raise ValueError(
                        "Hash value overflow, maximum size is %d bits"
                        % self.max_rank
                    )
                padded[i, : len(h)] = h
        n_real = padded.shape[0]
        b_bucket = 128
        while b_bucket < n_real:
            b_bucket *= 2
        if b_bucket != n_real:
            padded = np.pad(padded, ((0, b_bucket - n_real), (0, 0)))
            lengths = np.pad(lengths, (0, b_bucket - n_real))
        return padded, lengths

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
        return self.__class__(
            reg=self.digest(), hashfunc=self.hashfunc,
            device_mode=self.device_mode,
        )

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


def _pad_pow2_ids(docs, max_id: int = None) -> tuple:
    """Pad integer-id docs to (uint[B_pow2, T_pow2], int32[B_pow2])
    — the shared pow-of-two shape bucketing (compile-shape discipline)
    for raw-id device uploads. Padding slots are zero and masked by the
    lengths vector on device. When every id fits 16 (or 8) bits the
    matrix uploads NARROW and zero-extends post-transfer on device —
    halving/quartering bytes over the ~50MB/s tunnel, the same trick
    that took the MinHash id path 39.7k -> 57.4k docs/s (BENCH_r04
    fast rows). Pass ``max_id`` to skip the extra max scan."""
    lengths = np.fromiter(map(len, docs), np.int32, count=len(docs))
    t = 128
    while t < max(1, int(lengths.max()) if lengths.size else 1):
        t *= 2
    b = 128
    while b < len(docs):
        b *= 2
    if max_id is None:
        max_id = max(
            (int(np.asarray(d).max()) for d in docs if len(d)), default=0
        )
    dtype = (
        np.uint8 if max_id < (1 << 8)
        else np.uint16 if max_id < (1 << 16)
        else np.uint32
    )
    ids = np.zeros((b, t), dtype=dtype)
    for i, d in enumerate(docs):
        ids[i, : len(d)] = np.asarray(d).astype(dtype)
    return ids, np.pad(lengths, (0, b - len(docs)))


def _np_bit_length(x: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length() for nonnegative int64 arrays.

    Values below 2**53 take the frexp fast path: float64 holds them
    EXACTLY, and the binary exponent IS the bit length (one conversion
    pass + one frexp pass vs twelve shift/compare passes — this was 43%
    of HLL++ ``bulk_registers`` wall time on the 1M-token protocol).
    Wider values (possible only at p < 11 over 64-bit hashes) keep the
    exact shift ladder."""
    x = np.asarray(x).astype(np.uint64)
    if x.size and int(x.max()) < (1 << 53):
        return np.frexp(x.astype(np.float64))[1].astype(np.int64)
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
        device_mode: str = "auto",
    ):
        super().__init__(
            p=p, reg=reg, hashfunc=hashfunc, hashobj=hashobj,
            device_mode=device_mode,
        )
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
            from datasketch_tpu.hashfunc import device_hash64

            if self.hashfunc is device_hash64:
                from datasketch_tpu.ops.hashing import mix64_np

                ids = np.asarray(list(bs)).astype(np.uint64)
                if (
                    not self._sparse
                    and ids.size
                    and int(ids.max()) < (1 << 32)
                    and (
                        self.device_mode == "always"
                        or (
                            self.device_mode == "auto"
                            and ids.size >= self._DEVICE_BATCH_THRESHOLD
                        )
                    )
                ):
                    # raw 4-byte ids up, mix64 limb rounds on device —
                    # half the upload of host-mixed uint64 hashes;
                    # T bucketed to a power of two (every distinct batch
                    # length would otherwise compile a fresh program
                    # through the remote-TPU path)
                    from datasketch_tpu.ops import hll_ops

                    t = 128
                    while t < ids.size:
                        t *= 2
                    padded = np.zeros(t, dtype=np.uint32)
                    padded[: ids.size] = ids.astype(np.uint32)
                    row = hll_ops.sketch_batch64_ids(
                        padded[None, :],
                        np.array([ids.size], dtype=np.int32),
                        self.p,
                    )
                    np.maximum(self.reg, np.asarray(row)[0], out=self.reg)
                    return
                hv = mix64_np(ids)
            else:
                hv = np.array(
                    [self.hashfunc(b) for b in bs], dtype=np.uint64
                )
        if hv.size == 0:
            return
        # A batch whose distinct sparse keys overflow the sparse budget
        # forces _to_dense() mid-batch anyway; converting FIRST is
        # max-merge-commutative (identical final registers) and swaps the
        # per-item Python loop of _sparse_add for the vectorized paths
        # below — measured 28k -> multi-M tokens/s on 32k-item stream
        # chunks. (Duplicate-heavy batches whose unique keys still fit
        # stay sparse: the count check is on distinct keys.)
        if self._sparse and hv.size + len(self._sparse_items) > self._sparse_max:
            idx25_probe = np.unique(
                (hv & np.uint64((1 << self._P_SPARSE) - 1)).astype(np.int64)
            )
            if self._sparse_items:
                # Count the UNION with the stored keys: batch keys that
                # already exist in the sparse dict must not be double
                # counted, or re-ingesting the same documents densifies
                # a sketch the per-item path would have kept sparse
                # (changing count() from 2^25 linear counting to the
                # dense estimator).
                existing = np.fromiter(
                    self._sparse_items.keys(),
                    dtype=np.int64,
                    count=len(self._sparse_items),
                )
                merged_distinct = np.union1d(idx25_probe, existing).size
            else:
                merged_distinct = idx25_probe.size
            if merged_distinct > self._sparse_max:
                self._to_dense()
        if not self._sparse and (
            self.device_mode == "always"
            or (
                self.device_mode == "auto"
                and hv.size >= self._DEVICE_BATCH_THRESHOLD
            )
        ):
            row = self._device_sketch_rows(
                hv[None, :], np.array([hv.size], dtype=np.int32)
            )
            np.maximum(self.reg, np.asarray(row)[0], out=self.reg)
            return
        if (
            not self._sparse
            and self.reg.dtype == np.int8
            and self.reg.flags.c_contiguous
            and self.reg.flags.writeable
        ):
            # fused C scatter; at a 64-bit hash range rank >= 1 holds
            # for every uint64, so no overflow error state is reachable.
            # int8-contiguous gate: user-supplied reg= of another dtype
            # keeps the dtype-agnostic numpy path below.
            from datasketch_tpu.native import corpus as _corpus

            if _corpus.hll_scatter(
                self.reg, np.ascontiguousarray(hv, dtype=np.uint64),
                np.array([hv.size], dtype=np.int64), self.p, self.max_rank,
            ) is not None:
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
            p=self.p, hashfunc=self.hashfunc, sparse=self._sparse,
            device_mode=self.device_mode,
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

"""MinHashLSHBloom — membership-only LSH (LSHBloom, arXiv:2411.04257).

API parity with ``/root/reference/datasketch/lsh_bloom.py:126`` (threshold/
params, n/fp sizing, per-band filters, file-backed persistence, bool
queries). The reference depends on the ``pybloomfilter3`` C extension for
mmap'd filters; here each band's filter is a self-contained NumPy bitmap
with double-hashing (k = m/n ln2 probes), so there is no native dependency
and inserts/queries vectorize over whole signature batches. Persisted files
are ``.npy`` bitmaps plus a small header (not pybloomfilter's mmap format).

Band key parity: a band's r hashvalues are combined as
``sum(hashvalues) % (2**61 - 1)`` (the universal-hash-sum argument at
lsh_bloom.py:102-106) before entering the filter.
"""

from __future__ import annotations

import logging
import os
import warnings
from typing import Optional

import numpy as np

from datasketch_tpu.models.lsh import _optimal_param

logger = logging.getLogger(__name__)

_mersenne_prime = np.uint64((1 << 61) - 1)

__all__ = ["MinHashLSHBloom", "BloomTable", "TpuMinHashLSHBloom"]


class BloomTable:
    """A Bloom filter modeling one band of the signature matrix.

    Args:
        item_count: Expected number of inserts (sizes the bitmap).
        fp: Target false-positive rate in (0, 1).
        band_size: r — number of hashvalues per band.
        fname: Optional path; if it exists the filter is loaded from it,
            otherwise a new filter is created (and :meth:`sync` saves there).
    """

    _MAGIC = 0x42463031  # "BF01"

    def __init__(
        self,
        item_count: int,
        fp: float,
        band_size: int,
        fname: Optional[str] = None,
    ):
        self.r = band_size
        self.fname = fname
        if fname is not None and os.path.exists(fname):
            logger.info("Loading Bloom Filter at %s...", fname)
            self._load(fname)
        else:
            # standard sizing: m = -n ln p / (ln 2)^2 ; k = m/n ln 2
            n = max(1, int(item_count))
            m = int(np.ceil(-n * np.log(fp) / (np.log(2.0) ** 2)))
            m = max(64, m)
            self.num_bits = m
            self.num_hashes = max(1, int(round(m / n * np.log(2.0))))
            self.bits = np.zeros((m + 63) // 64, dtype=np.uint64)

    # -------------------------------------------------------------- hashing

    def _positions(self, x: np.ndarray) -> np.ndarray:
        """k probe positions per key via double hashing: [N] -> [N, k]."""
        x = x.astype(np.uint64)
        h1 = x * np.uint64(0x9E3779B97F4A7C15)
        h1 ^= h1 >> np.uint64(29)
        h1 *= np.uint64(0xBF58476D1CE4E5B9)
        h1 ^= h1 >> np.uint64(32)
        h2 = x * np.uint64(0xC2B2AE3D27D4EB4F)
        h2 ^= h2 >> np.uint64(33)
        h2 = h2 | np.uint64(1)  # odd stride
        i = np.arange(self.num_hashes, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.num_bits)

    @staticmethod
    def _band_key(hashvalues) -> np.uint64:
        return np.uint64(
            int(np.sum(np.asarray(hashvalues, dtype=np.uint64), dtype=np.uint64))
            % int(_mersenne_prime)
        )

    def assert_size(self, hashvalues) -> None:
        if not len(hashvalues) == self.r:
            raise RuntimeError(
                f"Invalid length for indices, {len(hashvalues)}, expected "
                f"{self.r} hashvalues in band"
            )

    # ------------------------------------------------------------ single ops

    def insert(self, hashvalues) -> None:
        """Add one band's hashvalues to the filter."""
        self.assert_size(hashvalues)
        self.insert_keys(np.array([self._band_key(hashvalues)], dtype=np.uint64))

    def query(self, hashvalues) -> bool:
        """Whether one band's hashvalues were (probably) inserted."""
        self.assert_size(hashvalues)
        return bool(
            self.query_keys(np.array([self._band_key(hashvalues)], dtype=np.uint64))[0]
        )

    # ------------------------------------------------------------- batch ops

    def insert_keys(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).reshape(-1)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self.bits, word, bit)

    def query_keys(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        hits = (self.bits[word] & bit) != 0
        return hits.all(axis=1)

    # ----------------------------------------------------------- persistence

    def sync(self) -> None:
        """Persist to ``fname`` (no-op warning for in-memory filters,
        parity with lsh_bloom.py:80-85)."""
        if self.fname is not None:
            header = np.array(
                [self._MAGIC, self.num_bits, self.num_hashes, self.r],
                dtype=np.uint64,
            )
            with open(self.fname, "wb") as f:
                np.save(f, header)
                np.save(f, self.bits)
        else:
            warnings.warn(
                "Attempting to save in-memory Bloom filter, this is a no-op.",
                RuntimeWarning,
                stacklevel=2,
            )

    def _load(self, fname: str) -> None:
        with open(fname, "rb") as f:
            header = np.load(f)
            if int(header[0]) != self._MAGIC:
                raise ValueError(f"{fname} is not a datasketch_tpu bloom file")
            self.num_bits = int(header[1])
            self.num_hashes = int(header[2])
            self.r = int(header[3])
            self.bits = np.load(f)


class MinHashLSHBloom:
    """Membership-only LSH: answers "is this a likely duplicate?" in O(b)
    bloom probes with no key storage.

    Args:
        threshold: Jaccard threshold the banding is optimized for.
        num_perm: Signature length.
        n: Expected number of inserted sets (sizes each filter).
        fp: Per-filter false-positive rate in (0, 1).
        save_dir: Directory for band filter files (``band-<i>.bf``); None
            keeps the index in memory only (warns).
        weights / params: As in :class:`MinHashLSH`.
    """

    def __init__(
        self,
        threshold: float = 0.9,
        num_perm: int = 128,
        n: Optional[int] = None,
        fp: Optional[float] = None,
        save_dir: Optional[str] = None,
        weights: tuple = (0.5, 0.5),
        params: Optional[tuple] = None,
    ) -> None:
        if threshold > 1.0 or threshold < 0.0:
            raise ValueError("threshold must be in [0.0, 1.0]")
        if num_perm < 2:
            raise ValueError("Too few permutation functions")
        if n is None or n <= 0:
            raise ValueError("n for LSHBloom must be >= 0")
        if fp is None or fp >= 1.0 or fp <= 0.0:
            raise ValueError("fp must be in (0.0, 1.0)")
        if save_dir is None:
            warnings.warn(
                "Creating LSHBloom index without save directory, this index "
                "will not be persisted.",
                RuntimeWarning,
                stacklevel=2,
            )
        if any(w < 0.0 or w > 1.0 for w in weights):
            raise ValueError("Weight must be in [0.0, 1.0]")
        if sum(weights) != 1.0:
            raise ValueError("Weights must sum to 1.0")
        self.h = num_perm
        if params is not None:
            self.b, self.r = params
            if self.b * self.r > num_perm:
                raise ValueError(
                    "The product of b and r in params is "
                    f"{self.b} * {self.r} = {self.b * self.r} -- it must be "
                    f"less than num_perm {num_perm}. "
                    "Did you forget to specify num_perm?"
                )
        else:
            fpw, fnw = weights
            self.b, self.r = _optimal_param(threshold, num_perm, fpw, fnw)
        if self.b < 2:
            raise ValueError("The number of bands are too small (b < 2)")

        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
        self.hashtables = [
            BloomTable(
                item_count=n,
                fp=fp,
                band_size=self.r,
                fname=(
                    os.path.join(save_dir, f"band-{i}.bf")
                    if save_dir is not None
                    else None
                ),
            )
            for i in range(self.b)
        ]
        self.hashranges = [(i * self.r, (i + 1) * self.r) for i in range(self.b)]

    def insert(self, minhash) -> None:
        """Insert a MinHash/WeightedMinHash into every band filter."""
        if len(minhash) != self.h:
            raise ValueError(
                "Expecting minhash with length %d, got %d" % (self.h, len(minhash))
            )
        for (start, end), hashtable in zip(self.hashranges, self.hashtables):
            hashtable.insert(minhash.hashvalues[start:end])

    def insert_batch(self, minhashes) -> None:
        """Vectorized insert of many sketches: one scatter per band."""
        sigs = np.stack(
            [np.asarray(m.hashvalues, dtype=np.uint64) for m in minhashes]
        )
        if sigs.shape[1] != self.h:
            raise ValueError(
                "Expecting minhash with length %d, got %d" % (self.h, sigs.shape[1])
            )
        for i, (start, end) in enumerate(self.hashranges):
            keys = sigs[:, start:end].sum(axis=1, dtype=np.uint64) % _mersenne_prime
            self.hashtables[i].insert_keys(keys)

    def query(self, minhash) -> bool:
        """True if any band collides — i.e. a likely duplicate was inserted."""
        if len(minhash) != self.h:
            raise ValueError(
                "Expecting minhash with length %d, got %d" % (self.h, len(minhash))
            )
        for (start, end), hashtable in zip(self.hashranges, self.hashtables):
            if hashtable.query(minhash.hashvalues[start:end]):
                return True
        return False

    def query_batch(self, minhashes) -> np.ndarray:
        """Vectorized duplicate test: bool[N]."""
        sigs = np.stack(
            [np.asarray(m.hashvalues, dtype=np.uint64) for m in minhashes]
        )
        if sigs.shape[1] != self.h:
            raise ValueError(
                "Expecting minhash with length %d, got %d" % (self.h, sigs.shape[1])
            )
        out = np.zeros(sigs.shape[0], dtype=bool)
        for i, (start, end) in enumerate(self.hashranges):
            keys = sigs[:, start:end].sum(axis=1, dtype=np.uint64) % _mersenne_prime
            out |= self.hashtables[i].query_keys(keys)
        return out

    def sync(self) -> None:
        """Persist all band filters."""
        logger.info("Saving Bloom Index...")
        for table in self.hashtables:
            table.sync()


class TpuMinHashLSHBloom:
    """Device-resident LSHBloom: all bands' bitmaps live in device memory.

    Same banding, ``sum(band) % (2^61-1)`` key, and double-hashed probe
    scheme as :class:`MinHashLSHBloom` (bit positions are identical, so
    query answers match the host class exactly), but the per-band bitmaps
    are one word-packed ``uint32[b, num_words]`` device array — 1 bit per
    bit of filter, 8x less HBM than a bool bitmap, which is what lets the
    LSHBloom paper's billion-key regime (arXiv:2411.04257) fit on chip.
    Inserts dedupe probe positions to unique (band, word) pairs with
    OR-combined masks on host, then apply them in ONE gather + ONE
    unique-index scatter; queries are a single gather + bit test.
    """

    def __init__(
        self,
        threshold: float = 0.9,
        num_perm: int = 128,
        weights: tuple = (0.5, 0.5),
        params: Optional[tuple] = None,
        n: int = 1_000_000,
        fp: float = 0.01,
    ) -> None:
        import jax.numpy as jnp

        if threshold > 1.0 or threshold < 0.0:
            raise ValueError("threshold must be in [0.0, 1.0]")
        self.threshold = threshold
        self.h = num_perm
        if params is not None:
            self.b, self.r = params
            if self.b * self.r > num_perm:
                raise ValueError("b*r must be <= num_perm")
        else:
            self.b, self.r = _optimal_param(threshold, num_perm, *weights)
        m = int(np.ceil(-max(1, n) * np.log(fp) / (np.log(2.0) ** 2)))
        self.num_bits = max(64, m)
        self.num_hashes = max(1, int(round(self.num_bits / max(1, n) * np.log(2.0))))
        # word-packed storage: the padded tail past num_bits is never
        # addressed (num_bits stays the probe modulus)
        self.num_words = -(-self.num_bits // 32)
        self._words = jnp.zeros((self.b, self.num_words), dtype=jnp.uint32)
        self.hashranges = [(i * self.r, (i + 1) * self.r) for i in range(self.b)]

    def _band_keys(self, minhashes) -> np.ndarray:
        """uint64[N, b] band keys: sum of the band's hashvalues mod p."""
        sigs = np.stack(
            [np.asarray(
                m.hashvalues if hasattr(m, "hashvalues") else m,
                dtype=np.uint64,
             )
             for m in minhashes]
        )
        n = sigs.shape[0]
        bands = sigs[:, : self.b * self.r].reshape(n, self.b, self.r)
        return (bands.sum(axis=2, dtype=np.uint64)) % _mersenne_prime

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """Probe positions int32[N, b, k] by double hashing (BloomTable
        scheme)."""
        x = keys.astype(np.uint64)
        h1 = x * np.uint64(0x9E3779B97F4A7C15)
        h1 ^= h1 >> np.uint64(29)
        h1 *= np.uint64(0xBF58476D1CE4E5B9)
        h1 ^= h1 >> np.uint64(32)
        h2 = x * np.uint64(0xC2B2AE3D27D4EB4F)
        h2 ^= h2 >> np.uint64(33)  # same finalizer as BloomTable._positions:
        h2 = h2 | np.uint64(1)  # bitmaps must be cross-checkable host<->device
        i = np.arange(self.num_hashes, dtype=np.uint64)
        pos = (h1[..., None] + i * h2[..., None]) % np.uint64(self.num_bits)
        return pos.astype(np.int64)

    def _word_updates(self, minhashes):
        """Unique (band, word, OR-combined mask) int32/uint32[M] triples
        for a batch, pow2-padded with an out-of-range sentinel word (so
        the scatter sees only unique live indices and a capped family of
        shapes)."""
        pos = self._positions(self._band_keys(minhashes))  # int64[N, b, k]
        band = np.broadcast_to(
            np.arange(self.b, dtype=np.int64)[None, :, None], pos.shape
        )
        gid = (band * self.num_words + (pos >> 5)).ravel()  # global word id
        mask_all = (np.uint32(1) << (pos & 31).astype(np.uint32)).ravel()
        uniq, inv = np.unique(gid, return_inverse=True)
        masks = np.zeros(len(uniq), dtype=np.uint32)
        np.bitwise_or.at(masks, inv, mask_all)
        m_pad = 8
        while m_pad < len(uniq):
            m_pad *= 2
        band_u = np.zeros(m_pad, dtype=np.int32)
        word_u = np.full(m_pad, self.num_words, dtype=np.int32)  # sentinel
        mask_u = np.zeros(m_pad, dtype=np.uint32)
        band_u[: len(uniq)] = uniq // self.num_words
        word_u[: len(uniq)] = uniq % self.num_words
        mask_u[: len(uniq)] = masks
        return band_u, word_u, mask_u

    def insert(self, minhash) -> None:
        self.insert_batch([minhash])

    def insert_batch(self, minhashes) -> None:
        """One gather + one unique-index scatter for the whole batch."""
        import jax.numpy as jnp

        if not minhashes:
            return
        band_u, word_u, mask_u = self._word_updates(minhashes)
        band = jnp.asarray(band_u)
        word = jnp.asarray(word_u)
        cur = self._words[band, jnp.clip(word, 0, self.num_words - 1)]
        # indices are unique (sentinel rows OR in 0 and are dropped), so
        # gather-then-set is a race-free OR
        self._words = self._words.at[band, word].set(
            cur | jnp.asarray(mask_u), mode="drop"
        )

    def insert_tokens(self, token_docs, seed: int = 1) -> None:
        """Bulk-insert straight from PRE-TOKENIZED integer documents —
        ids hashed ON-CHIP (contract of
        :meth:`~datasketch_tpu.models.tpu_lsh.TpuMinHashLSH.index_tokens`;
        membership-only, so no keys). Query with ``hashfunc='device'``
        sketches at equal seed."""
        from datasketch_tpu.models.minhash import MinHash

        self.insert_batch(list(MinHash.bulk_signatures(
            token_docs, num_perm=self.h, seed=seed, hashfunc="device",
        )))

    def insert_text(self, texts, k: int = 9, seed: int = 1) -> None:
        """Bulk-insert straight from RAW TEXT via on-device k-shingling
        (contract of
        :meth:`~datasketch_tpu.models.tpu_lsh.TpuMinHashLSH.index_text`)."""
        from datasketch_tpu.models.minhash import MinHash

        self.insert_batch(list(MinHash.bulk_from_text(
            texts, k=k, num_perm=self.h, seed=seed, hashfunc="device",
        )))

    def query(self, minhash) -> bool:
        return bool(self.query_batch([minhash])[0])

    def query_batch(self, minhashes) -> np.ndarray:
        """bool[N]: True where ANY band's filter hits (duplicate likely)."""
        import jax.numpy as jnp

        if not minhashes:
            return np.zeros(0, dtype=bool)
        pos = self._positions(self._band_keys(minhashes))  # [N, b, k]
        band = np.broadcast_to(
            np.arange(self.b, dtype=np.int64)[None, :, None], pos.shape
        )
        mask = (np.uint32(1) << (pos & 31).astype(np.uint32))
        w = self._words[jnp.asarray(band), jnp.asarray(pos >> 5)]  # [N, b, k]
        hits = (w & jnp.asarray(mask)) != 0
        return np.asarray(hits.all(axis=2).any(axis=1))

    # ------------------------------------------------------------ persistence

    # Bumped when the probe-position scheme changes: a bitmap probed with
    # a different scheme loads "cleanly" and then returns false negatives
    # for everything previously inserted. v2 = h2 xor-shift finalizer
    # (matching BloomTable._positions).
    _PROBE_SCHEME = 2

    def save(self, path: str) -> None:
        """Persist bitmaps + params to ``.npz`` (the device analogue of the
        host class's file-backed band filters, lsh_bloom.py:74-83). Bitmaps
        are stored word-packed (``bits_packed`` uint32) — 8x smaller files
        than the bool format, which the loader still accepts."""
        from datasketch_tpu.persist import atomic_savez, npz_path

        atomic_savez(
            npz_path(path),
            bits_packed=np.asarray(self._words),
            meta=np.array(
                [self.h, self.b, self.r, self.num_bits, self.num_hashes],
                dtype=np.int64,
            ),
            probe_scheme=np.int64(self._PROBE_SCHEME),
            threshold=np.float64(self.threshold),
        )

    @staticmethod
    def _pack_bool(bits: np.ndarray, num_words: int) -> np.ndarray:
        """bool[b, num_bits] -> uint32[b, num_words] (LSB-first, matching
        the mask convention ``1 << (pos & 31)``)."""
        b, num_bits = bits.shape
        padded = np.zeros((b, num_words * 32), dtype=bool)
        padded[:, :num_bits] = bits
        cube = padded.reshape(b, num_words, 32).astype(np.uint32)
        return (cube << np.arange(32, dtype=np.uint32)).sum(
            axis=2, dtype=np.uint32
        )

    @classmethod
    def load(cls, path: str) -> "TpuMinHashLSHBloom":
        import jax.numpy as jnp

        from datasketch_tpu.persist import npz_path

        data = np.load(npz_path(path), allow_pickle=False)
        saved_scheme = (
            int(data["probe_scheme"]) if "probe_scheme" in data else 1
        )
        if saved_scheme != cls._PROBE_SCHEME:
            raise ValueError(
                "bloom bitmap was built with probe scheme v%d (current "
                "v%d) — its bit positions no longer match and every "
                "membership query would silently return False; rebuild "
                "the filter from source data" % (saved_scheme, cls._PROBE_SCHEME)
            )
        h, b, r, num_bits, num_hashes = (int(x) for x in data["meta"])
        obj = cls.__new__(cls)
        obj.threshold = float(data["threshold"])
        obj.h = h
        obj.b, obj.r = b, r
        obj.num_bits = num_bits
        obj.num_hashes = num_hashes
        obj.num_words = -(-num_bits // 32)
        if "bits_packed" in data:
            words = data["bits_packed"]
        else:  # legacy bool bitmap checkpoints
            words = cls._pack_bool(data["bits"], obj.num_words)
        obj._words = jnp.asarray(words)
        obj.hashranges = [(i * r, (i + 1) * r) for i in range(b)]
        return obj

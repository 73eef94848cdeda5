"""MinHash — Jaccard similarity sketch.

API parity with ``/root/reference/datasketch/minhash.py:51`` (update,
update_batch, jaccard, count, merge, union, digest, bulk, generator, pickle),
re-architected TPU-first:

- Single-object ``update``/``update_batch`` run the exact reference NumPy
  formula on host (a one-token device round-trip would lose).
- Bulk signature construction (``MinHash.bulk``/``generator`` and the
  functional :mod:`datasketch_tpu.ops.minhash_ops` API) batches every
  document into one ``uint32[batch, num_perm]`` device computation. The
  reference's ``gpu_mode`` CuPy toggle (minhash.py:156,271-291) becomes
  ``device_mode`` targeting the local JAX accelerator.

Signatures are bit-identical to the reference at equal (seed, num_perm,
hashfunc) — including NumPy's silent uint64 wrap of ``a*h`` — so sketches
serialize/interoperate across the two libraries.
"""

from __future__ import annotations

import copy
import warnings
from typing import Callable, Iterable, Optional

import numpy as np

from datasketch_tpu.hashfunc import device_hash, sha1_hash32, xxhash_hash32


def _jnp():
    """Lazy jax.numpy (import hygiene: importing this module must never
    initialize a backend — tests/test_import_hygiene.py)."""
    import jax.numpy as jnp

    return jnp

__all__ = ["MinHash"]

_mersenne_prime = np.uint64((1 << 61) - 1)
_max_hash = np.uint64((1 << 32) - 1)
_hash_range = 1 << 32

# Below this many tokens a host NumPy update beats a device dispatch.
_DEVICE_BATCH_THRESHOLD = 4096

# Padded-token budget per device dispatch for bulk APIs. Chunks are cut so
# B_pow2 * T_pow2 <= budget: a fixed DOC-count chunk over a length-sorted
# ragged corpus lets one long doc balloon T for thousands of short ones
# (measured 10x padded-token waste on lognormal sizes); budget-cut chunks
# keep waste bounded AND keep the (B, T) compile-shape family tiny since
# every shape satisfies B*T ~= budget.
_TOKEN_BUDGET = 1 << 21


_SCHEMES = ("permutation", "oph", "cminhash")


def _alt_scheme_signatures(scheme: str, padded, lengths, num_perm: int,
                           seed: int):
    """Dispatch the non-default (not-reference-compatible) schemes."""
    if scheme == "oph":
        from datasketch_tpu.ops import oph

        return oph.oph_signatures(padded, lengths, num_perm, seed=seed)
    from datasketch_tpu.ops import cminhash

    return cminhash.cminhash_signatures(padded, lengths, num_perm, seed=seed)


def _check_scheme(scheme: str, custom_perms) -> None:
    if scheme not in _SCHEMES:
        raise ValueError("unknown signature scheme: %r" % (scheme,))
    if scheme != "permutation" and custom_perms is not None:
        raise ValueError(
            "custom permutations are meaningless for scheme %r" % (scheme,)
        )


def _pow2_at_least(x: int, floor: int = 128) -> int:
    p = floor
    while p < x:
        p *= 2
    return p


def _start_host_copy(dev_array) -> None:
    """Kick off an async device->host copy if the array supports it."""
    try:
        dev_array.copy_to_host_async()
    except AttributeError:
        pass


def _device_finish(in_flight, n_docs: int):
    """Concat per-chunk device results (length-sorted order) and undo the
    sort with one gather — the signatures never leave the device."""
    jnp = _jnp()
    cat = (
        jnp.concatenate([d for _, d in in_flight], axis=0)
        if len(in_flight) > 1
        else in_flight[0][1]
    )
    flat_idx = np.concatenate(
        [np.asarray(idx, dtype=np.int64) for idx, _ in in_flight]
    )
    inv = np.empty(n_docs, dtype=np.int32)
    inv[flat_idx] = np.arange(n_docs, dtype=np.int32)
    return jnp.take(cat, jnp.asarray(inv), axis=0)


def _budget_chunks(sorted_lengths, budget: int = _TOKEN_BUDGET):
    """Cut a length-sorted corpus into (start, end) ranges whose padded
    [B_pow2, T_pow2] area stays within ``budget`` tokens."""
    chunks = []
    n = len(sorted_lengths)
    i = 0
    while i < n:
        t = _pow2_at_least(int(sorted_lengths[i]))
        j = i + 1
        while j < n:
            t_next = _pow2_at_least(int(sorted_lengths[j]), t)
            b_next = _pow2_at_least(j - i + 1)
            if b_next * t_next > budget:
                break
            t = t_next
            j += 1
        chunks.append((i, j))
        i = j
    return chunks


class MinHash:
    """A probabilistic sketch for estimating Jaccard similarity between sets.

    Args:
        num_perm: Number of random permutation functions.
        seed: Seed for the permutation family; sketches are only comparable
            at equal seeds.
        hashfunc: Token hash: takes the value passed to :meth:`update`,
            returns an int encodable in 32 bits. Defaults to SHA1-low-32.
        hashobj: Deprecated no-op (reference parity, minhash.py:139-141).
        hashvalues: Optional initial state (copies another sketch's state).
        permutations: Optional (a, b) parameter arrays to share across
            sketches instead of regenerating from the seed.
        device_mode: 'disable' | 'auto' | 'always' — whether
            :meth:`update_batch` may offload the permutation+min to the JAX
            accelerator ('auto' offloads only for large token batches).
            Accepts the reference's ``gpu_mode`` spelling as an alias.
    """

    def __init__(
        self,
        num_perm: int = 128,
        seed: int = 1,
        hashfunc: Callable = sha1_hash32,
        hashobj: Optional[object] = None,
        hashvalues=None,
        permutations=None,
        device_mode: str = "auto",
        gpu_mode: Optional[str] = None,
    ) -> None:
        if hashvalues is not None:
            num_perm = len(hashvalues)
        if num_perm > _hash_range:
            raise ValueError(
                "Cannot have more than %d number of permutation functions" % _hash_range
            )
        self.seed = seed
        self.num_perm = num_perm
        if hashfunc == "device":
            # pre-tokenized integer corpora: hash on-chip (fmix32), fused
            # into the signature kernel — see datasketch_tpu.hashfunc
            hashfunc = device_hash
        elif hashfunc == "xxh32":
            # fast non-cryptographic token hash (native XXH32 batch path)
            hashfunc = xxhash_hash32
        if not callable(hashfunc):
            raise ValueError("The hashfunc must be a callable.")
        self.hashfunc = hashfunc
        if hashobj is not None:
            warnings.warn(
                "hashobj is deprecated, use hashfunc instead.",
                DeprecationWarning,
                stacklevel=2,
            )
        if gpu_mode is not None:
            # Reference compatibility: 'disable'/'detect'/'always' map onto
            # our device modes.
            _gpu_map = {"disable": "disable", "detect": "auto", "always": "always"}
            if gpu_mode not in _gpu_map:
                raise ValueError("gpu_mode must be 'disable', 'detect' or 'always'")
            device_mode = _gpu_map[gpu_mode]
        if device_mode not in ("disable", "auto", "always"):
            raise ValueError("device_mode must be 'disable', 'auto' or 'always'")
        self._device_mode = device_mode
        if hashvalues is not None:
            self.hashvalues = self._parse_hashvalues(hashvalues)
        else:
            self.hashvalues = self._init_hashvalues(num_perm)
        if permutations is not None:
            self.permutations = permutations
        else:
            from datasketch_tpu.ops.minhash_ops import init_permutations

            self.permutations = init_permutations(seed, num_perm)
        if len(self) != len(self.permutations[0]):
            raise ValueError("Numbers of hash values and permutations mismatch")

    @property
    def _gpu_mode(self) -> str:
        """Reference-compat view of device_mode (minhash.py:156 spelling)."""
        return {"disable": "disable", "auto": "detect", "always": "always"}[
            self._device_mode
        ]

    def _custom_permutations(self):
        """This sketch's (a, b) iff they differ from the seed-derived family.

        Returns None when ``self.permutations`` equals
        ``init_permutations(self.seed, self.num_perm)`` (identity OR value
        equality — value check keeps the cached-limb fast path after
        unpickling), else the explicit arrays to thread through every
        device path. Reference custom-permutation semantics:
        ``/root/reference/datasketch/minhash.py:158-166``.
        """
        from datasketch_tpu.ops.minhash_ops import init_permutations

        default = init_permutations(self.seed, self.num_perm)
        if self.permutations is default:
            return None
        a, b = self.permutations
        if np.array_equal(a, default[0]) and np.array_equal(b, default[1]):
            return None
        return self.permutations

    def _init_hashvalues(self, num_perm: int) -> np.ndarray:
        return np.ones(num_perm, dtype=np.uint64) * _max_hash

    def _parse_hashvalues(self, hashvalues) -> np.ndarray:
        return np.array(hashvalues, dtype=np.uint64)

    def update(self, b) -> None:
        """Fold one value into the sketch (hashed with ``hashfunc``)."""
        hv = self.hashfunc(b)
        a, bb = self.permutations
        phv = np.bitwise_and((a * np.uint64(hv) + bb) % _mersenne_prime, _max_hash)
        self.hashvalues = np.minimum(phv, self.hashvalues)

    def update_batch(self, b: Iterable) -> None:
        """Fold many values into the sketch in one vectorized pass.

        Hashing runs on host (to honor ``hashfunc`` semantics); the
        permutation+min matrix runs on host NumPy for small batches and on
        the JAX device for large ones (per ``device_mode``).
        """
        hv = self._hash_tokens(list(b))
        if hv.size == 0:
            return
        use_device = self._device_mode == "always" or (
            self._device_mode == "auto" and hv.size >= _DEVICE_BATCH_THRESHOLD
        )
        if use_device:
            from datasketch_tpu.ops import minhash_ops

            state = np.asarray(self.hashvalues, dtype=np.uint64).astype(np.uint32)
            sig = minhash_ops.update_signatures(
                np.ascontiguousarray(state[None, :]),
                np.ascontiguousarray(hv[None, :]),
                np.array([hv.size], dtype=np.int32),
                *minhash_ops.limbs_for(
                    self.seed, self.num_perm, self._custom_permutations()
                ),
            )
            self.hashvalues = np.asarray(sig)[0].astype(np.uint64)
            return
        a, bb = self.permutations
        hv64 = hv.astype(np.uint64)[:, None]
        phv = np.bitwise_and((hv64 * a + bb) % _mersenne_prime, _max_hash)
        self.hashvalues = np.minimum(self.hashvalues, phv.min(axis=0))

    def _hash_tokens(self, tokens: list) -> np.ndarray:
        """Hash a token list to uint32, batching through native SHA1 when the
        hashfunc is the stock one."""
        if self.hashfunc is sha1_hash32 and tokens:
            from datasketch_tpu.native import corpus

            return corpus.hash_tokens(tokens, corpus.ALGO_SHA1_32)
        if self.hashfunc is xxhash_hash32 and tokens:
            from datasketch_tpu.native import corpus

            return corpus.hash_tokens(tokens, corpus.ALGO_XXH32)
        if self.hashfunc is device_hash and tokens:
            from datasketch_tpu.ops.hashing import mix32_np

            # vectorized host twin of the on-device mix (bit-identical)
            return mix32_np(np.asarray(tokens).astype(np.uint32))
        return np.array([self.hashfunc(t) for t in tokens], dtype=np.uint64).astype(
            np.uint32
        )

    def jaccard(self, other: "MinHash") -> float:
        """Estimate Jaccard similarity against another sketch."""
        if other.seed != self.seed:
            raise ValueError(
                "Cannot compute Jaccard given MinHash with different seeds"
            )
        if len(self) != len(other):
            raise ValueError(
                "Cannot compute Jaccard given MinHash with different numbers "
                "of permutation functions"
            )
        return float(np.count_nonzero(self.hashvalues == other.hashvalues)) / float(
            len(self)
        )

    def count(self) -> float:
        """Cardinality estimate (Cohen's technique, minhash.py:326-335)."""
        k = len(self)
        return float(k) / np.sum(self.hashvalues / float(_max_hash)) - 1.0

    def merge(self, other: "MinHash") -> None:
        """Merge the other sketch into this one (set-union semantics)."""
        if other.seed != self.seed:
            raise ValueError("Cannot merge MinHash with different seeds")
        if len(self) != len(other):
            raise ValueError(
                "Cannot merge MinHash with different numbers of permutation functions"
            )
        self.hashvalues = np.minimum(other.hashvalues, self.hashvalues)

    def digest(self) -> np.ndarray:
        """A copy of the internal hashvalues state."""
        return copy.copy(self.hashvalues)

    def is_empty(self) -> bool:
        """True if no value has ever been folded in."""
        return not np.any(self.hashvalues != _max_hash)

    def clear(self) -> None:
        """Reset to the just-initialized state."""
        self.hashvalues = self._init_hashvalues(len(self))

    def copy(self) -> "MinHash":
        return MinHash(
            seed=self.seed,
            hashfunc=self.hashfunc,
            hashvalues=self.digest(),
            permutations=self.permutations,
            device_mode=self._device_mode,
        )

    def __len__(self) -> int:
        return len(self.hashvalues)

    def __eq__(self, other) -> bool:
        return (
            type(self) is type(other)
            and self.seed == other.seed
            and np.array_equal(self.hashvalues, other.hashvalues)
        )

    @classmethod
    def union(cls, *mhs: "MinHash") -> "MinHash":
        """A new sketch equal to the union of all the given sketches."""
        if len(mhs) < 2:
            raise ValueError("Cannot union less than 2 MinHash")
        num_perm = len(mhs[0])
        seed = mhs[0].seed
        if any((seed != m.seed or num_perm != len(m)) for m in mhs):
            raise ValueError(
                "The unioning MinHash must have the same seed and number of "
                "permutation functions"
            )
        hashvalues = np.minimum.reduce([m.hashvalues for m in mhs])
        permutations = mhs[0].permutations
        return cls(
            num_perm=num_perm,
            seed=seed,
            hashfunc=mhs[0].hashfunc,
            hashvalues=hashvalues,
            permutations=permutations,
            device_mode=mhs[0]._device_mode,
        )

    @classmethod
    def bulk(cls, b: Iterable, scheme: str = "permutation", **minhash_kwargs) -> list:
        """Compute many MinHashes at once (minhash.py:464-489).

        Unlike the reference's sequential object reuse, all documents are
        hashed, padded into one ``uint32[batch, tokens]`` array, and pushed
        through a single device signature computation.

        Args:
            scheme: ``"permutation"`` (default — reference-compatible
                signatures), ``"oph"`` (densified one-permutation hashing,
                :mod:`datasketch_tpu.ops.oph` — ~num_perm x less device
                work), or ``"cminhash"`` (circulant C-MinHash,
                :mod:`datasketch_tpu.ops.cminhash` — provably lower
                estimator variance, i.e. equal accuracy at smaller
                num_perm). The non-default schemes give statistically
                equivalent-or-better Jaccard estimates but are NOT
                value-compatible with the reference.

        Docs are grouped by length before chunking (outputs keep input
        order): ragged corpora otherwise spread token-length buckets across
        every chunk, paying a jit compile per (batch, length) shape.
        """
        docs = b if isinstance(b, list) else list(b)
        # materialize iterator docs (len() below; downstream list()s anyway)
        docs = [d if hasattr(d, "__len__") else list(d) for d in docs]
        order = sorted(range(len(docs)), key=lambda i: len(docs[i]))
        out: list = [None] * len(docs)
        gen = cls.generator(
            (docs[i] for i in order), scheme=scheme, **minhash_kwargs
        )
        for pos, m in zip(order, gen):
            out[pos] = m
        return out

    @classmethod
    def bulk_signatures(cls, b: Iterable, scheme: str = "permutation",
                        out: str = "host", **minhash_kwargs) -> np.ndarray:
        """Signature MATRIX for a corpus: uint32[N, num_perm], no objects.

        The pipeline form of :meth:`bulk` — at serving scale the per-doc
        ``MinHash`` object construction dominates; the matrix feeds
        :class:`~datasketch_tpu.models.tpu_lsh.TpuMinHashLSH` (and every
        ``ops``-level API) directly.

        Args:
            out: ``"host"`` (default) returns ``np.ndarray``; ``"device"``
                returns the matrix as a device array WITHOUT the
                device->host fetch — feed it straight to
                ``TpuMinHashLSH.index`` / the ops layer. Through the remote
                tunnel the D2H of a large matrix dominates end-to-end time
                (~20-50 MB/s), so serving pipelines that keep signatures on
                device should always pass ``out="device"``.
        """
        if out not in ("host", "device"):
            raise ValueError("out must be 'host' or 'device'")
        proto = cls(**minhash_kwargs)
        docs = b if isinstance(b, list) else list(b)
        docs = [d if hasattr(d, "__len__") else list(d) for d in docs]
        if not docs:
            empty = np.zeros((0, proto.num_perm), dtype=np.uint32)
            return _jnp().asarray(empty) if out == "device" else empty
        if proto._device_mode == "disable":
            # honor the host-only mode via the object path
            objs = cls.bulk(docs, scheme=scheme, **minhash_kwargs)
            host = np.stack(
                [np.asarray(m.hashvalues, dtype=np.uint64).astype(np.uint32)
                 for m in objs]
            )
            return _jnp().asarray(host) if out == "device" else host
        custom_perms = proto._custom_permutations()
        _check_scheme(scheme, custom_perms)
        order = sorted(range(len(docs)), key=lambda i: len(docs[i]))
        result = (
            np.empty((len(docs), proto.num_perm), dtype=np.uint32)
            if out == "host"
            else None
        )
        from datasketch_tpu.ops import minhash_ops

        use_flat = (
            proto.hashfunc in (sha1_hash32, xxhash_hash32)
            and scheme == "permutation"
        )
        # Pre-tokenized integer corpora: ship the raw ids, hash ON-CHIP
        # (fmix32 fused into the signature kernel) — the host does zero
        # per-token work. ~10x headroom over the SHA1 path, whose
        # end-to-end rate is bound by single-core host hashing.
        use_ids = proto.hashfunc is device_hash and scheme == "permutation"
        # Phase 1: hash + dispatch every chunk, kicking off the async D2H
        # copy immediately — device compute of chunk i+1 and host hashing of
        # chunk i+2 overlap the result transfer of chunk i (D2H through the
        # remote tunnel is ~20-50 MB/s and dominates otherwise; pipelined
        # in-flight copies measured 2.5x a sequential fetch loop).
        in_flight = []
        for start, stop in _budget_chunks([len(docs[i]) for i in order]):
            idx = order[start:stop]
            chunk = [docs[i] for i in idx]
            if use_flat or use_ids:
                # flat layout + device-side padding: ships no padding bytes
                if use_ids:
                    lengths = np.fromiter(
                        map(len, chunk), np.int32, count=len(chunk)
                    )
                    arrays = [np.asarray(d) for d in chunk]
                    if arrays and all(
                        a.dtype in (np.uint8, np.uint16) for a in arrays
                    ):
                        # already narrow: ship as-is (device zero-extends)
                        tgt = (
                            np.uint8
                            if all(a.dtype == np.uint8 for a in arrays)
                            else np.uint16
                        )
                        flat = np.concatenate(
                            [a.astype(tgt, copy=False) for a in arrays]
                        )
                    else:
                        flat = (
                            np.concatenate(
                                [a.astype(np.uint32) for a in arrays]
                            )
                            if arrays
                            else np.zeros(0, dtype=np.uint32)
                        )
                        # small-vocab wide-dtype ids: one cheap host pass
                        # halves the (bandwidth-bound) upload
                        if flat.size and int(flat.max()) < (1 << 16):
                            flat = flat.astype(np.uint16)
                else:
                    from datasketch_tpu.native import corpus

                    chunk = [
                        d if isinstance(d, list) else list(d) for d in chunk
                    ]
                    # ONE native call hashes straight into the contiguous
                    # buffer (no Python-level flatten of the token lists)
                    flat, lengths = corpus.hash_corpus_ragged(
                        chunk,
                        corpus.ALGO_SHA1_32
                        if proto.hashfunc is sha1_hash32
                        else corpus.ALGO_XXH32,
                    )
                dev = minhash_ops.compute_signatures_ragged(
                    flat, lengths, proto.seed, proto.num_perm,
                    permutations=custom_perms, mix=use_ids,
                )
            else:
                padded, lengths, n_real = proto._pad_corpus_for_device(chunk)
                if scheme != "permutation":
                    dev = _alt_scheme_signatures(
                        scheme, padded, lengths, proto.num_perm, proto.seed
                    )[:n_real]
                else:
                    dev = minhash_ops.compute_signatures(
                        padded, lengths, proto.seed, proto.num_perm,
                        permutations=custom_perms,
                    )[:n_real]
            if out == "host":
                _start_host_copy(dev)
            in_flight.append((idx, dev))
        if out == "device":
            return _device_finish(in_flight, len(docs))
        # Phase 2: collect in dispatch order (copies already in flight).
        for idx, dev in in_flight:
            result[np.asarray(idx)] = np.asarray(dev)
        return result

    @classmethod
    def bulk_from_text(cls, texts: Iterable, k: int = 9,
                       scheme: str = "permutation", out: str = "host",
                       **minhash_kwargs) -> np.ndarray:
        """Signature matrix straight from raw byte strings via k-shingling.

        The canonical dedup front end with ZERO Python tokenization. Two
        engines, picked by ``hashfunc``:

        - sha1 (default) / ``'xxh32'``: every overlapping k-byte shingle
          is hashed in C directly out of the text buffer (SHA-NI +
          content cache), then the device kernel takes over. Reference-
          interoperable values for sha1.
        - ``'device'``: the RAW TEXT is uploaded (1 byte per character
          instead of 4 bytes per shingle hash — ~4x less over the
          bandwidth-bound host->device link) and the shingles are hashed
          ON-CHIP (:mod:`datasketch_tpu.ops.text_ops`: polynomial window
          roll + fmix32). Host does zero per-shingle work. NOT
          value-compatible with the sha1 path (same estimator
          statistics).

        Returns uint32[N, num_perm]; a document shorter than k yields the
        empty-sketch row (all MAX_HASH). ``out='device'`` keeps the
        matrix device-resident (see :meth:`bulk_signatures`).

        Equivalent (but far faster) to hashing
        ``[text[i:i+k] for i in range(len(text)-k+1)]`` per document.
        """
        if out not in ("host", "device"):
            raise ValueError("out must be 'host' or 'device'")
        proto = cls(**minhash_kwargs)
        custom_perms = proto._custom_permutations()
        _check_scheme(scheme, custom_perms)
        use_device_shingles = proto.hashfunc is device_hash
        if proto.hashfunc is sha1_hash32:
            shingle_algo = 0  # corpus.ALGO_SHA1_32
        elif proto.hashfunc is xxhash_hash32:
            shingle_algo = 1  # corpus.ALGO_XXH32
        elif not use_device_shingles:
            raise ValueError(
                "bulk_from_text hashes shingles natively and supports only "
                "the sha1_hash32 (default), xxhash_hash32/'xxh32', and "
                "'device' (on-chip window hash) hash functions; "
                "shingle+hash with your callable and use "
                "bulk_signatures instead"
            )
        if use_device_shingles and scheme != "permutation":
            raise ValueError(
                "hashfunc='device' shingling supports only the default "
                "'permutation' scheme"
            )
        texts = texts if isinstance(texts, list) else list(texts)
        texts = [t.encode("utf-8") if isinstance(t, str) else t for t in texts]
        if not texts:
            empty = np.zeros((0, proto.num_perm), dtype=np.uint32)
            return _jnp().asarray(empty) if out == "device" else empty
        from datasketch_tpu.native import corpus
        from datasketch_tpu.ops import minhash_ops

        order = sorted(range(len(texts)), key=lambda i: len(texts[i]))
        result = (
            np.empty((len(texts), proto.num_perm), dtype=np.uint32)
            if out == "host"
            else None
        )
        shingle_counts = [max(0, len(texts[i]) - k + 1) for i in order]
        in_flight = []
        for start, stop in _budget_chunks(shingle_counts):
            idx = order[start:stop]
            chunk = [texts[i] for i in idx]
            if use_device_shingles:
                from datasketch_tpu.ops import text_ops

                lengths = np.fromiter(
                    map(len, chunk), np.int32, count=len(chunk)
                )
                flat = (
                    np.frombuffer(b"".join(chunk), dtype=np.uint8)
                    if chunk
                    else np.zeros(0, dtype=np.uint8)
                )
                dev = text_ops.shingle_signatures_ragged(
                    flat, lengths, k, proto.seed, proto.num_perm,
                    permutations=custom_perms,
                )
            else:
                max_sh = max(
                    (max(0, len(t) - k + 1) for t in chunk), default=1
                )
                t_bucket = _pow2_at_least(max_sh)
                padded, lengths = corpus.hash_shingles_padded(
                    chunk, k, shingle_algo, pad_multiple=t_bucket
                )
                if scheme != "permutation":
                    dev = _alt_scheme_signatures(
                        scheme, padded, lengths, proto.num_perm, proto.seed
                    )[: len(idx)]
                else:
                    dev = minhash_ops.compute_signatures(
                        padded, lengths, proto.seed, proto.num_perm,
                        permutations=custom_perms,
                    )[: len(idx)]
            if out == "host":
                _start_host_copy(dev)
            in_flight.append((idx, dev))
        if out == "device":
            return _device_finish(in_flight, len(texts))
        for idx, dev in in_flight:
            result[np.asarray(idx)] = np.asarray(dev)
        return result

    @classmethod
    def generator(cls, b: Iterable, scheme: str = "permutation", **minhash_kwargs):
        """Generator form of :meth:`bulk`, computing in device-sized chunks."""
        proto = cls(**minhash_kwargs)
        _check_scheme(scheme, proto._custom_permutations())
        chunk: list = []
        chunk_docs = 1024
        for doc in b:
            chunk.append(doc)
            if len(chunk) >= chunk_docs:
                yield from proto._bulk_chunk(chunk, scheme=scheme)
                chunk = []
        if chunk:
            yield from proto._bulk_chunk(chunk, scheme=scheme)

    def _pad_corpus_for_device(self, docs: list):
        """Hash + pad a doc chunk into the device input layout.

        Shared by both bulk schemes. T and B are bucketed to powers of two
        (ragged corpora otherwise pay a jit compile per (B, T) shape).
        Returns (padded uint32[B_pad, T_pad], lengths int32[B_pad], n_real).
        """
        from datasketch_tpu.ops import minhash_ops

        if self.hashfunc is sha1_hash32:
            from datasketch_tpu.native import corpus

            docs = [doc if isinstance(doc, list) else list(doc) for doc in docs]
            max_len = max((len(d) for d in docs), default=1)
            t_bucket = 128
            while t_bucket < max_len:
                t_bucket *= 2
            padded, lengths = corpus.hash_corpus_padded(
                docs, corpus.ALGO_SHA1_32, pad_multiple=t_bucket
            )
        else:
            hashed = [self._hash_tokens(list(doc)) for doc in docs]
            padded, lengths = minhash_ops.pad_token_hashes(hashed)
        n_real = padded.shape[0]
        b_bucket = 128
        while b_bucket < n_real:
            b_bucket *= 2
        if n_real != b_bucket:
            padded = np.pad(padded, ((0, b_bucket - n_real), (0, 0)))
            lengths = np.pad(lengths, (0, b_bucket - n_real))
        return padded, lengths, n_real

    def _yield_rows(self, sigs):
        for row in sigs:
            yield MinHash(
                seed=self.seed,
                hashfunc=self.hashfunc,
                hashvalues=row,
                permutations=self.permutations,
                device_mode=self._device_mode,
            )

    def _bulk_chunk_alt(self, docs: list, scheme: str):
        """Non-default-scheme signatures for a chunk (oph / cminhash).
        Signatures are valid MinHash state (uint32 values,
        MAX_HASH-initialized) but not value-compatible with the
        permutation scheme."""
        padded, lengths, n_real = self._pad_corpus_for_device(docs)
        sigs = np.asarray(
            _alt_scheme_signatures(
                scheme, padded, lengths, self.num_perm, self.seed
            )
        ).astype(np.uint64)[:n_real]
        yield from self._yield_rows(sigs)

    def _bulk_chunk(self, docs: list, scheme: str = "permutation"):
        from datasketch_tpu.ops import minhash_ops

        if scheme != "permutation":
            yield from self._bulk_chunk_alt(docs, scheme)
            return
        if self._device_mode == "disable":
            for doc in docs:
                m = self.copy()
                m.update_batch(doc)
                yield m
            return
        padded, lengths, n_real = self._pad_corpus_for_device(docs)
        total = int(np.asarray(lengths).sum())
        if total < _DEVICE_BATCH_THRESHOLD and self._device_mode != "always":
            # tiny chunk: reference NumPy formula beats a device dispatch
            for i in range(n_real):
                m = self.copy()
                doc_hashes = padded[i, : lengths[i]]
                if doc_hashes.size:
                    a, bb = self.permutations
                    hv64 = doc_hashes.astype(np.uint64)[:, None]
                    phv = np.bitwise_and((hv64 * a + bb) % _mersenne_prime, _max_hash)
                    m.hashvalues = np.minimum(m.hashvalues, phv.min(axis=0))
                yield m
            return
        sigs = np.asarray(
            minhash_ops.compute_signatures(
                padded, lengths, self.seed, self.num_perm,
                permutations=self._custom_permutations(),
            )
        ).astype(np.uint64)[:n_real]
        yield from self._yield_rows(sigs)

    def __getstate__(self):
        state = self.__dict__.copy()
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)

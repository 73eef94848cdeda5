"""TpuBBitIndex — device-resident top-k search over b-bit MinHash.

The reference's :class:`bBitMinHash` is a host pairwise object
(``/root/reference/datasketch/b_bit_minhash.py:13-172``); there is no
index over it. On TPU the b-bit compression earns an index of its own:
packed at s bits per slot (the reference's slot ladder), a b=4 corpus
streams 8x more sketches per byte of HBM through the exact-scan top-k
than full uint32 signatures — 32x at b=1 — so the brute-force serving
path of :func:`datasketch_tpu.ops.lsh_ops.topk_scan` stays HBM-resident
at corpus sizes where full signatures would spill. Scores are the
Li & Koenig unbiased Jaccard estimate ``(raw - C1) / (1 - C2)``
(``b_bit_minhash.py:53-72``), bit-exact vs ``bBitMinHash.jaccard`` on
the same pair.

Trade-off vs :class:`TpuMinHashLSH`'s scan: estimation noise grows as b
shrinks (the reference documents the accuracy/size trade,
``/root/reference/docs/minhash.rst`` b-bit section); ordering ties at
equal match count break by insertion order.
"""

from __future__ import annotations

import functools
from typing import Hashable, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from datasketch_tpu.models.tpu_lsh import _as_signature_matrix
from datasketch_tpu.ops import bbit_ops

__all__ = ["TpuBBitIndex"]


@functools.partial(
    jax.jit, static_argnames=("k", "b", "num_perm", "tile")
)
def _scan_packed(db_packed, q_packed, alive, n_valid, k: int, b: int,
                 num_perm: int, tile: int):
    """Fused scan with ids + exact match counts packed into ONE int32
    buffer [Q, 2, k] — one host fetch (a ~30ms tunnel RTT per extra
    buffer otherwise)."""
    ids, cnt = bbit_ops.bbit_topk_scan(
        db_packed, q_packed, k, b, num_perm,
        n_valid=n_valid, alive=alive, tile=tile,
    )
    return jnp.stack([ids, cnt], axis=1)


class TpuBBitIndex:
    """Exact-scan top-k index over b-bit compressed MinHash signatures.

    Args:
        b: Bits kept per hash value, in [1, 32] (stored at the slot-
            ladder width; b=1 stores 32 slots per uint32 word).
        num_perm: Signature length of indexed sketches.
        r: Expected density parameter of the Li & Koenig estimator
            (reference default 0.0, ``b_bit_minhash.py:33``).
        tile: Corpus rows scored per scan step (compile-shape bound).
    """

    def __init__(self, b: int = 4, num_perm: int = 128, r: float = 0.0,
                 tile: int = 2048):
        b = int(b)
        if b < 1 or b > 32:
            raise ValueError("b must be an integer in [1, 32]")
        if not 0.0 <= float(r) <= 1.0:
            raise ValueError("r must be a float in [0.0, 1.0]")
        if num_perm <= 0:
            raise ValueError("num_perm must be positive")
        self.b = b
        self.num_perm = int(num_perm)
        self.r = float(r)
        self.tile = int(tile)
        self.width = bbit_ops.words_per_sig(self.num_perm, b)
        c1, c2 = bbit_ops.estimator_constants(b, self.r, self.r)
        self._c1, self._c2 = c1, c2
        self._keys: list = []
        self._key_to_pos: dict = {}
        self._packed_host = np.zeros((0, self.width), dtype=np.uint32)
        self._alive_host = np.zeros(0, dtype=bool)
        self._packed_dev = None  # uint32[N_pad, W]
        self._alive_dev = None  # bool[N_pad]
        self._n_real_dev = None
        self._n_removed = 0

    # ------------------------------------------------------------- building

    def insert(self, key: Hashable, minhash) -> None:
        self.insert_batch([key], [minhash])

    def insert_batch(self, keys: Sequence[Hashable], minhashes) -> None:
        """Pack and append a batch; one upload re-syncs device state."""
        keys = list(keys)
        sigs = _as_signature_matrix(minhashes)
        if sigs.shape[0] != len(keys):
            raise ValueError("keys and minhashes must have equal length")
        if not keys:
            return
        if sigs.shape[1] < self.num_perm:
            raise ValueError("The num_perm of MinHash out of range")
        # validate the whole batch before mutating (no mid-batch poison)
        seen = set()
        for k in keys:
            if k in self._key_to_pos or k in seen:
                raise ValueError("The given key already exists: %r" % (k,))
            seen.add(k)
        packed = bbit_ops.pack_bbit_host(
            np.asarray(sigs)[:, : self.num_perm], self.b
        )
        base = len(self._keys)
        for i, k in enumerate(keys):
            self._key_to_pos[k] = base + i
        self._keys.extend(keys)
        self._packed_host = np.concatenate([self._packed_host, packed])
        self._alive_host = np.concatenate(
            [self._alive_host, np.ones(len(keys), dtype=bool)]
        )
        self._sync_device()

    def insert_tokens(self, keys: Sequence[Hashable], token_docs,
                      seed: int = 1) -> None:
        """Bulk-insert straight from PRE-TOKENIZED integer documents —
        ids hashed ON-CHIP (same contract as
        :meth:`~datasketch_tpu.models.tpu_lsh.TpuMinHashLSH.index_tokens`).
        Query with ``hashfunc='device'`` sketches at equal seed."""
        if len(keys) != len(token_docs):
            raise ValueError("keys and token_docs must have equal length")
        from datasketch_tpu.models.minhash import MinHash

        self.insert_batch(keys, MinHash.bulk_signatures(
            token_docs, num_perm=self.num_perm, seed=seed,
            hashfunc="device",
        ))

    def insert_text(self, keys: Sequence[Hashable], texts, k: int = 9,
                    seed: int = 1) -> None:
        """Bulk-insert straight from RAW TEXT via on-device k-shingling
        (same contract as
        :meth:`~datasketch_tpu.models.tpu_lsh.TpuMinHashLSH.index_text`)."""
        if len(keys) != len(texts):
            raise ValueError("keys and texts must have equal length")
        from datasketch_tpu.models.minhash import MinHash

        self.insert_batch(keys, MinHash.bulk_from_text(
            texts, k=k, num_perm=self.num_perm, seed=seed,
            hashfunc="device",
        ))

    def remove(self, key: Hashable) -> None:
        self.remove_batch([key])

    def remove_batch(self, keys: Sequence[Hashable]) -> None:
        """Tombstone keys (mask upload only — no corpus rebuild)."""
        for k in keys:
            pos = self._key_to_pos.pop(k, None)
            if pos is None:
                raise ValueError("The given key does not exist: %r" % (k,))
            self._alive_host[pos] = False
            self._n_removed += 1
        if self._packed_dev is not None:
            n_pad = self._packed_dev.shape[0]
            self._alive_dev = jnp.asarray(
                np.pad(self._alive_host, (0, n_pad - len(self._alive_host)))
            )

    def compact(self) -> None:
        """Drop tombstoned rows and re-pack positions."""
        if not self._n_removed:
            return
        keep = self._alive_host
        self._packed_host = self._packed_host[keep]
        self._keys = [k for k, a in zip(self._keys, keep) if a]
        self._key_to_pos = {k: i for i, k in enumerate(self._keys)}
        self._alive_host = np.ones(len(self._keys), dtype=bool)
        self._n_removed = 0
        self._sync_device()

    def _sync_device(self) -> None:
        n = len(self._keys)
        if n == 0:
            self._packed_dev = None
            self._alive_dev = None
            self._n_real_dev = None
            return
        n_pad = 128
        while n_pad < n:
            n_pad *= 2
        packed = self._packed_host
        alive = self._alive_host
        if n_pad != n:
            packed = np.pad(packed, ((0, n_pad - n), (0, 0)))
            alive = np.pad(alive, (0, n_pad - n))
        self._packed_dev = jnp.asarray(packed)
        self._alive_dev = jnp.asarray(alive)
        self._n_real_dev = jnp.int32(n)

    # -------------------------------------------------------------- queries

    def query(self, minhash, k: int) -> list:
        """Top-k keys by estimated Jaccard (b-bit match fraction)."""
        return self.query_batch([minhash], k)[0]

    def query_batch(self, minhashes, k: int, return_scores: bool = False):
        """Top-k for a query batch in one device dispatch.

        Returns a list per query of keys — or (key, corrected_estimate)
        pairs when ``return_scores`` — best match first.
        """
        out = self._query_dispatch(minhashes, k)
        if isinstance(out, list):
            return out
        return self._query_finish(out, k, return_scores)

    def query_stream(self, batches, k: int, return_scores: bool = False,
                     depth: int = 4):
        """Pipelined :meth:`query_batch` over an iterable of batches
        (see :mod:`datasketch_tpu.utils.pipeline`)."""
        from datasketch_tpu.utils.pipeline import stream_batches

        if k <= 0:
            raise ValueError("k must be positive")

        def _finish(out):
            if isinstance(out, list):
                return out
            return self._query_finish(out, k, return_scores)

        return stream_batches(
            batches, lambda bt: self._query_dispatch(bt, k), _finish,
            depth=depth,
        )

    def _query_dispatch(self, minhashes, k: int):
        if k <= 0:
            raise ValueError("k must be positive")
        if self._packed_dev is None:
            return [[] for _ in minhashes]
        q = _as_signature_matrix(minhashes)
        if q.shape[0] == 0:
            return []
        if q.shape[1] < self.num_perm:
            raise ValueError("The num_perm of MinHash out of range")
        nq = q.shape[0]
        q_packed = bbit_ops.pack_bbit_host(
            np.asarray(q)[:, : self.num_perm], self.b
        )
        q_pad = 8
        while q_pad < nq:
            q_pad *= 2
        if q_pad != nq:
            q_packed = np.pad(q_packed, ((0, q_pad - nq), (0, 0)))
        k_pad = max(8, 1 << (k - 1).bit_length())
        packed = _scan_packed(
            self._packed_dev, jnp.asarray(q_packed), self._alive_dev,
            self._n_real_dev, k_pad, self.b, self.num_perm, self.tile,
        )
        return packed, nq

    def _query_finish(self, out, k: int, return_scores: bool):
        packed, nq = out
        packed = np.asarray(packed)
        ids = packed[:nq, 0, :k]
        cnt = packed[:nq, 1, :k]
        result = []
        denom = 1.0 - self._c2
        for row_ids, row_cnt in zip(ids, cnt):
            hit = row_ids >= 0
            if return_scores:
                raw = row_cnt[hit].astype(np.float64) / self.num_perm
                est = (raw - self._c1) / denom
                result.append(
                    [
                        (self._keys[i], float(s))
                        for i, s in zip(row_ids[hit], est)
                    ]
                )
            else:
                result.append([self._keys[i] for i in row_ids[hit]])
        return result

    def warmup(self, batch_sizes=(8, 64), k: int = 10) -> None:
        """Pay per-shape compiles before serving traffic."""
        if self._packed_dev is None:
            return
        rng = np.random.RandomState(0)
        for q in batch_sizes:
            sigs = rng.randint(
                0, 1 << 32, size=(int(q), self.num_perm), dtype=np.uint64
            ).astype(np.uint32)
            self.query_batch(sigs, k)

    # ------------------------------------------------------------- plumbing

    def __contains__(self, key: Hashable) -> bool:
        return key in self._key_to_pos

    def __len__(self) -> int:
        return len(self._key_to_pos)

    def is_empty(self) -> bool:
        return not self._key_to_pos

    def status(self) -> dict:
        """Operational counters: live/tombstoned rows, padding, memory."""
        n_pad = 0 if self._packed_dev is None else int(
            self._packed_dev.shape[0]
        )
        return {
            "n_live": len(self._key_to_pos),
            "n_removed": self._n_removed,
            "n_padded": n_pad - len(self._keys),
            "b": self.b,
            "slot_bits": bbit_ops.slot_size(self.b),
            "words_per_sig": self.width,
            "compression_x": (4 * self.num_perm)
            / (4.0 * self.width),
            "device_bytes": n_pad * self.width * 4 + n_pad,
        }

    # ------------------------------------------------------------ persistence

    def save(self, path: str) -> None:
        """Persist packed rows + keys as .npz (tombstones compacted)."""
        from datasketch_tpu.persist import atomic_savez, pack_keys

        self.compact()
        atomic_savez(
            path,
            packed=self._packed_host,
            keys=pack_keys(self._keys),
            params=np.array(
                [self.b, self.num_perm, self.tile], dtype=np.int64
            ),
            r=np.float64(self.r),
        )

    @classmethod
    def load(cls, path: str) -> "TpuBBitIndex":
        """SECURITY: the key list inside the file is a pickle payload —
        only load index files you created or trust."""
        from datasketch_tpu.persist import npz_path, unpack_keys

        data = np.load(npz_path(path), allow_pickle=False)
        b, num_perm, tile = (int(x) for x in data["params"])
        obj = cls(b=b, num_perm=num_perm, r=float(data["r"]), tile=tile)
        keys = unpack_keys(data["keys"])
        packed = np.asarray(data["packed"], dtype=np.uint32)
        obj._keys = list(keys)
        obj._key_to_pos = {k: i for i, k in enumerate(obj._keys)}
        obj._packed_host = packed
        obj._alive_host = np.ones(len(obj._keys), dtype=bool)
        obj._sync_device()
        return obj

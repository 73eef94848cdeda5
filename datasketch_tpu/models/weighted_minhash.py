"""Weighted MinHash via Ioffe's Consistent Weighted Sampling.

API parity with ``/root/reference/datasketch/weighted_minhash.py:11,98``.
Parameter draws reproduce the reference's exact ``np.random.RandomState``
sequence (rs ~ Gamma(2,1), ln_cs = ln Gamma(2,1), betas ~ U(0,1), all
float32, weighted_minhash.py:114-121), and :meth:`minhash` vectorizes the
reference's per-sample loop with identical float32 arithmetic — hashvalues
are bit-identical at equal (seed, dim, sample_size).

One deliberate divergence: the reference's ``minhash_many`` uses
``ln_y = (t - beta + 1) * r`` (weighted_minhash.py:217) which its own
docstring admits "does not yield the same hash values as minhash"
(weighted_minhash.py:167-169). We canonicalize on the :meth:`minhash`
formula (``ln_y = (t - beta) * r``, the Ioffe paper's form) for all batch
paths, so batch and single results agree here.
"""

from __future__ import annotations

import copy

import numpy as np

__all__ = ["WeightedMinHash", "WeightedMinHashGenerator"]


class WeightedMinHash:
    """A weighted-Jaccard sketch: ``sample_size`` rows of (k, t) pairs.

    Create via :class:`WeightedMinHashGenerator`, or from (seed, hashvalues).
    """

    def __init__(self, seed: int, hashvalues: np.ndarray) -> None:
        self.seed = seed
        self.hashvalues = hashvalues

    def jaccard(self, other: "WeightedMinHash") -> float:
        """Estimated weighted Jaccard: fraction of equal (k, t) rows."""
        if other.seed != self.seed:
            raise ValueError(
                "Cannot compute Jaccard given WeightedMinHash objects with "
                "different seeds"
            )
        if len(self) != len(other):
            raise ValueError(
                "Cannot compute Jaccard given WeightedMinHash objects with "
                "different numbers of hash values"
            )
        intersection = int(
            np.count_nonzero(np.all(self.hashvalues == other.hashvalues, axis=1))
        )
        return float(intersection) / float(len(self))

    def digest(self) -> np.ndarray:
        return copy.copy(self.hashvalues)

    def copy(self) -> "WeightedMinHash":
        return WeightedMinHash(self.seed, self.digest())

    def __len__(self) -> int:
        return len(self.hashvalues)

    def __eq__(self, other) -> bool:
        return (
            type(self) is type(other)
            and self.seed == other.seed
            and np.array_equal(self.hashvalues, other.hashvalues)
        )


class WeightedMinHashGenerator:
    """Factory holding the CWS random parameters for a (dim, sample_size).

    Args:
        dim: Dimensionality of input weight vectors.
        sample_size: Number of (k, t) samples per sketch.
        seed: Seed for the parameter draws.
    """

    def __init__(self, dim: int, sample_size: int = 128, seed: int = 1) -> None:
        self.dim = dim
        self.sample_size = sample_size
        self.seed = seed
        generator = np.random.RandomState(seed=seed)
        self.rs = generator.gamma(2, 1, (sample_size, dim)).astype(np.float32)
        self.ln_cs = np.log(generator.gamma(2, 1, (sample_size, dim))).astype(
            np.float32
        )
        self.betas = generator.uniform(0, 1, (sample_size, dim)).astype(np.float32)
        self._params_t = None  # device-cached transposed params (sparse path)

    def minhash(self, v) -> WeightedMinHash:
        """Sketch one weight vector (CWS: k = argmin of ln a over active
        dims; weighted_minhash.py:123-159 semantics, vectorized)."""
        import collections.abc

        if not isinstance(v, collections.abc.Sized):
            raise TypeError("Input vector must be sized")
        if not len(v) == self.dim:
            raise ValueError("Input dimension mismatch, expecting %d" % self.dim)
        v = np.array(v, dtype=np.float32)
        vzeros = v == 0
        if vzeros.all():
            raise ValueError("Input is all zeros")
        v[vzeros] = np.nan
        vlog = np.log(v)
        t = np.floor((vlog / self.rs) + self.betas)
        ln_y = (t - self.betas) * self.rs
        ln_a = self.ln_cs - ln_y - self.rs
        k = np.nanargmin(ln_a, axis=1)
        hashvalues = np.zeros((self.sample_size, 2), dtype=int)
        hashvalues[:, 0] = k
        hashvalues[:, 1] = t[np.arange(self.sample_size), k].astype(int)
        return WeightedMinHash(self.seed, hashvalues)

    # Row-chunk budget for minhash_many: bounds the densified slice AND the
    # device intermediates to ~chunk_rows * dim floats regardless of corpus
    # size (the reference streams CSR row-by-row for the same reason,
    # weighted_minhash.py:192-247).
    _CHUNK_ELEMS = 1 << 22

    def minhash_many(self, X, out: str = "objects"):
        """Sketch each row of a (sparse or dense) weight matrix.

        Rows that are entirely zero yield ``None`` (parity with
        weighted_minhash.py:161-247). Uses the canonical :meth:`minhash`
        formula for every row (see module docstring) and the device batch
        kernel, STREAMING the input in bounded row chunks — sparse matrices
        are densified one chunk at a time, never whole (a dim=10k, 50k-row
        CSR would otherwise materialize 2GB on host).

        Args:
            out: ``'objects'`` (default) — list of
                :class:`WeightedMinHash` / None. ``'device'`` — one
                DEVICE-RESIDENT int32[N, sample_size, 2] array of (k, t)
                pairs that the device LSH indexes accept directly
                (``TpuMinHashLSH.index`` mixes them to band slots on
                device — weights in, servable index out, no host
                round trip of the sketches). All-zero rows raise
                ``ValueError`` here (there is no None slot in a dense
                device batch; filter them first).
        """
        import scipy.sparse as sp

        if out not in ("objects", "device"):
            raise ValueError("out must be 'objects' or 'device'")
        if not isinstance(X, (sp.spmatrix, np.ndarray)) and not sp.issparse(X):
            raise TypeError("Input X must be a sparse matrix or numpy matrix")
        if X.ndim != 2:
            raise ValueError("Input must have two dimensions")
        if X.shape[1] != self.dim:
            raise ValueError("Input dimension mismatch, expecting %d" % self.dim)
        issparse = sp.issparse(X)
        if issparse:
            # sparse input takes the sparse upload path: ship (values,
            # dim indices) per row and compute CWS over only the active
            # dims on device — ~nnz/dim of the dense bytes over the
            # host->device link (the end-to-end bound on tunnel-attached
            # TPUs, BASELINE.md) for bit-identical (k, t)
            return self._minhash_many_sparse(X.tocsr(), out)
        n = X.shape[0]
        if out == "device":
            return self._minhash_many_device(X, issparse, n)
        ret: list = [None] * n
        if n == 0:
            return ret
        from datasketch_tpu.ops import cws_ops

        from datasketch_tpu.utils.pipeline import stream_batches

        chunk = max(8, self._CHUNK_ELEMS // max(1, self.dim))
        chunk = 1 << (int(chunk) - 1).bit_length()  # pow2: one compile shape

        def _dispatch(start):
            block = X[start : start + chunk]
            dense = np.asarray(
                block.todense() if issparse else block, dtype=np.float32
            )
            rows = np.nonzero(~np.all(dense == 0, axis=1))[0]
            if rows.size == 0:
                return None
            sub = dense[rows]
            if sub.shape[0] != chunk:
                # zero-fill to the fixed chunk shape (zero rows produce
                # finite garbage that is sliced off below)
                sub = np.pad(sub, ((0, chunk - sub.shape[0]), (0, 0)))
            return (
                start,
                rows,
                cws_ops.cws_many_best(sub, self.rs, self.ln_cs, self.betas),
            )

        def _finish(out):
            if out is None:
                return
            start, rows, kt_dev = out
            kt = np.asarray(kt_dev)[: rows.size]
            for out_i, row_i in enumerate(rows):
                ret[start + row_i] = WeightedMinHash(
                    self.seed, kt[out_i].astype(int)
                )

        # pipelined: densifying chunk i+1 on host overlaps the device CWS
        # kernel and D2H of chunk i (each synchronous fetch is a full
        # round trip on tunnel-attached devices)
        for _ in stream_batches(
            range(0, n, chunk), _dispatch, _finish, depth=3
        ):
            pass
        return ret

    def _minhash_many_device(self, X, issparse: bool, n: int):
        """``minhash_many(out='device')`` body: chunked CWS straight to a
        device-resident (k, t) batch. Chunks stay a fixed pow-2 shape
        (one compiled kernel program); the tail chunk is zero-padded and
        sliced off after the device concat."""
        import jax.numpy as jnp

        from datasketch_tpu.ops import cws_ops

        if n == 0:
            return jnp.zeros((0, self.sample_size, 2), dtype=jnp.int32)
        chunk = max(8, self._CHUNK_ELEMS // max(1, self.dim))
        chunk = 1 << (int(chunk) - 1).bit_length()
        parts = []
        for start in range(0, n, chunk):
            block = X[start : start + chunk]
            dense = np.asarray(
                block.todense() if issparse else block, dtype=np.float32
            )
            if np.any(np.all(dense == 0, axis=1)):
                bad = start + int(
                    np.nonzero(np.all(dense == 0, axis=1))[0][0]
                )
                raise ValueError(
                    "row %d is all zeros; out='device' has no None slot — "
                    "filter zero rows first" % bad
                )
            if dense.shape[0] != chunk:
                dense = np.pad(dense, ((0, chunk - dense.shape[0]), (0, 0)))
            parts.append(
                cws_ops.cws_many_best(dense, self.rs, self.ln_cs, self.betas)
            )
        kt = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return kt[:n]

    # Row-chunk and nnz-bucket budget for the sparse path: bounds the
    # [chunk, NZ, S] gathered-parameter intermediates on device.
    _SPARSE_CHUNK_ELEMS = 1 << 25
    _SPARSE_MAX_CHUNK = 4096

    def _sparse_params(self):
        """Transposed [D, S] parameter tables, DEVICE-cached: uploaded
        once per generator instead of ~sample_size*dim*12 bytes per
        chunk call (15MB at dim=10k — a third of a second of tunnel
        H2D each, BASELINE.md rates)."""
        if self._params_t is None:
            import jax

            self._params_t = tuple(
                jax.device_put(np.ascontiguousarray(p.T))
                for p in (self.rs, self.ln_cs, self.betas)
            )
        return self._params_t

    def _minhash_many_sparse(self, X, out: str):
        """``minhash_many`` body for CSR input: ragged (values, dim
        indices) upload + the sparse CWS kernel.

        Chunks are a fixed pow-2 row count and nnz widths bucket to
        powers of two (bounded compile-shape count); indices stay in
        CSR ascending order so argmin tie-breaks match the dense path
        bit-for-bit. Entries with weight <= 0 are dropped up front
        (inactive everywhere: the reference's log(0/neg) -> NaN rows
        never win ``nanargmin``, and the dense kernels mask w > 0).
        Reference batch API: CSR-in
        ``/root/reference/datasketch/weighted_minhash.py:161-247``.
        """
        import jax.numpy as jnp

        from datasketch_tpu.ops import cws_ops
        from datasketch_tpu.utils.pipeline import stream_batches

        n = X.shape[0]
        if n == 0:
            return (
                jnp.zeros((0, self.sample_size, 2), dtype=jnp.int32)
                if out == "device"
                else []
            )
        if not X.has_sorted_indices:
            X = X.sorted_indices()
        data = np.asarray(X.data, dtype=np.float32)
        indices = np.asarray(X.indices, dtype=np.int32)
        indptr = np.asarray(X.indptr)
        pos_mask = data > 0
        cs = np.concatenate([[0], np.cumsum(pos_mask)])
        pnnz = (cs[indptr[1:]] - cs[indptr[:-1]]).astype(np.int64)
        if out == "device" and np.any(pnnz == 0):
            bad = int(np.nonzero(pnnz == 0)[0][0])
            raise ValueError(
                "row %d is all zeros; out='device' has no None slot — "
                "filter zero rows first" % bad
            )
        max_nnz = int(pnnz.max())
        nz_bucket = 1 << max(3, (max(1, max_nnz) - 1).bit_length())
        chunk = self._SPARSE_CHUNK_ELEMS // max(
            1, nz_bucket * self.sample_size
        )
        chunk = min(self._SPARSE_MAX_CHUNK, max(8, chunk))
        chunk = 1 << (int(chunk) - 1).bit_length()
        rs_t, lncs_t, betas_t = self._sparse_params()

        def _dispatch(start):
            stop = min(n, start + chunk)
            lo, hi = indptr[start], indptr[stop]
            sel = pos_mask[lo:hi]
            d = data[lo:hi][sel]
            ix = indices[lo:hi][sel]
            rn = pnnz[start:stop]
            # per-chunk nnz bucket: rows in a sparse corpus can be far
            # narrower than the corpus-wide max
            nz = 1 << max(3, (max(1, int(rn.max(initial=0))) - 1)
                          .bit_length())
            rows_rep = np.repeat(np.arange(stop - start), rn)
            cs2 = np.concatenate([[0], np.cumsum(rn)])
            cols = np.arange(d.shape[0]) - np.repeat(cs2[:-1], rn)
            vals = np.zeros((chunk, nz), np.float32)
            idxa = np.zeros((chunk, nz), np.int32)
            vals[rows_rep, cols] = d
            idxa[rows_rep, cols] = ix
            return start, stop, cws_ops.cws_many_sparse_best(
                vals, idxa, rs_t, lncs_t, betas_t
            )

        if out == "device":
            parts = [
                _dispatch(start)[2] for start in range(0, n, chunk)
            ]
            kt = (
                parts[0] if len(parts) == 1
                else jnp.concatenate(parts, axis=0)
            )
            return kt[:n]
        ret: list = [None] * n

        def _finish(out_):
            start, stop, kt_dev = out_
            kt = np.asarray(kt_dev)[: stop - start]
            for i in range(stop - start):
                if pnnz[start + i]:
                    ret[start + i] = WeightedMinHash(
                        self.seed, kt[i].astype(int)
                    )

        # pipelined: building chunk i+1's padded arrays on host overlaps
        # the device kernel and D2H of chunk i
        for _ in stream_batches(
            range(0, n, chunk), _dispatch, _finish, depth=3
        ):
            pass
        return ret

"""WeightedMinHash tests (coverage model:
/root/reference/test/test_weighted_minhash.py — params, jaccard semantics,
sparse/dense minhash_many, input non-mutation) plus device-batch agreement."""

import numpy as np
import pytest
import scipy.sparse as sp

from datasketch_tpu import WeightedMinHash, WeightedMinHashGenerator


class TestWeightedMinHashGenerator:
    def test_init(self):
        gen = WeightedMinHashGenerator(100, sample_size=64, seed=7)
        assert gen.rs.shape == (64, 100)
        assert gen.rs.dtype == np.float32
        assert np.all(gen.betas >= 0) and np.all(gen.betas <= 1)

    def test_param_reproducibility(self):
        """Same draw order as the reference (weighted_minhash.py:114-121)."""
        g1 = WeightedMinHashGenerator(50, 32, seed=3)
        g2 = WeightedMinHashGenerator(50, 32, seed=3)
        np.testing.assert_array_equal(g1.rs, g2.rs)
        np.testing.assert_array_equal(g1.ln_cs, g2.ln_cs)
        np.testing.assert_array_equal(g1.betas, g2.betas)
        gen = np.random.RandomState(seed=3)
        rs = gen.gamma(2, 1, (32, 50)).astype(np.float32)
        np.testing.assert_array_equal(g1.rs, rs)

    def test_minhash(self):
        gen = WeightedMinHashGenerator(20, sample_size=128)
        v = np.random.RandomState(0).randint(1, 10, 20)
        m = gen.minhash(v)
        assert isinstance(m, WeightedMinHash)
        assert m.hashvalues.shape == (128, 2)
        assert np.all(m.hashvalues[:, 0] >= 0)
        assert np.all(m.hashvalues[:, 0] < 20)

    def test_minhash_matches_reference_formula(self):
        """Bit-parity with the per-sample loop of weighted_minhash.py:153-158."""
        gen = WeightedMinHashGenerator(30, sample_size=64, seed=5)
        v = np.random.RandomState(1).randint(0, 5, 30).astype(np.float32)
        v[v.nonzero()[0][:2]] = 0  # keep some zeros
        m = gen.minhash(v.copy())
        vv = v.copy()
        vv[vv == 0] = np.nan
        vlog = np.log(vv)
        expect = np.zeros((64, 2), dtype=int)
        for i in range(64):
            t = np.floor((vlog / gen.rs[i]) + gen.betas[i])
            ln_y = (t - gen.betas[i]) * gen.rs[i]
            ln_a = gen.ln_cs[i] - ln_y - gen.rs[i]
            k = np.nanargmin(ln_a)
            expect[i] = k, int(t[k])
        np.testing.assert_array_equal(m.hashvalues, expect)

    def test_minhash_errors(self):
        gen = WeightedMinHashGenerator(10)
        with pytest.raises(ValueError):
            gen.minhash(np.zeros(10))
        with pytest.raises(ValueError):
            gen.minhash(np.ones(5))
        with pytest.raises(TypeError):
            gen.minhash(7)

    def test_input_not_mutated(self):
        gen = WeightedMinHashGenerator(10)
        v = np.array([1, 0, 2, 0, 3, 0, 4, 0, 5, 0], dtype=np.float32)
        v_orig = v.copy()
        gen.minhash(v)
        np.testing.assert_array_equal(v, v_orig)

    def test_jaccard_accuracy(self):
        gen = WeightedMinHashGenerator(200, sample_size=256)
        rng = np.random.RandomState(0)
        v1 = rng.randint(1, 10, 200).astype(np.float32)
        v2 = v1.copy()
        v2[:50] = rng.randint(1, 10, 50)
        m1, m2 = gen.minhash(v1), gen.minhash(v2)
        true_j = np.minimum(v1, v2).sum() / np.maximum(v1, v2).sum()
        assert abs(m1.jaccard(m2) - true_j) < 0.12
        assert m1.jaccard(m1) == 1.0


class TestMinhashMany:
    def test_dense_and_sparse_agree(self):
        gen = WeightedMinHashGenerator(40, sample_size=32, seed=2)
        X = np.random.RandomState(3).randint(0, 4, (8, 40)).astype(np.float32)
        X[2] = 0  # empty row
        dense = gen.minhash_many(X)
        sparse = gen.minhash_many(sp.csr_matrix(X))
        assert dense[2] is None and sparse[2] is None
        for d, s in zip(dense, sparse):
            if d is not None:
                np.testing.assert_array_equal(d.hashvalues, s.hashvalues)

    def test_many_agrees_with_single(self):
        """Our batch path uses the canonical minhash formula — rows agree
        with minhash() (the reference's own batch path diverges, see
        weighted_minhash.py:167-169)."""
        gen = WeightedMinHashGenerator(40, sample_size=64, seed=2)
        X = np.random.RandomState(4).randint(0, 6, (6, 40)).astype(np.float32)
        X[X.sum(axis=1) == 0, 0] = 1
        many = gen.minhash_many(X)
        agree = 0
        total = 0
        for i in range(6):
            single = gen.minhash(X[i])
            total += len(single)
            agree += int(
                np.count_nonzero(
                    np.all(single.hashvalues == many[i].hashvalues, axis=1)
                )
            )
        # float32 device vs host argmin may differ on rare near-ties
        assert agree / total > 0.98

    def test_wrong_inputs(self):
        gen = WeightedMinHashGenerator(10)
        with pytest.raises(TypeError):
            gen.minhash_many([[1, 2]])
        with pytest.raises(ValueError):
            gen.minhash_many(np.ones((2, 5)))
        with pytest.raises(ValueError):
            gen.minhash_many(np.ones(10))


class TestWeightedMinHashObject:
    def test_jaccard_errors(self):
        g1 = WeightedMinHashGenerator(10, seed=1)
        g2 = WeightedMinHashGenerator(10, seed=2)
        m1 = g1.minhash(np.ones(10))
        m2 = g2.minhash(np.ones(10))
        with pytest.raises(ValueError):
            m1.jaccard(m2)
        g3 = WeightedMinHashGenerator(10, sample_size=64, seed=1)
        with pytest.raises(ValueError):
            m1.jaccard(g3.minhash(np.ones(10)))

    def test_copy_digest_eq(self):
        gen = WeightedMinHashGenerator(10)
        m = gen.minhash(np.arange(1, 11))
        c = m.copy()
        assert c == m
        c.hashvalues[0, 0] += 1
        assert c != m
        assert len(m) == 128


class TestMinhashManyStreaming:
    def test_sparse_chunked_matches_per_row(self, monkeypatch):
        import scipy.sparse as sp

        from datasketch_tpu import WeightedMinHashGenerator

        gen = WeightedMinHashGenerator(120, sample_size=32, seed=5)
        # force many small chunks to exercise the streaming path
        monkeypatch.setattr(WeightedMinHashGenerator, "_CHUNK_ELEMS", 120 * 8)
        rng = np.random.RandomState(3)
        dense = rng.rand(50, 120).astype(np.float32)
        dense[dense < 0.7] = 0.0  # sparse-ish
        dense[7] = 0.0  # all-zero rows -> None
        dense[23] = 0.0
        X = sp.csr_matrix(dense)
        out = gen.minhash_many(X)
        assert out[7] is None and out[23] is None
        for i in range(50):
            if i in (7, 23):
                continue
            expect = gen.minhash(dense[i])
            np.testing.assert_array_equal(
                out[i].hashvalues, expect.hashvalues, err_msg=str(i)
            )
            assert out[i].seed == gen.seed

    def test_sparse_multichunk_and_device_out(self, monkeypatch):
        """The sparse upload path (values + dim indices, no densify)
        across multiple chunks and nnz buckets: objects match minhash()
        bit-for-bit, out='device' matches the objects, zero rows are
        None / raise."""
        from datasketch_tpu import WeightedMinHashGenerator

        gen = WeightedMinHashGenerator(200, sample_size=32, seed=9)
        monkeypatch.setattr(
            WeightedMinHashGenerator, "_SPARSE_CHUNK_ELEMS", 8 * 32 * 32
        )
        rng = np.random.RandomState(11)
        dense = rng.rand(40, 200).astype(np.float32)
        dense[dense < 0.9] = 0.0  # ~10% dense, ragged nnz per row
        dense[5] = 0.0  # all-zero row
        dense[np.arange(40) != 5, 0] = np.maximum(
            dense[np.arange(40) != 5, 0], 0.1
        )  # no other all-zero rows
        X = sp.csr_matrix(dense)
        out = gen.minhash_many(X)
        assert out[5] is None
        for i in range(40):
            if i == 5:
                continue
            np.testing.assert_array_equal(
                out[i].hashvalues, gen.minhash(dense[i]).hashvalues,
                err_msg=str(i),
            )
        with pytest.raises(ValueError):
            gen.minhash_many(X, out="device")
        keep = np.arange(40) != 5
        kt = np.asarray(gen.minhash_many(X[keep], out="device"))
        for j, i in enumerate(np.nonzero(keep)[0]):
            np.testing.assert_array_equal(kt[j], out[i].hashvalues)

    def test_sparse_negative_and_explicit_zero_entries(self):
        """CSR entries with weight <= 0 are inactive (reference: log of
        0/negative -> NaN, never wins nanargmin)."""
        from datasketch_tpu import WeightedMinHashGenerator

        gen = WeightedMinHashGenerator(30, sample_size=16, seed=4)
        dense = np.zeros((3, 30), np.float32)
        dense[0, [2, 7, 19]] = [1.5, 2.0, 0.25]
        dense[1, [0, 29]] = [3.0, 1.0]
        dense[2, [4, 9]] = [2.0, 5.0]
        # explicit zero (0, 11) and negative (2, 13) stored entries do
        # not change the active set
        rows = [0, 0, 0, 0, 1, 1, 2, 2, 2]
        cols = [2, 7, 11, 19, 0, 29, 4, 9, 13]
        vals = [1.5, 2.0, 0.0, 0.25, 3.0, 1.0, 2.0, 5.0, -1.0]
        X = sp.csr_matrix(
            (np.array(vals, np.float32), (rows, cols)), shape=(3, 30)
        )
        assert X.nnz == 9  # the zero/negative entries really are stored
        out = gen.minhash_many(X)
        for i in range(3):
            np.testing.assert_array_equal(
                out[i].hashvalues, gen.minhash(dense[i]).hashvalues
            )

    def test_dense_input_and_validation(self):
        from datasketch_tpu import WeightedMinHashGenerator

        gen = WeightedMinHashGenerator(16, sample_size=16)
        rng = np.random.RandomState(0)
        X = rng.rand(9, 16).astype(np.float32)
        out = gen.minhash_many(X)
        for i in range(9):
            np.testing.assert_array_equal(
                out[i].hashvalues, gen.minhash(X[i]).hashvalues
            )
        with pytest.raises(TypeError):
            gen.minhash_many([[1.0] * 16])
        with pytest.raises(ValueError):
            gen.minhash_many(X[:, :8])

"""MinHashLSHEnsemble tests (model: /root/reference/test/test_lshensemble.py
— randomized sets, query self-recall) plus partitioner properties."""

import numpy as np
import pytest

from datasketch_tpu import MinHash, MinHashLSHEnsemble
from datasketch_tpu.models.lshensemble import optimal_partitions, _nfps_matrix

from .utils import fake_hash_func


def _entries(n=40, seed=0, num_perm=128):
    rng = np.random.RandomState(seed)
    entries = []
    for i in range(n):
        size = int(rng.randint(10, 200))
        vals = [int(x) for x in rng.randint(0, 2**31, size)]
        m = MinHash(num_perm, hashfunc=fake_hash_func)
        m.update_batch(vals)
        entries.append((f"e{i}", m, len(set(vals)), set(vals)))
    return entries


class TestPartitioner:
    def test_edge_cases(self):
        sizes = np.array([1, 5, 10, 50])
        counts = np.array([3, 2, 1, 4])
        assert optimal_partitions(sizes, counts, 1) == [(1, 50)]
        assert optimal_partitions(sizes, counts, 4) == [(1, 1), (5, 5), (10, 10), (50, 50)]
        assert optimal_partitions(sizes, counts, 9) == [(1, 1), (5, 5), (10, 10), (50, 50)]

    def test_partitions_cover_domain(self):
        rng = np.random.RandomState(1)
        sizes = np.unique(rng.randint(1, 1000, 60))
        counts = rng.randint(1, 20, len(sizes))
        for num_part in (2, 3, 8):
            parts = optimal_partitions(sizes, counts, num_part)
            assert parts[0][0] == sizes[0]
            assert parts[-1][1] == sizes[-1]
            for (l1, u1), (l2, u2) in zip(parts, parts[1:]):
                assert u1 < l2
                # contiguous over the size domain
                between = sizes[(sizes > u1) & (sizes < l2)]
                assert len(between) == 0

    def test_nfps_matrix_matches_naive(self):
        rng = np.random.RandomState(2)
        sizes = np.unique(rng.randint(1, 100, 15)).astype(float)
        counts = rng.randint(1, 10, len(sizes)).astype(float)
        got = _nfps_matrix(counts, sizes)
        n = len(sizes)
        for l in range(n):
            for u in range(l, n):
                expect = np.sum(
                    (sizes[u] - sizes[l : u + 1]) / sizes[u] * counts[l : u + 1]
                )
                assert abs(got[l, u] - expect) < 1e-9


class TestMinHashLSHEnsemble:
    def test_init_validation(self):
        with pytest.raises(ValueError):
            MinHashLSHEnsemble(threshold=1.5)
        with pytest.raises(ValueError):
            MinHashLSHEnsemble(num_perm=1)
        with pytest.raises(ValueError):
            MinHashLSHEnsemble(num_part=0)
        with pytest.raises(ValueError):
            MinHashLSHEnsemble(m=1)
        with pytest.raises(ValueError):
            MinHashLSHEnsemble(weights=(0.6, 0.6))

    def test_index_and_self_recall(self):
        ens = MinHashLSHEnsemble(threshold=0.8, num_perm=128, num_part=4)
        entries = _entries()
        ens.index([(k, m, s) for k, m, s, _ in entries])
        assert not ens.is_empty()
        recalled = 0
        for k, m, s, _ in entries:
            if k in set(ens.query(m, s)):
                recalled += 1
        assert recalled / len(entries) > 0.9

    def test_index_once_only(self):
        ens = MinHashLSHEnsemble(threshold=0.8, num_perm=128, num_part=2)
        entries = _entries(10)
        ens.index([(k, m, s) for k, m, s, _ in entries])
        with pytest.raises(ValueError):
            ens.index([(k, m, s) for k, m, s, _ in entries])

    def test_bad_entries(self):
        ens = MinHashLSHEnsemble(threshold=0.8, num_perm=128, num_part=2)
        with pytest.raises(ValueError):
            ens.index([])
        m = MinHash(128)
        with pytest.raises(ValueError):
            ens.index([("a", m, 0)])

    def test_containment_behavior(self):
        """A small set fully contained in a big indexed set is found."""
        rng = np.random.RandomState(3)
        big = [int(x) for x in rng.randint(0, 2**31, 500)]
        mb = MinHash(128, hashfunc=fake_hash_func)
        mb.update_batch(big)
        others = _entries(20, seed=4)
        ens = MinHashLSHEnsemble(threshold=0.7, num_perm=128, num_part=4)
        ens.index(
            [("big", mb, len(set(big)))]
            + [(k, m, s) for k, m, s, _ in others]
        )
        # query = subset of big
        sub = big[:60]
        ms = MinHash(128, hashfunc=fake_hash_func)
        ms.update_batch(sub)
        assert "big" in set(ens.query(ms, len(set(sub))))
        assert "big" in ens
        assert "nope" not in ens


def test_tpu_ensemble_matches_host_candidates():
    import numpy as np

    from datasketch_tpu import MinHash, MinHashLSHEnsemble
    from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

    rng = np.random.RandomState(0)
    universe = rng.randint(0, 2**31, size=2000)
    entries, sets = [], []
    for i in range(60):
        size = rng.randint(10, 200)
        items = rng.choice(universe, size=size, replace=False)
        m = MinHash(num_perm=128)
        m.update_batch([int(v).to_bytes(8, "little") for v in items])
        entries.append(("k%d" % i, m, len(items)))
        sets.append(set(int(v) for v in items))

    host = MinHashLSHEnsemble(threshold=0.6, num_perm=128, num_part=8)
    host.index(entries)
    tpu = TpuMinHashLSHEnsemble(threshold=0.6, num_perm=128, num_part=8,
                                bucket_cap=64)
    tpu.index(entries)
    assert "k0" in tpu and not tpu.is_empty()

    for i in (0, 7, 23):
        key, mh, size = entries[i]
        host_res = set(host.query(mh, size))
        tpu_res = set(tpu.query(mh, size))
        assert key in tpu_res  # self containment = 1
        # fingerprint collisions can only ADD candidates vs byte-key tables
        assert host_res <= tpu_res

    # batch form agrees with the generator form
    batch = tpu.query_batch([(entries[0][1], entries[0][2])])
    assert set(batch[0]) == set(tpu.query(entries[0][1], entries[0][2]))

    import pytest

    with pytest.raises(ValueError):
        tpu.index(entries)  # one-shot


def test_tpu_ensemble_mixed_r_queries():
    """Queries whose x/q ratios select DIFFERENT (b, r) pairs must each
    probe with their own parameters inside the stacked per-r dispatch."""
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

    rng = np.random.RandomState(4)
    universe = rng.randint(0, 2**31, size=30000)
    entries, sets = [], []
    # extreme size spread forces several partitions AND several r picks
    for i, size in enumerate([10, 12, 15, 40, 45, 60, 300, 350, 420,
                              1500, 1800, 2400]):
        items = rng.choice(universe, size=size, replace=False)
        m = MinHash(num_perm=128)
        m.update_batch([int(v).to_bytes(8, "little") for v in items])
        entries.append((f"k{i}", m, size))
        sets.append(items)
    ens = TpuMinHashLSHEnsemble(threshold=0.7, num_perm=128, num_part=4,
                                bucket_cap=32)
    ens.index(entries)

    # every entry must find itself (containment 1.0) regardless of which
    # r its partition/ratio picks
    pairs = [(m, s) for _, m, s in entries]
    rows = ens.query_batch(pairs)
    for i, row in enumerate(rows):
        assert f"k{i}" in row, (i, row)

    # a strict subset query: high containment in its superset
    sub_items = sets[-1][:1200]
    m = MinHash(num_perm=128)
    m.update_batch([int(v).to_bytes(8, "little") for v in sub_items])
    res = list(ens.query(m, len(sub_items)))
    assert "k11" in res


def test_tpu_ensemble_save_load_roundtrip(tmp_path):
    import numpy as np

    from datasketch_tpu import MinHash
    from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble

    rng = np.random.RandomState(9)
    universe = rng.randint(0, 2**31, size=3000)
    entries = []
    for i in range(40):
        size = rng.randint(10, 300)
        items = rng.choice(universe, size=size, replace=False)
        m = MinHash(num_perm=128)
        m.update_batch([int(v).to_bytes(8, "little") for v in items])
        entries.append((f"k{i}", m, size))
    ens = TpuMinHashLSHEnsemble(threshold=0.6, num_perm=128, num_part=4,
                                bucket_cap=32)

    import pytest

    with pytest.raises(ValueError):
        ens.save(str(tmp_path / "empty.npz"))
    ens.index(entries)
    path = str(tmp_path / "ens.npz")
    ens.save(path)
    back = TpuMinHashLSHEnsemble.load(path)
    assert len(back) == len(ens) and "k0" in back
    pairs = [(m, s) for _, m, s in entries[:10]]
    a = [set(r) for r in ens.query_batch(pairs)]
    b = [set(r) for r in back.query_batch(pairs)]
    assert a == b

"""Randomized oracle checks for the device threshold-query paths.

The scan method's contract is exact over stored sketches: every alive key
whose signature-equality score clears the cutoff, score-descending. That
is cheap to recompute in NumPy, so these tests fuzz corpora/tombstones/
merges and compare the device pipeline against the host oracle — the
strongest invariant available for the round-3 device finishes.
"""

from __future__ import annotations

import numpy as np
import pytest

from datasketch_tpu import MinHash, TpuMinHashLSH


def _random_sigs(rng, n, num_perm=128, vocab=6):
    # low-cardinality slots force heavy score ties and duplicate-ish rows
    return rng.randint(0, vocab, size=(n, num_perm)).astype(np.uint32)


def _oracle(sigs, alive, q, cutoff):
    scores = (sigs == q[None, :]).mean(axis=1)
    return {
        i: float(s)
        for i, s in enumerate(scores)
        if alive[i] and s >= cutoff
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scan_threshold_matches_numpy_oracle(seed):
    rng = np.random.RandomState(seed)
    n = int(rng.randint(30, 300))
    sigs = _random_sigs(rng, n)
    index = TpuMinHashLSH(threshold=0.4, num_perm=128, bucket_cap=32)
    index.index(list(range(n)), sigs)
    alive = np.ones(n, dtype=bool)
    for key in rng.choice(n, size=n // 5, replace=False):
        index.remove(int(key))
        alive[int(key)] = False
    queries = _random_sigs(rng, 7)
    cutoff = float(rng.choice([0.3, 0.4, 0.55]))
    rows = index.query_batch(
        [MinHash(hashvalues=r) for r in queries],
        threshold=cutoff,
        return_scores=True,
        method="scan",
    )
    for q, row in zip(queries, rows):
        want = _oracle(sigs, alive, q, cutoff)
        got = dict(row)
        assert set(got) == set(want), (set(got) ^ set(want))
        for k, s in got.items():
            assert s == pytest.approx(want[k])
        scores = [s for _, s in row]
        assert scores == sorted(scores, reverse=True)


@pytest.mark.parametrize("seed", [3, 4])
def test_bands_threshold_subset_of_oracle(seed):
    """Band candidates that clear the cutoff are a subset of the exact
    answer, and every returned score matches the oracle's."""
    rng = np.random.RandomState(seed)
    n = int(rng.randint(50, 200))
    sigs = _random_sigs(rng, n)
    index = TpuMinHashLSH(threshold=0.4, num_perm=128, bucket_cap=n)
    index.index(list(range(n)), sigs)
    queries = _random_sigs(rng, 5)
    rows = index.query_batch(
        [MinHash(hashvalues=r) for r in queries],
        return_scores=True,
        method="bands",
    )
    assert index.last_truncated == 0  # cap covers the whole corpus
    for q, row in zip(queries, rows):
        want = _oracle(sigs, np.ones(n, bool), q, 0.4)
        for k, s in row:
            assert k in want and s == pytest.approx(want[k])


def test_merge_equals_single_build_threshold():
    rng = np.random.RandomState(9)
    sigs = _random_sigs(rng, 120)
    a = TpuMinHashLSH(threshold=0.4, num_perm=128, bucket_cap=64)
    a.index(list(range(60)), sigs[:60])
    b = TpuMinHashLSH(
        threshold=0.4, num_perm=128, params=(a.b, a.r), bucket_cap=64
    )
    b.index(list(range(60, 120)), sigs[60:])
    a.merge(b)
    single = TpuMinHashLSH(
        threshold=0.4, num_perm=128, params=(a.b, a.r), bucket_cap=64
    )
    single.index(list(range(120)), sigs)
    queries = [MinHash(hashvalues=r) for r in sigs[::17]]
    for merged_row, single_row in zip(
        a.query_batch(queries, method="scan"),
        single.query_batch(queries, method="scan"),
    ):
        assert set(merged_row) == set(single_row)


def test_max_results_is_top_scoring_prefix_of_oracle():
    rng = np.random.RandomState(11)
    sigs = _random_sigs(rng, 100, vocab=3)  # high collision rate
    index = TpuMinHashLSH(
        threshold=0.3, num_perm=128, bucket_cap=32, max_results=5
    )
    index.index(list(range(100)), sigs)
    q = sigs[0]
    row = index.query_batch(
        [MinHash(hashvalues=q)], return_scores=True, method="scan"
    )[0]
    want = _oracle(sigs, np.ones(100, bool), q, 0.3)
    assert len(row) <= 5
    # every returned score is >= every omitted oracle score
    if want and row:
        floor = min(s for _, s in row)
        omitted = [s for k, s in want.items() if k not in dict(row)]
        assert all(floor >= s - 1e-6 for s in omitted)
    if len(want) > 5:
        assert index.last_truncated >= len(want) - 5

"""Statistical acceptance tests for the estimators.

Golden-value tests pin exact outputs; these pin the statistical CLAIMS —
unbiasedness and the ~1/sqrt(num_perm) error scaling MinHash promises —
so a numerically-plausible-but-wrong kernel change (biased tie-breaks,
broken bin assignment, masking errors) fails loudly. All thresholds are
3-sigma-ish at fixed seeds: deterministic, no flakes.
"""

import numpy as np

from datasketch_tpu import MinHash, bBitMinHash


def _pair_with_jaccard(rng, true_j, universe=20000, size=600):
    """Two token sets with an exact target Jaccard."""
    inter = int(round(size * 2 * true_j / (1 + true_j)))
    only = size - inter
    toks = rng.choice(universe, size=inter + 2 * only, replace=False)
    shared = toks[:inter]
    a = np.concatenate([shared, toks[inter : inter + only]])
    b = np.concatenate([shared, toks[inter + only :]])
    docs = [[int(t).to_bytes(4, "little") for t in s] for s in (a, b)]
    true = inter / (2 * size - inter)
    return docs, true


def _estimate_errors(num_perm, trials=30, true_j=0.5, seed=7):
    rng = np.random.RandomState(seed)
    errs = []
    for t in range(trials):
        docs, true = _pair_with_jaccard(rng, true_j)
        sigs = MinHash.bulk_signatures(docs, num_perm=num_perm, seed=t)
        est = float(np.mean(sigs[0] == sigs[1]))
        errs.append(est - true)
    return np.asarray(errs)


def test_minhash_estimator_unbiased_and_error_scales():
    errs_64 = _estimate_errors(64)
    errs_256 = _estimate_errors(256)
    # unbiased: mean error within 3 * sigma/sqrt(trials) of zero
    for errs, p in ((errs_64, 64), (errs_256, 256)):
        sigma = 0.5 / np.sqrt(p)  # sqrt(j(1-j)/p) at j=0.5
        assert abs(errs.mean()) < 3 * sigma / np.sqrt(len(errs)) + 0.01, p
        # per-trial error bounded by the binomial std dev envelope
        assert np.abs(errs).mean() < 2.0 * sigma, p
    # 4x the permutations should roughly halve the mean abs error
    ratio = np.abs(errs_64).mean() / max(np.abs(errs_256).mean(), 1e-9)
    assert 1.2 < ratio < 3.5, ratio


def test_minhash_estimator_across_jaccard_levels():
    rng = np.random.RandomState(11)
    for true_j in (0.1, 0.3, 0.7, 0.9):
        est_sum, true_sum = 0.0, 0.0
        for t in range(10):
            docs, true = _pair_with_jaccard(rng, true_j)
            sigs = MinHash.bulk_signatures(docs, num_perm=256, seed=100 + t)
            est_sum += float(np.mean(sigs[0] == sigs[1]))
            true_sum += true
        assert abs(est_sum / 10 - true_sum / 10) < 0.04, true_j


def test_bbit_estimator_tracks_full_estimator():
    rng = np.random.RandomState(3)
    errs = []
    for t in range(10):
        docs, true = _pair_with_jaccard(rng, 0.6)
        m1 = MinHash(num_perm=256, seed=t)
        m2 = MinHash(num_perm=256, seed=t)
        m1.update_batch(docs[0])
        m2.update_batch(docs[1])
        b1, b2 = bBitMinHash(m1, b=1), bBitMinHash(m2, b=1)
        errs.append(b1.jaccard(b2) - true)
    errs = np.asarray(errs)
    # 1-bit sketches halve the information: looser but bounded error
    assert abs(errs.mean()) < 0.06
    assert np.abs(errs).mean() < 0.1

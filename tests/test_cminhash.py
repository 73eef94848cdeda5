"""C-MinHash scheme: bit-exactness, estimator quality, bulk integration."""

import numpy as np
import pytest

from datasketch_tpu import MinHash
from datasketch_tpu.ops import cminhash


def _pad(docs, t=None):
    t = t or max((len(d) for d in docs), default=1)
    out = np.zeros((len(docs), t), dtype=np.uint32)
    lengths = np.zeros(len(docs), dtype=np.int32)
    for i, d in enumerate(docs):
        out[i, : len(d)] = d
        lengths[i] = len(d)
    return out, lengths


def _mix32_np(x):
    x = x.astype(np.uint32).copy()
    x ^= x >> np.uint32(16)
    x = x * np.uint32(0x85EBCA6B)
    x ^= x >> np.uint32(13)
    x = x * np.uint32(0xC2B2AE35)
    x ^= x >> np.uint32(16)
    return x


def _reference_cminhash(hashes, lengths, num_perm, seed):
    """Straight NumPy transcription of the definition."""
    s_sigma = (0x9E3779B1 ^ (seed * 0x45D9F3B)) & 0xFFFFFFFF
    s_pi = (0x7F4A7C15 ^ (seed * 0x2545F491)) & 0xFFFFFFFF
    out = np.full((hashes.shape[0], num_perm), 0xFFFFFFFF, dtype=np.uint32)
    for i in range(hashes.shape[0]):
        toks = hashes[i, : lengths[i]].astype(np.uint32)
        if not len(toks):
            continue
        sigma = _mix32_np(toks ^ np.uint32(s_sigma))
        for k in range(num_perm):
            v = _mix32_np((sigma + np.uint32(k)) ^ np.uint32(s_pi))
            out[i, k] = v.min()
    return out


def test_bit_exact_vs_numpy_definition():
    rng = np.random.RandomState(0)
    hashes = rng.randint(0, 1 << 32, size=(5, 30), dtype=np.uint64).astype(
        np.uint32
    )
    hashes[0, :4] = np.uint32(0xFFFFFFFA)  # exercise the sigma+k wrap
    lengths = np.array([30, 0, 7, 30, 1], dtype=np.int32)
    got = np.asarray(cminhash.cminhash_signatures(hashes, lengths, 32, seed=5))
    want = _reference_cminhash(hashes, lengths, 32, seed=5)
    np.testing.assert_array_equal(got, want)


def test_identical_docs_identical_signatures_and_merge_semantics():
    rng = np.random.RandomState(1)
    d = rng.randint(0, 1 << 32, size=50, dtype=np.uint64).astype(np.uint32)
    padded, lengths = _pad([list(d), list(d), list(d[:25]), []])
    sigs = np.asarray(cminhash.cminhash_signatures(padded, lengths, 64))
    np.testing.assert_array_equal(sigs[0], sigs[1])
    # subset: every slot of the subset's signature >= the superset's
    assert (sigs[2] >= sigs[0]).all()
    # empty doc: MAX_HASH row (valid empty MinHash state)
    assert (sigs[3] == 0xFFFFFFFF).all()
    # union-by-min of disjoint halves == whole-set signature
    padded2, lengths2 = _pad([list(d[:25]), list(d[25:])])
    halves = np.asarray(cminhash.cminhash_signatures(padded2, lengths2, 64))
    np.testing.assert_array_equal(np.minimum(halves[0], halves[1]), sigs[0])


def test_jaccard_estimation_accuracy_and_variance():
    """The C-MinHash papers' claim: unbiased with variance UNIFORMLY
    SMALLER than standard MinHash's. Fixed seeds — deterministic."""
    rng = np.random.RandomState(2)
    num_perm, trials = 128, 40
    true = 1 / 3
    errs_cm, errs_std = [], []
    for t in range(trials):
        universe = rng.randint(0, 1 << 32, size=900, dtype=np.uint64).astype(
            np.uint32
        )
        a, b = universe[:600], universe[300:]
        padded, lengths = _pad([list(a), list(b)])
        cm = np.asarray(
            cminhash.cminhash_signatures(padded, lengths, num_perm, seed=t)
        )
        errs_cm.append(float(np.mean(cm[0] == cm[1])) - true)
        docs = [[int(x).to_bytes(4, "little") for x in s] for s in (a, b)]
        std = MinHash.bulk_signatures(docs, num_perm=num_perm, seed=t)
        errs_std.append(float(np.mean(std[0] == std[1])) - true)
    errs_cm = np.asarray(errs_cm)
    errs_std = np.asarray(errs_std)
    sigma = np.sqrt(true * (1 - true) / num_perm)
    assert abs(errs_cm.mean()) < 3 * sigma / np.sqrt(trials) + 0.01
    # the variance selling point (measured 0.87x at 120 trials; allow
    # sampling slack at 40)
    assert errs_cm.var() < errs_std.var() * 1.25


def test_bulk_integration_and_errors():
    rng = np.random.RandomState(3)
    docs = [
        [bytes([j % 251, i, 7]) for j in range(rng.randint(10, 60))]
        for i in range(12)
    ]
    sigs = MinHash.bulk_signatures(docs, scheme="cminhash", num_perm=64)
    assert sigs.shape == (12, 64) and sigs.dtype == np.uint32
    objs = MinHash.bulk(docs, scheme="cminhash", num_perm=64)
    for row, m in zip(sigs, objs):
        np.testing.assert_array_equal(
            row, np.asarray(m.hashvalues, dtype=np.uint64).astype(np.uint32)
        )
    # self-jaccard via objects still works
    assert objs[0].jaccard(objs[0]) == 1.0
    # not value-compatible with the default scheme
    std = MinHash.bulk_signatures(docs, num_perm=64)
    assert not np.array_equal(sigs, std)
    # text front end
    texts = [b"abcdefghijklmnop" * 3, b"abcdefghijklmnop" * 3 + b"xyz"]
    ts = MinHash.bulk_from_text(texts, k=9, scheme="cminhash", num_perm=64)
    assert float(np.mean(ts[0] == ts[1])) > 0.5
    # custom permutations are rejected for the scheme
    from datasketch_tpu.ops.minhash_ops import init_permutations

    a, b = init_permutations(99, 64)
    with pytest.raises(ValueError, match="custom permutations"):
        MinHash.bulk_signatures(
            docs, scheme="cminhash", num_perm=64, permutations=(a, b)
        )
    with pytest.raises(ValueError, match="unknown signature scheme"):
        MinHash.bulk_signatures(docs, scheme="nope", num_perm=64)

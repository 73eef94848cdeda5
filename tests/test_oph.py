"""Densified one-permutation hashing: accuracy and invariants."""

import numpy as np
import pytest

from datasketch_tpu.ops import oph


def _pad(docs, t=None):
    t = t or max(len(d) for d in docs)
    out = np.zeros((len(docs), t), dtype=np.uint32)
    lengths = np.zeros(len(docs), dtype=np.int32)
    for i, d in enumerate(docs):
        out[i, : len(d)] = d
        lengths[i] = len(d)
    return out, lengths


def test_identical_docs_identical_signatures():
    rng = np.random.RandomState(0)
    doc = rng.randint(1, 1 << 32, size=50, dtype=np.uint64).astype(np.uint32)
    h, l = _pad([doc, doc])
    sigs = np.asarray(oph.oph_signatures(h, l, 128))
    assert np.array_equal(sigs[0], sigs[1])


def test_empty_doc_stays_max_hash():
    h, l = _pad([np.zeros(0, np.uint32), np.arange(1, 20, dtype=np.uint32)], t=32)
    sigs = np.asarray(oph.oph_signatures(h, l, 64))
    assert (sigs[0] == 0xFFFFFFFF).all()
    assert not (sigs[1] == 0xFFFFFFFF).all()


@pytest.mark.parametrize("num_perm", [64, 128])
def test_jaccard_estimation_accuracy(num_perm):
    rng = np.random.RandomState(42)
    n_pairs, errs = 15, []
    for _ in range(n_pairs):
        size = rng.randint(100, 400)
        overlap = rng.uniform(0.1, 0.9)
        n_common = int(size * overlap)
        common = rng.randint(1, 1 << 31, size=n_common).astype(np.uint32)
        a_only = rng.randint(1 << 31, 1 << 32, size=size - n_common,
                             dtype=np.uint64).astype(np.uint32)
        b_only = rng.randint(1, 1 << 31, size=size - n_common).astype(
            np.uint32) | np.uint32(1 << 30)
        a = np.unique(np.concatenate([common, a_only]))
        b = np.unique(np.concatenate([common, b_only]))
        true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
        h, l = _pad([a, b])
        sigs = np.asarray(oph.oph_signatures(h, l, num_perm))
        est = float(np.mean(sigs[0] == sigs[1]))
        errs.append(abs(est - true_j))
    # MinHash-like error: a few sigma of 1/sqrt(num_perm)
    assert np.mean(errs) < 2.0 / np.sqrt(num_perm), np.mean(errs)


def test_duplicate_tokens_do_not_change_signature():
    rng = np.random.RandomState(1)
    doc = rng.randint(1, 1 << 32, size=30, dtype=np.uint64).astype(np.uint32)
    h1, l1 = _pad([doc], t=64)
    h2, l2 = _pad([np.concatenate([doc, doc])], t=64)
    s1 = np.asarray(oph.oph_signatures(h1, l1, 128))
    s2 = np.asarray(oph.oph_signatures(h2, l2, 128))
    assert np.array_equal(s1, s2)


def test_bulk_scheme_oph():
    from datasketch_tpu import MinHash

    docs = [[b"tok%d" % i for i in range(j, j + 40)] for j in range(0, 60, 20)]
    mhs = MinHash.bulk(docs, num_perm=128, scheme="oph")
    assert len(mhs) == 3
    # self-similarity = 1, disjoint ~ 0
    assert mhs[0].jaccard(mhs[0]) == 1.0
    docs2 = [docs[0], docs[0][:20] + [b"x%d" % i for i in range(20)]]
    m2 = MinHash.bulk(docs2, num_perm=128, scheme="oph")
    est = m2[0].jaccard(m2[1])
    true_j = 20 / 60
    assert abs(est - true_j) < 0.2
    with pytest.raises(ValueError):
        MinHash.bulk(docs, num_perm=128, scheme="bogus")


def test_bins_above_65536_reachable():
    """The bin assignment is mulhi(h, k): with num_perm > 2^16 a 16-bit
    shortcut wraps and leaves bins >= 65536 permanently empty. White-box:
    a single-token doc's stored min must land at floor(mix(h)*k / 2^32),
    including bins in the upper half."""
    import jax.numpy as jnp

    num_perm = 1 << 17
    seed = 1
    salt = (0x9E3779B1 ^ (seed * 0x45D9F3B)) & 0xFFFFFFFF
    rng = np.random.RandomState(0)
    token_hashes = rng.randint(0, 1 << 32, size=64, dtype=np.uint64).astype(
        np.uint32
    )
    h = np.asarray(oph._mix(jnp.asarray(token_hashes), salt))
    expected_bins = ((h.astype(np.uint64) * num_perm) >> 32).astype(np.int64)
    expected_vals = np.asarray(
        oph._mix(jnp.asarray(h), (0x27D4EB2F ^ seed) & 0xFFFFFFFF)
    )
    assert (expected_bins >= 65536).any(), "test vectors must hit upper bins"

    padded, lengths = _pad([[int(t)] for t in token_hashes])
    sigs = np.asarray(
        oph.oph_signatures(padded, lengths, num_perm, seed=seed)
    )
    for i in range(len(token_hashes)):
        assert sigs[i, expected_bins[i]] == expected_vals[i], (
            i, expected_bins[i]
        )

"""Custom (a, b) permutations must flow through EVERY device path.

Regression tests for the round-1 bugs where ``update_batch`` and
``bulk``/``generator`` silently fell back to seed-derived parameters on
the device path (reference semantics:
``/root/reference/datasketch/minhash.py:158-166,293-297``).
"""

import pickle

import numpy as np
import pytest

from datasketch_tpu import MinHash
from datasketch_tpu.ops.minhash_ops import init_permutations


def _custom_perms(num_perm=128):
    # A valid universal-hash family that is NOT seed=1's: use seed 77's draw.
    return init_permutations(77, num_perm)


def _host_truth(tokens, perms, num_perm=128):
    m = MinHash(num_perm=num_perm, seed=1, permutations=perms,
                device_mode="disable")
    m.update_batch(tokens)
    return np.asarray(m.hashvalues, dtype=np.uint64)


TOKENS = [("token-%d" % i).encode() for i in range(300)]
DOCS = [[("d%d-t%d" % (d, t)).encode() for t in range(40 + d % 7)]
        for d in range(30)]


def test_update_batch_device_honors_custom_perms():
    perms = _custom_perms()
    truth = _host_truth(TOKENS, perms)
    m = MinHash(num_perm=128, seed=1, permutations=perms, device_mode="always")
    m.update_batch(TOKENS)
    np.testing.assert_array_equal(np.asarray(m.hashvalues, np.uint64), truth)
    # and it must differ from the seed-derived family's result
    default = MinHash(num_perm=128, seed=1, device_mode="disable")
    default.update_batch(TOKENS)
    assert not np.array_equal(m.hashvalues, default.hashvalues)


def test_bulk_and_generator_device_honor_custom_perms():
    perms = _custom_perms()
    truth = np.stack([_host_truth(d, perms) for d in DOCS])
    for api in ("bulk", "generator"):
        fn = getattr(MinHash, api)
        out = list(fn(DOCS, num_perm=128, seed=1, permutations=perms,
                      device_mode="always"))
        got = np.stack([np.asarray(m.hashvalues, np.uint64) for m in out])
        np.testing.assert_array_equal(got, truth, err_msg=api)
        # yielded objects must carry the custom family for future updates
        out[0].update(b"extra-token")
        ref = MinHash(num_perm=128, seed=1, permutations=perms,
                      device_mode="disable")
        ref.update_batch(list(DOCS[0]) + [b"extra-token"])
        np.testing.assert_array_equal(out[0].hashvalues, ref.hashvalues)


def test_bulk_signatures_honors_custom_perms():
    perms = _custom_perms()
    truth = np.stack([_host_truth(d, perms) for d in DOCS]).astype(np.uint32)
    got = MinHash.bulk_signatures(DOCS, num_perm=128, seed=1,
                                  permutations=perms)
    np.testing.assert_array_equal(got, truth)


def test_bulk_from_text_honors_custom_perms():
    perms = _custom_perms()
    texts = ["some shingled document body %d with enough bytes" % i
             for i in range(12)]
    k = 9
    truth = []
    for t in texts:
        b = t.encode()
        shingles = [b[i:i + k] for i in range(len(b) - k + 1)]
        truth.append(_host_truth(shingles, perms))
    truth = np.stack(truth).astype(np.uint32)
    got = MinHash.bulk_from_text(texts, k=k, num_perm=128, seed=1,
                                 permutations=perms)
    np.testing.assert_array_equal(got, truth)


def test_oph_rejects_custom_perms_everywhere():
    perms = _custom_perms()
    kw = dict(num_perm=128, seed=1, permutations=perms)
    with pytest.raises(ValueError):
        MinHash.bulk_signatures(DOCS, scheme="oph", **kw)
    with pytest.raises(ValueError):
        list(MinHash.generator(DOCS, scheme="oph", **kw))
    with pytest.raises(ValueError):
        MinHash.bulk(DOCS, scheme="oph", **kw)
    with pytest.raises(ValueError):
        MinHash.bulk_from_text(["abcdefghijkl"], scheme="oph", **kw)


def test_default_perms_detected_by_value_after_pickle():
    m = MinHash(num_perm=64, seed=3)
    m2 = pickle.loads(pickle.dumps(m))
    # identity is lost by pickling, value equality must still map to the
    # cached-limb fast path
    assert m2.permutations is not init_permutations(3, 64)
    assert m2._custom_permutations() is None
    explicit = MinHash(num_perm=64, seed=3,
                       permutations=init_permutations(5, 64))
    assert explicit._custom_permutations() is not None

"""_dshash extension: abuse inputs, buffer validation, mode equivalence."""

import hashlib
import struct

import numpy as np
import pytest

from datasketch_tpu.native import corpus


def sha32(t):
    return struct.unpack("<I", hashlib.sha1(t).digest()[:4])[0]


def test_modes_equivalent():
    rng = np.random.RandomState(0)
    docs = [[bytes(rng.randint(0, 256, size=9, dtype=np.uint8))
             for _ in range(rng.randint(0, 30))] for _ in range(50)]
    outs = []
    for mode in (corpus.MODE_AUTO, corpus.MODE_INLINE, corpus.MODE_BUFFERED):
        h, l = corpus.hash_corpus_padded(docs, mode=mode)
        outs.append((h, l))
    for h, l in outs[1:]:
        np.testing.assert_array_equal(h, outs[0][0])
        np.testing.assert_array_equal(l, outs[0][1])


def test_non_bytes_token_raises():
    if not corpus.available():
        pytest.skip("extension unavailable")
    mod = corpus._load()
    out = np.empty(4, np.uint32)
    with pytest.raises(TypeError):
        mod.hash_flat([b"ok", "not-bytes"], out, 0, 0)
    with pytest.raises(TypeError):
        mod.hash_flat([b"ok", 123], out, 0, 0)


def test_out_buffer_validation():
    if not corpus.available():
        pytest.skip("extension unavailable")
    mod = corpus._load()
    with pytest.raises(ValueError):  # too small
        mod.hash_flat([b"a", b"b", b"c"], np.empty(1, np.uint32), 0, 0)
    with pytest.raises(ValueError):  # wrong itemsize for 64-bit algo
        mod.hash_flat([b"a"], np.empty(4, np.uint32), 2, 0)
    with pytest.raises((ValueError, TypeError, BufferError)):  # read-only
        ro = np.zeros(4, np.uint32)
        ro.setflags(write=False)
        mod.hash_flat([b"a"], ro, 0, 0)


def test_padded_stride_overflow_raises():
    if not corpus.available():
        pytest.skip("extension unavailable")
    mod = corpus._load()
    out = np.zeros((2, 4), np.uint32)
    with pytest.raises(ValueError):
        mod.hash_padded([[b"a"] * 9, [b"b"]], out, 4, 0, 0)


def test_bytearray_and_tuple_docs():
    docs = [(bytearray(b"alpha"), b"beta"), [b"gamma"]]
    h, l = corpus.hash_corpus_padded(docs)
    assert h[0, 0] == sha32(b"alpha") and h[0, 1] == sha32(b"beta")
    assert h[1, 0] == sha32(b"gamma")
    assert list(l) == [2, 1]


def test_empty_inputs():
    h, l = corpus.hash_corpus_padded([])
    assert h.shape[0] == 0 and l.shape == (0,)
    h, l = corpus.hash_corpus_padded([[]])
    assert h.shape[0] == 1 and l[0] == 0
    assert corpus.hash_tokens([]).shape == (0,)


def test_hash_shingles_matches_python_shingling():
    rng = np.random.RandomState(1)
    texts = [bytes(rng.randint(32, 127, size=n, dtype=np.uint8))
             for n in (0, 3, 9, 40, 300)]
    k = 9
    h, l = corpus.hash_shingles_padded(texts, k)
    for i, t in enumerate(texts):
        n_sh = max(0, len(t) - k + 1)
        assert l[i] == n_sh
        for j in range(n_sh):
            assert h[i, j] == sha32(t[j : j + k])
        assert (h[i, n_sh:] == 0).all()


def test_bulk_from_text_matches_manual():
    from datasketch_tpu import MinHash

    texts = ["the quick brown fox", "the quick brown cat", "zz"]
    sigs = MinHash.bulk_from_text(texts, k=4, num_perm=64)
    assert sigs.shape == (3, 64)
    for i, text in enumerate(texts[:2]):
        raw = text.encode()
        m = MinHash(num_perm=64)
        m.update_batch([raw[j : j + 4] for j in range(len(raw) - 3)])
        assert np.array_equal(
            sigs[i].astype(np.uint64), np.asarray(m.hashvalues)
        )
    # shorter than k -> empty sketch
    assert (sigs[2] == 0xFFFFFFFF).all()
    # oph scheme + empty input
    assert MinHash.bulk_from_text(texts, k=4, num_perm=64, scheme="oph").shape == (3, 64)
    assert MinHash.bulk_from_text([], num_perm=64).shape == (0, 64)

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


def test_token_caches_persist_and_never_staleness():
    """The sha1 memo is process-global (content-addressed, seed-free) and
    the pointer-identity layer is epoch-tagged per call: freed objects
    whose heap addresses get reused by different content must never
    produce a stale hash on a later call."""
    rng = np.random.RandomState(7)
    vocab = [bytes(rng.randint(0, 256, size=10, dtype=np.uint8)) for _ in range(5000)]
    docs = [[vocab[j] for j in rng.randint(0, 5000, size=64)] for _ in range(256)]
    p1, l1 = corpus.hash_corpus_padded(docs, corpus.ALGO_SHA1_32, mode=corpus.MODE_INLINE)

    # same content, brand-new objects -> identical output (content cache)
    fresh = [[bytes(t) for t in d] for d in docs]
    p2, _ = corpus.hash_corpus_padded(fresh, corpus.ALGO_SHA1_32, mode=corpus.MODE_INLINE)
    assert np.array_equal(p1, p2)

    # free everything, churn the allocator so addresses get reused with
    # different content, and verify against hashlib from scratch
    del fresh, docs, vocab
    churn = [[bytes(rng.randint(0, 256, size=10, dtype=np.uint8)) for _ in range(64)]
             for _ in range(256)]
    p3, l3 = corpus.hash_corpus_padded(churn, corpus.ALGO_SHA1_32, mode=corpus.MODE_INLINE)
    for d in (0, 17, 255):
        for t in range(l3[d]):
            assert p3[d, t] == sha32(churn[d][t])

    # repeated identical object inside one doc (identity fast path)
    one = b"same-token!"
    p4, l4 = corpus.hash_corpus_padded([[one] * 50], corpus.ALGO_SHA1_32,
                                       mode=corpus.MODE_INLINE)
    assert (p4[0, :50] == sha32(one)).all()

    # mixed lengths sharing a prefix must not collide via either cache
    a, b = b"prefix", b"prefix-extended"
    p5, _ = corpus.hash_corpus_padded([[a, b, a, b]], corpus.ALGO_SHA1_32,
                                      mode=corpus.MODE_INLINE)
    assert p5[0, 0] == sha32(a) and p5[0, 1] == sha32(b)
    assert p5[0, 0] != p5[0, 1]


def test_hash_flat_sequence_without_len():
    """A __getitem__-only sequence passes PySequence_Check but fails
    PySequence_Size; the failed size probe must not leave a pending
    exception (previously surfaced as SystemError)."""
    if not corpus.available():
        pytest.skip("extension unavailable")

    class NoLen:
        def __getitem__(self, i):
            if i >= 3:
                raise IndexError
            return b"tok%d" % i

    mod = corpus._load()
    out = np.zeros(8, dtype=np.uint32)
    n = mod.hash_flat(NoLen(), out, corpus.ALGO_SHA1_32, 0)
    assert n == 3
    ref = [
        struct.unpack("<I", hashlib.sha1(b"tok%d" % i).digest()[:4])[0]
        for i in range(3)
    ]
    assert list(out[:3]) == ref


def test_pure_python_fallback_bit_exact(monkeypatch):
    """When the ctypes lib can't build, every entry point must degrade to
    a bit-identical pure-Python path instead of raising."""
    from datasketch_tpu.native import hashlib_native as hn

    # sanity: native and fallback agree while native IS available
    toks = [b"", b"a", b"hello world", b"x" * 100, bytes(range(37))]
    native32 = hn.batch_sha1_hash32(toks)
    native64 = hn.batch_sha1_hash64(toks)
    nativexx = hn.batch_xxhash32(toks, seed=7)

    monkeypatch.setattr(hn, "_lib", None)
    monkeypatch.setattr(hn, "_lib_failed", True)  # simulate failed build
    assert np.array_equal(hn.batch_sha1_hash32(toks), native32)
    assert np.array_equal(hn.batch_sha1_hash64(toks), native64)
    assert np.array_equal(hn.batch_xxhash32(toks, seed=7), nativexx)
    # empty input
    assert hn.batch_sha1_hash32([]).shape == (0,)


def test_pure_python_xxh32_reference_vectors():
    """Known-answer tests for the scalar XXH32 fallback (covers all three
    loop regimes: stripes, 4-byte tail, byte tail)."""
    from datasketch_tpu.native.hashlib_native import _py_xxh32

    # canonical xxhash test vectors
    assert _py_xxh32(b"", 0) == 0x02CC5D05
    assert _py_xxh32(b"", 0x9E3779B1) == 0x36B78AE7
    assert _py_xxh32(b"Hello World", 0) == 0xB1FD16EE


def test_fuzz_adversarial_inputs():
    """Seeded fuzz: mixed valid/invalid token types, every mode — the C
    extension must raise TypeError/ValueError or succeed, never crash or
    corrupt interpreter state."""
    import random

    if not corpus.available():
        pytest.skip("extension unavailable")
    rng = random.Random(0)

    def rand_token():
        t = rng.random()
        if t < 0.5:
            return bytes(rng.randrange(0, 200)
                         for _ in range(rng.randrange(0, 80)))
        if t < 0.65:
            return bytearray(rng.randrange(0, 60))
        if t < 0.8:
            return memoryview(bytes(rng.randrange(0, 30)))
        if t < 0.9:
            return rng.randrange(-5, 1000)  # invalid type
        return "str-token"  # invalid type

    for _ in range(100):
        docs = [
            [rand_token() for _ in range(rng.randrange(0, 12))]
            for _ in range(rng.randrange(0, 6))
        ]
        try:
            corpus.hash_corpus_padded(
                docs, corpus.ALGO_SHA1_32, mode=rng.choice([0, 1, 2])
            )
        except (TypeError, ValueError):
            pass  # expected for invalid tokens
    # valid docs afterwards still hash correctly (no state corruption)
    out, lengths = corpus.hash_corpus_padded([[b"Hello"]], corpus.ALGO_SHA1_32)
    assert out[0, 0] == struct.unpack(
        "<I", hashlib.sha1(b"Hello").digest()[:4]
    )[0]

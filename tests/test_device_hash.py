"""Device-hash sketching for pre-tokenized integer corpora.

The TPU-native analogue of the reference's pluggable fast-hashfunc escape
hatch (``/root/reference/docs/minhash.rst:79-121``,
``/root/reference/datasketch/minhash.py:118``): raw token ids are uploaded
and hashed ON-CHIP (fmix32 fused into the signature kernel), so the host
does zero per-token work. These tests pin (a) bit-parity between the host
twin, the XLA path, and the Pallas kernel (interpret mode), (b) consistency
between the object path and the bulk path, and (c) the statistical
acceptance bound: Jaccard estimation error tracks 1/sqrt(num_perm).
"""

from __future__ import annotations

import numpy as np
import pytest

from datasketch_tpu import MinHash, TpuMinHashLSH, device_hash
from datasketch_tpu.ops import minhash_ops
from datasketch_tpu.ops.hashing import mix32, mix32_np


def test_mix32_np_matches_device_mix():
    rng = np.random.RandomState(7)
    x = rng.randint(0, 1 << 32, size=4096, dtype=np.uint64).astype(np.uint32)
    np.testing.assert_array_equal(np.asarray(mix32(x)), mix32_np(x))


def test_device_hash_callable_matches_vector_twin():
    rng = np.random.RandomState(8)
    ids = rng.randint(0, 1 << 32, size=64, dtype=np.uint64)
    vec = mix32_np(ids.astype(np.uint32))
    for i, v in zip(ids, vec):
        assert device_hash(int(i)) == int(v)
    # ids wider than 32 bits wrap like a uint32 cast
    assert device_hash((1 << 32) + 5) == device_hash(5)


def test_constructor_accepts_device_string():
    m = MinHash(num_perm=16, hashfunc="device")
    assert m.hashfunc is device_hash


def test_mix_flag_equals_prehashed_path():
    """compute_signatures(ids, mix=True) == compute_signatures(fmix32(ids))."""
    rng = np.random.RandomState(9)
    ids = rng.randint(0, 1 << 32, size=(8, 128), dtype=np.uint64).astype(
        np.uint32
    )
    lengths = rng.randint(1, 129, size=8).astype(np.int32)
    mixed = minhash_ops.compute_signatures(ids, lengths, 1, 128, mix=True)
    pre = minhash_ops.compute_signatures(
        mix32_np(ids), lengths, 1, 128, mix=False
    )
    np.testing.assert_array_equal(np.asarray(mixed), np.asarray(pre))


def test_pallas_kernel_mix_parity_interpret_mode():
    from datasketch_tpu.ops import pallas_kernels as pk

    rng = np.random.RandomState(10)
    b, t, p = pk.BLOCK_B, pk.TILE_T, 128
    ids = rng.randint(0, 1 << 32, size=(b, t), dtype=np.uint64).astype(
        np.uint32
    )
    lengths = rng.randint(1, t + 1, size=b).astype(np.int32)
    limbs = minhash_ops.perm_limbs(1, p)
    got = pk.sign_batch_pallas(ids, lengths, *limbs, interpret=True, mix=True)
    want = minhash_ops._sign_batch(
        mix32_np(ids), np.asarray(lengths), *limbs
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_bulk_matches_object_path():
    rng = np.random.RandomState(11)
    docs = [
        rng.randint(0, 50000, size=n).astype(np.uint32)
        for n in (3, 40, 170, 513)
    ]
    sigs = MinHash.bulk_signatures(docs, num_perm=128, hashfunc="device")
    assert sigs.shape == (4, 128) and sigs.dtype == np.uint32
    for row, doc in zip(sigs, docs):
        m = MinHash(num_perm=128, hashfunc="device")
        m.update_batch([int(x) for x in doc])
        np.testing.assert_array_equal(
            row, np.asarray(m.hashvalues, dtype=np.uint64).astype(np.uint32)
        )


def test_bulk_accepts_plain_int_lists():
    docs = [[1, 2, 3], [2, 3, 4, 5]]
    sigs = MinHash.bulk_signatures(docs, num_perm=32, hashfunc="device")
    m = MinHash(num_perm=32, hashfunc="device")
    for tok in docs[0]:
        m.update(tok)
    np.testing.assert_array_equal(
        sigs[0], np.asarray(m.hashvalues, dtype=np.uint64).astype(np.uint32)
    )


def test_bulk_out_device_matches_host():
    """out='device' returns a device-resident matrix bit-identical to the
    host path, with chunk order correctly inverted (docs sorted by length
    internally) — for sha1, xxh32, and device-hash front ends."""
    import jax

    rng = np.random.RandomState(5)
    docs = [
        rng.randint(0, 1 << 31, size=n).astype(np.uint32)
        for n in rng.randint(1, 300, size=40)
    ]
    host = MinHash.bulk_signatures(docs, num_perm=64, hashfunc="device")
    dev = MinHash.bulk_signatures(
        docs, num_perm=64, hashfunc="device", out="device"
    )
    assert isinstance(dev, jax.Array)
    np.testing.assert_array_equal(host, np.asarray(dev))
    byte_docs = [[bytes([j, j + 1, i]) for j in range(5 + i)]
                 for i in range(7)]
    for hf in ("xxh32", None):
        kwargs = {"hashfunc": hf} if hf else {}
        h = MinHash.bulk_signatures(byte_docs, num_perm=32, **kwargs)
        d = MinHash.bulk_signatures(
            byte_docs, num_perm=32, out="device", **kwargs
        )
        np.testing.assert_array_equal(h, np.asarray(d))
    with pytest.raises(ValueError, match="out must be"):
        MinHash.bulk_signatures(byte_docs, num_perm=32, out="both")
    assert MinHash.bulk_signatures(
        [], num_perm=16, out="device"
    ).shape == (0, 16)


def test_narrow_dtype_ids_bit_identical():
    """Small-vocab corpora upload uint8/uint16 ids (the device widens
    post-gather): signatures must be bit-identical to the uint32 path —
    the upload is bandwidth-bound, so the narrow path is the perf lever,
    never an accuracy trade."""
    rng = np.random.RandomState(21)
    lens = [3, 70, 129, 400]
    docs16 = [rng.randint(0, 60000, size=n).astype(np.uint16) for n in lens]
    docs8 = [rng.randint(0, 250, size=n).astype(np.uint8) for n in lens]
    for docs in (docs16, docs8):
        wide = [d.astype(np.uint32) for d in docs]
        s_narrow = MinHash.bulk_signatures(
            docs, num_perm=128, hashfunc="device"
        )
        s_wide = MinHash.bulk_signatures(
            wide, num_perm=128, hashfunc="device"
        )
        np.testing.assert_array_equal(s_narrow, s_wide)
    # wide-dtype ids with a small value range are downcast by a max check
    docs64 = [d.astype(np.int64) for d in docs16]
    np.testing.assert_array_equal(
        MinHash.bulk_signatures(docs64, num_perm=128, hashfunc="device"),
        MinHash.bulk_signatures(
            [d.astype(np.uint32) for d in docs16], num_perm=128,
            hashfunc="device",
        ),
    )


def test_compute_signatures_ragged_narrow_flat():
    rng = np.random.RandomState(22)
    lengths = np.array([5, 200, 33], np.int32)
    flat16 = rng.randint(0, 1 << 16, size=int(lengths.sum())).astype(
        np.uint16
    )
    got = minhash_ops.compute_signatures_ragged(flat16, lengths, 1, 64,
                                                mix=True)
    want = minhash_ops.compute_signatures_ragged(
        flat16.astype(np.uint32), lengths, 1, 64, mix=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_hash_corpus_ragged_matches_padded():
    from datasketch_tpu.native import corpus as nc

    rng = np.random.RandomState(23)
    docs = [
        [bytes(rng.randint(0, 256, size=rng.randint(1, 30), dtype=np.uint8))
         for _ in range(rng.randint(0, 40))]
        for _ in range(50)
    ]
    for algo in (nc.ALGO_SHA1_32, nc.ALGO_XXH32, nc.ALGO_SHA1_64):
        flat, lengths = nc.hash_corpus_ragged(docs, algo, seed=3)
        padded, lengths2 = nc.hash_corpus_padded(docs, algo, seed=3)
        np.testing.assert_array_equal(lengths, lengths2)
        assert flat.shape[0] == int(lengths.sum())
        off = 0
        for i, n in enumerate(lengths):
            np.testing.assert_array_equal(flat[off:off + n], padded[i, :n])
            off += n


def test_empty_and_missing_docs():
    sigs = MinHash.bulk_signatures(
        [np.zeros(0, np.uint32), np.array([5], np.uint32)],
        num_perm=16,
        hashfunc="device",
    )
    assert (sigs[0] == 0xFFFFFFFF).all()  # empty doc -> empty sketch
    assert not (sigs[1] == 0xFFFFFFFF).all()
    assert MinHash.bulk_signatures([], num_perm=16, hashfunc="device").shape \
        == (0, 16)


@pytest.mark.parametrize("num_perm", [64, 256])
def test_jaccard_error_tracks_inv_sqrt_p(num_perm):
    """Statistical acceptance: mean |est - true| ~ c/sqrt(P) with c < 1."""
    rng = np.random.RandomState(12)
    n_pairs = 40
    errs = []
    for _ in range(n_pairs):
        size = 400
        overlap = rng.randint(40, 360)
        base = rng.randint(0, 1 << 31, size=2 * size - overlap).astype(
            np.uint32
        )
        a, b = base[:size], base[size - overlap :]
        true_j = overlap / (2 * size - overlap)
        sa, sb = MinHash.bulk_signatures(
            [a, b], num_perm=num_perm, hashfunc="device"
        )
        est = float((sa == sb).mean())
        errs.append(abs(est - true_j))
    # std of the estimator is sqrt(j(1-j)/P) <= 0.5/sqrt(P); mean abs error
    # of 40 pairs stays comfortably under 1/sqrt(P)
    assert float(np.mean(errs)) < 1.0 / np.sqrt(num_perm)


def test_index_tokens_end_to_end():
    rng = np.random.RandomState(13)
    docs = [
        rng.choice(5000, size=120, replace=False).astype(np.uint32)
        for _ in range(60)
    ]
    # near-duplicates of the first 10 docs
    dups = [
        np.concatenate([d[:100], rng.randint(0, 5000, 20).astype(np.uint32)])
        for d in docs[:10]
    ]
    index = TpuMinHashLSH(threshold=0.5, num_perm=128, bucket_cap=64)
    index.index_tokens(list(range(60)), docs, seed=1)
    qsigs = MinHash.bulk_signatures(
        dups, num_perm=128, seed=1, hashfunc="device"
    )
    hits = index.query_batch(
        [MinHash(hashvalues=row, hashfunc="device") for row in qsigs]
    )
    found = sum(1 for i, row in enumerate(hits) if i in row)
    assert found >= 9  # ~0.71 true Jaccard; threshold 0.5 banding


def test_index_tokens_rejects_mismatched_keys():
    index = TpuMinHashLSH(threshold=0.5, num_perm=32)
    with pytest.raises(ValueError):
        index.index_tokens([1, 2], [np.array([1, 2, 3], np.uint32)])


def test_hll_device_hash_paths_agree():
    from datasketch_tpu import HyperLogLog, HyperLogLogPlusPlus

    rng = np.random.RandomState(14)
    ids = rng.randint(0, 1 << 31, size=5000).astype(np.uint32)
    h1 = HyperLogLog(p=10, hashfunc="device")
    for x in ids[:200]:
        h1.update(int(x))
    h2 = HyperLogLog(p=10, hashfunc="device")
    h2.update_batch([int(x) for x in ids[:200]])
    np.testing.assert_array_equal(h1.reg, h2.reg)

    # bulk paths (host scatter and device) match the object path
    docs = [ids[:200], ids[200:1200], ids]
    regs = HyperLogLog.bulk_registers(
        [[int(x) for x in d] for d in docs], p=10, hashfunc="device"
    )
    np.testing.assert_array_equal(regs[0], h1.reg)
    regs_dev = HyperLogLog.bulk_registers(
        [[int(x) for x in d] for d in docs],
        p=10, hashfunc="device", device_mode="always",
    )
    np.testing.assert_array_equal(regs, regs_dev)

    # cardinality estimate is sane on distinct ids
    full = HyperLogLog(p=10, hashfunc="device")
    full.update_batch([int(x) for x in ids])
    n_distinct = len(np.unique(ids))
    assert abs(full.count() - n_distinct) / n_distinct < 0.15

    # 64-bit sketch: 'device' maps to the mix64 limb hash
    from datasketch_tpu.hashfunc import device_hash64

    assert HyperLogLogPlusPlus(p=10, hashfunc="device").hashfunc \
        is device_hash64


def test_mix64_np_matches_device_mix64():
    from datasketch_tpu.ops.hashing import mix64, mix64_np

    rng = np.random.RandomState(41)
    x = rng.randint(0, 1 << 63, size=2048).astype(np.uint64) * 2 + 1
    import jax.numpy as jnp

    hi = jnp.asarray((x >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    dhi, dlo = mix64(hi, lo)
    dev = (np.asarray(dhi).astype(np.uint64) << np.uint64(32)) | np.asarray(
        dlo
    ).astype(np.uint64)
    np.testing.assert_array_equal(dev, mix64_np(x))


def test_hllpp_device_hash_paths_agree():
    from datasketch_tpu import HyperLogLogPlusPlus

    rng = np.random.RandomState(42)
    ids = rng.randint(0, 1 << 31, size=6000).astype(np.uint64)
    h1 = HyperLogLogPlusPlus(p=10, hashfunc="device")
    for x in ids[:300]:
        h1.update(int(x))
    h2 = HyperLogLogPlusPlus(p=10, hashfunc="device")
    h2.update_batch([int(x) for x in ids[:300]])
    np.testing.assert_array_equal(h1.reg, h2.reg)

    # device scatter path (raw-id upload + on-device mix64) matches host
    h3 = HyperLogLogPlusPlus(p=10, hashfunc="device", device_mode="always")
    h3.update_batch([int(x) for x in ids[:300]])
    np.testing.assert_array_equal(h1.reg, h3.reg)

    # sparse mode agrees and densifies consistently
    hs = HyperLogLogPlusPlus(p=10, hashfunc="device", sparse=True)
    hs.update_batch([int(x) for x in ids[:300]])
    np.testing.assert_array_equal(hs._dense_reg(), h1.reg)

    # bulk paths (host and device) match the object path
    docs = [[int(x) for x in ids[:300]], [int(x) for x in ids]]
    regs = HyperLogLogPlusPlus.bulk_registers(
        docs, p=10, hashfunc="device"
    )
    np.testing.assert_array_equal(regs[0], h1.reg)
    regs_dev = HyperLogLogPlusPlus.bulk_registers(
        docs, p=10, hashfunc="device", device_mode="always"
    )
    np.testing.assert_array_equal(regs, regs_dev)

    # cardinality estimate is sane on distinct ids
    full = HyperLogLogPlusPlus(p=12, hashfunc="device")
    full.update_batch([int(x) for x in ids])
    n_distinct = len(np.unique(ids))
    assert abs(full.count() - n_distinct) / n_distinct < 0.1

    # bulk device path agrees with host even for ids >= 2**32: the
    # raw-id device upload is range-guarded and wide ids take the host
    # mix64 (regression: the unguarded path silently truncated to u32)
    wide_docs = [[5, 7, (1 << 40) + 3, 1 << 33], [1, 2, 3]]
    np.testing.assert_array_equal(
        HyperLogLogPlusPlus.bulk_registers(
            wide_docs, p=10, hashfunc="device"
        ),
        HyperLogLogPlusPlus.bulk_registers(
            wide_docs, p=10, hashfunc="device", device_mode="always"
        ),
    )
    hword = HyperLogLogPlusPlus(p=10, hashfunc="device")
    for x in wide_docs[0]:
        hword.update(x)
    np.testing.assert_array_equal(
        HyperLogLogPlusPlus.bulk_registers(
            wide_docs, p=10, hashfunc="device", device_mode="always"
        )[0],
        hword.reg,
    )

    # ids wider than 32 bits still hash correctly (host mix64 fallback)
    wide = [int(x) for x in
            rng.randint(0, 1 << 62, size=100).astype(np.uint64)]
    hw = HyperLogLogPlusPlus(p=10, hashfunc="device")
    hw.update_batch(wide)
    hw2 = HyperLogLogPlusPlus(p=10, hashfunc="device")
    for x in wide:
        hw2.update(x)
    np.testing.assert_array_equal(hw.reg, hw2.reg)


def test_alt_schemes_accept_device_hash():
    """scheme='oph'/'cminhash' with hashfunc='device': ids are mixed by
    the vectorized host twin before the alternate-scheme kernels."""
    rng = np.random.RandomState(15)
    docs = [rng.randint(0, 1 << 31, 300).astype(np.uint32) for _ in range(6)]
    near = [np.concatenate([docs[0][:270], rng.randint(0, 1 << 31, 30)
                            .astype(np.uint32)])]
    for scheme in ("oph", "cminhash"):
        sigs = MinHash.bulk_signatures(
            docs + near, num_perm=128, hashfunc="device", scheme=scheme
        )
        assert sigs.shape == (7, 128)
        sim_near = float((sigs[0] == sigs[6]).mean())
        sim_far = float((sigs[0] == sigs[1]).mean())
        assert sim_near > 0.6 > sim_far, (scheme, sim_near, sim_far)

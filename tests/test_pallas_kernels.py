"""Pallas signature kernel parity (interpret mode on the CPU test mesh)."""

import numpy as np
import pytest

from datasketch_tpu.ops import minhash_ops, pallas_kernels


@pytest.mark.parametrize("b,t,p", [(8, 128, 128), (32, 256, 128), (16, 128, 256)])
def test_pallas_matches_scan_bit_exact(b, t, p):
    rng = np.random.RandomState(b + t)
    hashes = rng.randint(0, 1 << 32, size=(b, t), dtype=np.uint64).astype(np.uint32)
    lengths = rng.randint(0, t + 1, size=(b,)).astype(np.int32)
    limbs = [np.asarray(x) for x in minhash_ops.perm_limbs(1, p)]
    want = np.asarray(minhash_ops.compute_signatures(hashes, lengths, 1, p))
    got = np.asarray(
        pallas_kernels.sign_batch_pallas(hashes, lengths, *limbs, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_empty_rows_stay_max_hash():
    b, t, p = 8, 128, 128
    hashes = np.zeros((b, t), dtype=np.uint32)
    lengths = np.zeros((b,), dtype=np.int32)
    limbs = [np.asarray(x) for x in minhash_ops.perm_limbs(1, p)]
    got = np.asarray(
        pallas_kernels.sign_batch_pallas(hashes, lengths, *limbs, interpret=True)
    )
    assert (got == 0xFFFFFFFF).all()


def test_pallas_shape_validation():
    limbs = [np.asarray(x) for x in minhash_ops.perm_limbs(1, 128)]
    with pytest.raises(ValueError):
        pallas_kernels.sign_batch_pallas(
            np.zeros((7, 128), np.uint32), np.zeros(7, np.int32), *limbs,
            interpret=True,
        )


@pytest.mark.parametrize("q,t,p", [(8, 128, 128), (16, 256, 128), (8, 128, 256)])
def test_score_matrix_kernel_parity(q, t, p):
    rng = np.random.RandomState(q + t + p)
    # low-cardinality values so slot collisions actually occur
    qs = rng.randint(0, 7, size=(q, p)).astype(np.uint32)
    db = rng.randint(0, 7, size=(t, p)).astype(np.uint32)
    got = np.asarray(
        pallas_kernels.score_matrix_pallas(qs, db, interpret=True)
    )
    want = (qs[:, None, :] == db[None, :, :]).mean(
        axis=-1, dtype=np.float32
    )
    np.testing.assert_array_equal(got, want)


def test_rerank_scores_kernel_parity():
    rng = np.random.RandomState(5)
    q, c, p = 8, 128, 128
    qs = rng.randint(0, 7, size=(q, p)).astype(np.uint32)
    cands = rng.randint(0, 7, size=(q, c, p)).astype(np.uint32)
    got = np.asarray(
        pallas_kernels.rerank_scores_pallas(qs, cands, interpret=True)
    )
    want = (cands == qs[:, None, :]).mean(axis=-1, dtype=np.float32)
    np.testing.assert_array_equal(got, want)


def test_topk_scan_pallas_branch_interpret():
    """Integrated coverage of topk_scan's Mosaic-scorer branch (CPU CI
    never takes it via the platform gate; the knob forces interpret
    mode). Shapes here are unique so the forced trace stays isolated."""
    import jax.numpy as jnp

    from datasketch_tpu.ops import lsh_ops

    rng = np.random.RandomState(21)
    db = rng.randint(0, 5, size=(384, 128)).astype(np.uint32)
    qs = rng.randint(0, 5, size=(13, 128)).astype(np.uint32)
    want = [np.asarray(x) for x in lsh_ops.topk_scan(db, qs, 7, tile=128)]
    # the knob is read at TRACE time: drop the cached XLA trace first
    lsh_ops.topk_scan.clear_cache()
    lsh_ops.SCORE_KERNEL_INTERPRET = True
    try:
        got = lsh_ops.topk_scan(jnp.asarray(db), jnp.asarray(qs), 7, tile=128)
        got = [np.asarray(x) for x in got]
    finally:
        lsh_ops.SCORE_KERNEL_INTERPRET = False
        lsh_ops.topk_scan.clear_cache()
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_allclose(got[1], want[1])


def test_rerank_jaccard_pallas_branch_interpret():
    import jax.numpy as jnp

    from datasketch_tpu.ops import lsh_ops

    rng = np.random.RandomState(22)
    db = rng.randint(0, 5, size=(96, 128)).astype(np.uint32)
    qs = rng.randint(0, 5, size=(5, 128)).astype(np.uint32)
    cands = rng.randint(-1, 96, size=(5, 70)).astype(np.int32)  # ragged C
    want = np.asarray(lsh_ops.rerank_jaccard(db, qs, cands))
    lsh_ops.rerank_jaccard.clear_cache()
    lsh_ops.SCORE_KERNEL_INTERPRET = True
    try:
        got = np.asarray(
            lsh_ops.rerank_jaccard(
                jnp.asarray(db), jnp.asarray(qs), jnp.asarray(cands)
            )
        )
    finally:
        lsh_ops.SCORE_KERNEL_INTERPRET = False
        lsh_ops.rerank_jaccard.clear_cache()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "b,s,d",
    [
        (8, 128, 128),  # tile-aligned
        (5, 20, 100),  # every axis needs padding
        (9, 130, 300),  # multi-tile D with padding
    ],
)
def test_cws_kernel_matches_scan(b, s, d):
    from datasketch_tpu.ops import cws_ops

    rng = np.random.RandomState(b * 1000 + s + d)
    weights = rng.gamma(1.0, 1.0, size=(b, d)).astype(np.float32)
    # sparsify: zero-weight dims must never win the argmin
    weights[rng.random_sample((b, d)) < 0.6] = 0.0
    weights[0, 1:] = 0.0  # single-positive-dim row
    rs = rng.gamma(2.0, 1.0, size=(s, d)).astype(np.float32)
    ln_cs = np.log(rng.gamma(2.0, 1.0, size=(s, d))).astype(np.float32)
    betas = rng.uniform(0.0, 1.0, size=(s, d)).astype(np.float32)
    want = np.asarray(cws_ops.cws_many(weights, rs, ln_cs, betas))
    got = np.asarray(
        pallas_kernels.cws_many_pallas(weights, rs, ln_cs, betas, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_cws_many_best_interpret_branch():
    """cws_many_best's Mosaic branch under the CPU-CI knob (the platform
    gate would otherwise leave it untested until a real-TPU run)."""
    from datasketch_tpu.ops import cws_ops

    rng = np.random.RandomState(77)
    weights = rng.gamma(1.0, 1.0, size=(4, 64)).astype(np.float32)
    rs = rng.gamma(2.0, 1.0, size=(32, 64)).astype(np.float32)
    ln_cs = np.log(rng.gamma(2.0, 1.0, size=(32, 64))).astype(np.float32)
    betas = rng.uniform(0.0, 1.0, size=(32, 64)).astype(np.float32)
    want = np.asarray(cws_ops.cws_many(weights, rs, ln_cs, betas))
    cws_ops.CWS_KERNEL_INTERPRET = True
    try:
        got = np.asarray(cws_ops.cws_many_best(weights, rs, ln_cs, betas))
    finally:
        cws_ops.CWS_KERNEL_INTERPRET = False
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "b,s,nz,d",
    [
        (8, 128, 128, 300),  # exact tiles
        (5, 20, 37, 100),  # every axis needs padding
        (9, 130, 200, 500),  # multi-tile nnz with padding
    ],
)
def test_cws_sparse_kernel_matches_dense(b, s, nz, d):
    """The sparse-upload CWS kernel is (k, t) bit-identical to the dense
    scan on the densified equivalent — including padding slots, rows
    narrower than the nnz bucket, and tie-break order (sorted indices =
    lowest-dim rule)."""
    from datasketch_tpu.ops import cws_ops

    rng = np.random.RandomState(b + s + nz + d)
    rownnz = rng.randint(1, nz + 1, size=b)
    vals = np.zeros((b, nz), np.float32)
    idx = np.zeros((b, nz), np.int32)
    dense = np.zeros((b, d), np.float32)
    for i in range(b):
        dims = np.sort(rng.choice(d, size=rownnz[i], replace=False))
        w = rng.gamma(1.0, 1.0, size=rownnz[i]).astype(np.float32) + 1e-3
        vals[i, : rownnz[i]] = w
        idx[i, : rownnz[i]] = dims
        dense[i, dims] = w
    rs = rng.gamma(2.0, 1.0, size=(s, d)).astype(np.float32)
    ln_cs = np.log(rng.gamma(2.0, 1.0, size=(s, d))).astype(np.float32)
    betas = rng.uniform(0.0, 1.0, size=(s, d)).astype(np.float32)
    want = np.asarray(cws_ops.cws_many(dense, rs, ln_cs, betas))
    got_xla = np.asarray(
        cws_ops.cws_many_sparse(
            vals, idx, rs.T.copy(), ln_cs.T.copy(), betas.T.copy()
        )
    )
    np.testing.assert_array_equal(got_xla, want)
    got_mosaic = np.asarray(
        pallas_kernels.cws_sparse_pallas(
            vals, idx, rs.T.copy(), ln_cs.T.copy(), betas.T.copy(),
            interpret=True,
        )
    )
    np.testing.assert_array_equal(got_mosaic, want)


def test_cws_sparse_best_interpret_branch():
    """cws_many_sparse_best's Mosaic branch under the CPU-CI knob."""
    from datasketch_tpu.ops import cws_ops

    rng = np.random.RandomState(78)
    vals = rng.gamma(1.0, 1.0, size=(4, 16)).astype(np.float32) + 1e-3
    idx = np.sort(
        np.stack([rng.choice(64, size=16, replace=False) for _ in range(4)])
    ).astype(np.int32)
    rs = rng.gamma(2.0, 1.0, size=(32, 64)).astype(np.float32)
    ln_cs = np.log(rng.gamma(2.0, 1.0, size=(32, 64))).astype(np.float32)
    betas = rng.uniform(0.0, 1.0, size=(32, 64)).astype(np.float32)
    want = np.asarray(
        cws_ops.cws_many_sparse(
            vals, idx, rs.T.copy(), ln_cs.T.copy(), betas.T.copy()
        )
    )
    cws_ops.CWS_KERNEL_INTERPRET = True
    try:
        got = np.asarray(
            cws_ops.cws_many_sparse_best(
                vals, idx, rs.T.copy(), ln_cs.T.copy(), betas.T.copy()
            )
        )
    finally:
        cws_ops.CWS_KERNEL_INTERPRET = False
    np.testing.assert_array_equal(got, want)


def test_score_kernel_shape_validation():
    with pytest.raises(ValueError):
        pallas_kernels.score_matrix_pallas(
            np.zeros((7, 128), np.uint32), np.zeros((128, 128), np.uint32),
            interpret=True,
        )
    with pytest.raises(ValueError):
        pallas_kernels.rerank_scores_pallas(
            np.zeros((8, 128), np.uint32),
            np.zeros((8, 100, 128), np.uint32),
            interpret=True,
        )


@pytest.mark.parametrize("b", [1, 2, 4, 8, 16, 32])
def test_bbit_scores_kernel_parity(b):
    """Mosaic packed-scan scorer == the XLA SWAR computation, every slot
    size on the reference ladder (b_bit_minhash.py:147-160)."""
    from datasketch_tpu.ops import bbit_ops

    rng = np.random.RandomState(31 + b)
    num_perm = 128
    sigs_q = rng.randint(0, 1 << 32, size=(8, num_perm), dtype=np.uint64)
    sigs_db = rng.randint(0, 1 << 32, size=(128, num_perm), dtype=np.uint64)
    # low-cardinality low bits so slots actually collide
    sigs_q &= 0x3
    sigs_db &= 0x3
    qp = bbit_ops.pack_bbit_host(sigs_q.astype(np.uint32), b)
    dbp = bbit_ops.pack_bbit_host(sigs_db.astype(np.uint32), b)
    got = np.asarray(
        pallas_kernels.bbit_scores_pallas(
            qp, dbp, bbit_ops.slot_size(b), interpret=True
        )
    )
    want = np.asarray(bbit_ops.match_counts(qp, dbp, b, num_perm))
    s = bbit_ops.slot_size(b)
    pad_slots = qp.shape[1] * (32 // s) - num_perm
    np.testing.assert_array_equal(got - pad_slots, want)


def test_bbit_topk_scan_pallas_branch_interpret():
    """Integrated coverage of bbit_topk_scan's Mosaic-scorer branch
    (platform-gated off in CPU CI; the knob forces interpret mode).
    Query count is deliberately not a block multiple (pad+slice path)."""
    import jax.numpy as jnp

    from datasketch_tpu.ops import bbit_ops, lsh_ops

    rng = np.random.RandomState(33)
    num_perm, b = 128, 2
    sigs = (rng.randint(0, 1 << 32, size=(300, num_perm), dtype=np.uint64)
            & 0x7).astype(np.uint32)
    packed = bbit_ops.pack_bbit_host(sigs, b)
    db = np.zeros((384, packed.shape[1]), np.uint32)
    db[:300] = packed
    qp = packed[:11]
    alive = np.ones(384, bool)
    alive[5] = False
    args = dict(k=7, b=b, num_perm=num_perm, tile=128)
    want = [
        np.asarray(x)
        for x in bbit_ops.bbit_topk_scan(
            jnp.asarray(db), jnp.asarray(qp),
            n_valid=jnp.int32(300), alive=jnp.asarray(alive), **args
        )
    ]
    lsh_ops.SCORE_KERNEL_INTERPRET = True
    try:
        got = [
            np.asarray(x)
            for x in bbit_ops.bbit_topk_scan(
                jnp.asarray(db), jnp.asarray(qp),
                n_valid=jnp.int32(300), alive=jnp.asarray(alive), **args
            )
        ]
    finally:
        lsh_ops.SCORE_KERNEL_INTERPRET = False
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_topk_scan_fused_count_ge_and_alive_interpret():
    """The fused Mosaic top-k scan (round-4 dedup kernel) matches the
    lax.scan form on the full contract: cutoff masking, exact match
    counts, tombstone mask, query padding."""
    import jax.numpy as jnp

    from datasketch_tpu.ops import lsh_ops

    rng = np.random.RandomState(33)
    db = rng.randint(0, 3, size=(700, 128)).astype(np.uint32)
    qs = db[rng.randint(0, 700, size=21)].copy()  # real high-score hits
    qs[:, :40] = rng.randint(0, 3, size=(21, 40))
    alive = np.ones(700, dtype=bool)
    alive[::13] = False
    args = dict(
        n_valid=jnp.int32(700),
        alive=jnp.asarray(alive),
        count_ge=jnp.float32(0.5),
    )
    want = [
        np.asarray(x)
        for x in lsh_ops.topk_scan(
            jnp.asarray(db), jnp.asarray(qs), 9, tile=128, **args
        )
    ]
    lsh_ops.topk_scan.clear_cache()
    lsh_ops.SCORE_KERNEL_INTERPRET = True
    try:
        got = [
            np.asarray(x)
            for x in lsh_ops.topk_scan(
                jnp.asarray(db), jnp.asarray(qs), 9, **args
            )
        ]
    finally:
        lsh_ops.SCORE_KERNEL_INTERPRET = False
        lsh_ops.topk_scan.clear_cache()
    np.testing.assert_array_equal(got[0], want[0])  # ids
    np.testing.assert_allclose(got[1], want[1])  # scores
    np.testing.assert_array_equal(got[2], want[2])  # exact counts
    # sanity on the contract itself: no tombstoned or sub-cutoff results
    assert not np.isin(got[0][got[0] >= 0], np.nonzero(~alive)[0]).any()
    assert (got[1][got[0] >= 0] >= 0.5).all()


def test_topk_scan_pallas_guards():
    import jax.numpy as jnp

    from datasketch_tpu.ops import pallas_kernels as pk

    db = jnp.zeros((256, 128), jnp.uint32)
    qs = jnp.zeros((16, 128), jnp.uint32)
    nv = jnp.int32(256)
    cut = jnp.float32(0.0)
    with pytest.raises(ValueError):  # Q not a TOPK_BQ multiple
        pk.topk_scan_pallas(db, jnp.zeros((7, 128), jnp.uint32), nv, cut, 5,
                            interpret=True)
    with pytest.raises(ValueError):  # k beyond the unroll bound
        pk.topk_scan_pallas(db, qs, nv, cut, pk._TOPK_MAX_K + 1,
                            interpret=True)


def test_sign_perm_chunking_wide_cascade(monkeypatch):
    """num_perm > SIGN_MAX_P splits into per-slice Mosaic calls (a
    single p=1024 call blew the 16MB scoped-vmem limit on real TPU —
    17.18M allocated); interleaved permutation draws make each slice
    prefix-stable so the concat is bit-identical to the XLA form."""
    from datasketch_tpu.ops import minhash_ops
    from datasketch_tpu.ops import pallas_kernels as pk

    rng = np.random.RandomState(5)
    hashes = rng.randint(
        0, 1 << 32, size=(8, 128), dtype=np.uint64
    ).astype(np.uint32)
    lengths = np.array([128, 100, 7, 1, 128, 64, 2, 33], np.int32)
    want = np.asarray(
        minhash_ops.compute_signatures(hashes, lengths, 1, 1024)
    )
    monkeypatch.setattr(pk, "signature_kernel_available", lambda: True)
    orig = pk.sign_batch_pallas
    monkeypatch.setattr(
        pk, "sign_batch_pallas",
        lambda *a, **kw: orig(*a, interpret=True, **kw),
    )
    monkeypatch.setattr(pk, "SIGN_MAX_P", 256)  # force 4-way chunking
    got = np.asarray(
        minhash_ops.compute_signatures(hashes, lengths, 1, 1024)
    )
    np.testing.assert_array_equal(got, want)


def test_topk_blocks_sublane_aligned():
    """Query block heights must be multiples of the 8-row uint32 sublane
    for EVERY signature width the constructors accept (a cascade_perm of
    384 used to yield 21 and hand Mosaic an unaligned block)."""
    from datasketch_tpu.ops import pallas_kernels as pk

    for p in (128, 192, 256, 384, 512, 640, 1024, 2048):
        for k in (8, 16, 64, 128):
            for sizes in (False, True):
                bq, bt = pk.topk_blocks(p, k, sizes=sizes)
                assert bq % 8 == 0 and bq >= 8, (p, k, bq)
                assert bt % 128 == 0 and bt >= 128, (p, k, bt)
                # VMEM stack model stays under the scoped limit even at
                # the bq floor: bt shrinks to absorb wide-p large-k
                # combinations (p=2048, k=128 used to model 18.9MB)
                assert bq * bt * 4 * (p + 2 * k) <= (12 << 20), (p, k, sizes)


def test_containment_scan_fused_interpret():
    """The fused Mosaic containment scan matches the lax.scan form on
    the full contract: containment scoring from exact sizes, cutoff
    masking, padding-row (size<=0) exclusion, exact match counts."""
    import jax.numpy as jnp

    from datasketch_tpu.ops import lsh_ops

    rng = np.random.RandomState(44)
    db = rng.randint(0, 3, size=(700, 128)).astype(np.uint32)
    sizes = rng.randint(20, 400, size=700).astype(np.int32)
    sizes[::17] = 0  # padding rows must never surface
    qs = db[rng.randint(0, 700, size=21)].copy()
    qs[:, :40] = rng.randint(0, 3, size=(21, 40))
    q_sizes = rng.randint(20, 400, size=21).astype(np.int32)
    args = (
        jnp.asarray(db), jnp.asarray(sizes), jnp.asarray(qs),
        jnp.asarray(q_sizes), jnp.float32(0.6),
    )
    want = [
        np.asarray(x)
        for x in lsh_ops.containment_scan(*args, 9, tile=128)
    ]
    lsh_ops.containment_scan.clear_cache()
    lsh_ops.SCORE_KERNEL_INTERPRET = True
    try:
        got = [
            np.asarray(x) for x in lsh_ops.containment_scan(*args, 9)
        ]
    finally:
        lsh_ops.SCORE_KERNEL_INTERPRET = False
        lsh_ops.containment_scan.clear_cache()
    np.testing.assert_array_equal(got[0], want[0])  # ids
    np.testing.assert_allclose(got[1], want[1], rtol=1e-6)  # containment
    np.testing.assert_array_equal(got[2], want[2])  # exact counts
    # contract sanity: no padding rows, no sub-cutoff survivors
    hits = got[0][got[0] >= 0]
    assert not np.isin(hits, np.nonzero(sizes == 0)[0]).any()
    assert (got[1][got[0] >= 0] >= 0.6).all()

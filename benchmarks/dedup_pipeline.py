"""End-to-end near-duplicate detection: full pipeline, ours vs reference.

The workload LSH exists for (and the reference's
``compare_lsh_vs_lshbloom.py`` models): tokenized documents in, duplicate
pairs out. Measures the COMPLETE pipeline — SHA1 token hashing, signature
construction, index build, querying every document against the index —
for this library's device path vs the reference's MinHash+MinHashLSH on
CPU (imported from /root/reference).

Usage: python benchmarks/dedup_pipeline.py [n_docs] [ref_docs] [banding_t]
       [engine]

engine: 'tokens' (default — byte tokens, SHA1), 'text_sha1' (raw texts,
k=9 shingles hashed in C, reference-interoperable), 'text_device' (raw
texts, shingles hashed ON DEVICE — 1 byte/char over the link).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from benchmarks import utils  # noqa: E402  (jit cache config)


def make_docs(n, seed=3):
    sets, keys, _, _ = utils.generate_sets(n_sets=n, n_queries=1, seed=seed)
    return utils.sets_to_docs(sets)


def make_texts(n, seed=3):
    """Text form of the same corpus: tokens joined into one byte string
    per doc (text engines then define similarity over k-byte shingles)."""
    return [b" ".join(d) for d in make_docs(n, seed)]


SHINGLE_K = 9


def ours(docs, threshold=0.8, num_perm=128, banding_threshold=None,
         engine="tokens"):
    """banding_threshold < threshold casts a wider candidate net (recall
    1.0 at the exact threshold in our sweeps) at more rerank cost; None
    bands at the target threshold (reference behavior: ~50% recall for
    pairs sitting exactly at the threshold, by the S-curve).

    engine: 'tokens' (byte tokens, SHA1), 'text_sha1' (raw texts,
    shingles hashed in C), or 'text_device' (raw texts, shingles hashed
    ON DEVICE — 1B/char on the wire, ops/text_ops.py)."""
    from datasketch_tpu import MinHash, TpuMinHashLSH

    t0 = time.perf_counter()
    if engine == "tokens":
        sigs = MinHash.bulk_signatures(docs, num_perm=num_perm)
    elif engine == "text_sha1":
        sigs = MinHash.bulk_from_text(docs, k=SHINGLE_K, num_perm=num_perm)
    elif engine == "text_device":
        sigs = MinHash.bulk_from_text(
            docs, k=SHINGLE_K, num_perm=num_perm, hashfunc="device"
        )
    else:
        raise ValueError(engine)
    index = TpuMinHashLSH(
        threshold=banding_threshold or threshold,
        num_perm=num_perm,
        bucket_cap=128,
    )
    index.index(list(range(len(docs))), sigs)
    import jax.numpy as jnp

    from datasketch_tpu.ops import lsh_ops

    pairs = set()
    max_dups = 64  # per-doc duplicate budget; raise for heavier clustering
    n = len(sigs)
    sigs_dev = index._sigs_dev
    from datasketch_tpu.ops import pallas_kernels as pk

    fused = (
        pk.signature_kernel_available() or lsh_ops.SCORE_KERNEL_INTERPRET
    ) and num_perm % 128 == 0
    if fused:
        # Fused Mosaic scan (round 4): the running top-k lives in VMEM,
        # so no [Q, tile] score matrix bounds the chunk — 8k-query
        # chunks at flat memory. count_ge=threshold lets tiles without
        # a single above-cutoff score skip the merge entirely, which
        # for a dedup sweep (hits are rare) leaves ~just the compare.
        use_scan, chunk = True, 8192
    else:
        # XLA-scan fallback, measured at 100k docs: the exact streaming
        # scan wins ONLY at serving-sized query chunks (~1k — at
        # Q=8192/chunk its [Q, tile] score intermediates blow past VMEM
        # and the per-tile top_k grows quadratic-ish: 84s vs the band
        # path's 59s). Bands keep the big chunks (cost Q*b*cap, not Q*N).
        use_scan = sigs_dev.shape[0] <= 1024 * index.b * index.bucket_cap
        chunk = 1024 if use_scan else 8192
    for i in range(0, n, chunk):
        q = sigs[i : i + chunk]
        if q.shape[0] != chunk:  # keep one compiled shape
            q = np.pad(q, ((0, chunk - q.shape[0]), (0, 0)))
        if fused:
            ids, sc, _cnt = lsh_ops.topk_scan(
                sigs_dev, jnp.asarray(q), max_dups,
                n_valid=jnp.int32(index._n_real),
                count_ge=jnp.float32(threshold),
            )
        elif use_scan:
            ids, sc = lsh_ops.topk_scan(
                sigs_dev, jnp.asarray(q), max_dups,
                n_valid=jnp.int32(index._n_real),
            )
        else:
            ids, sc, _ = lsh_ops.topk_fused(
                index._sorted_fp, index._sorted_ids, sigs_dev,
                jnp.asarray(q), index.b, index.r, index.bucket_cap,
                max_dups, n_valid=jnp.int32(index._n_real),
            )
        ids = np.asarray(ids)[: min(chunk, n - i)]
        sc = np.asarray(sc)[: min(chunk, n - i)]
        qi = np.arange(i, i + ids.shape[0])[:, None]
        mask = (ids >= 0) & (sc >= threshold) & (ids != qi)
        a = np.minimum(ids[mask], np.broadcast_to(qi, ids.shape)[mask])
        b = np.maximum(ids[mask], np.broadcast_to(qi, ids.shape)[mask])
        pairs.update(zip(a.tolist(), b.tolist()))
    return time.perf_counter() - t0, pairs


def reference(docs, threshold=0.8, num_perm=128, engine="tokens"):
    sys.path.insert(0, "/root/reference")
    import importlib

    ds = importlib.import_module("datasketch")
    sys.path.pop(0)
    t0 = time.perf_counter()
    mhs = []
    for doc in docs:
        m = ds.MinHash(num_perm=num_perm, seed=1)
        if engine == "tokens":
            m.update_batch(doc)
        else:  # the reference docs' text recipe: shingle in Python
            m.update_batch(
                [doc[i : i + SHINGLE_K]
                 for i in range(max(0, len(doc) - SHINGLE_K + 1))]
            )
        mhs.append(m)
    lsh = ds.MinHashLSH(threshold=threshold, num_perm=num_perm)
    for i, m in enumerate(mhs):
        lsh.insert(i, m)
    pairs = set()
    for i, m in enumerate(mhs):
        for key in lsh.query(m):
            if key != i:
                pairs.add((min(i, key), max(i, key)))
    return time.perf_counter() - t0, pairs


def exact_duplicate_pairs(docs, threshold):
    """Exact true-Jaccard duplicate pairs via sparse intersection counts
    (one sparse matmul; ~1s at 2k docs)."""
    from scipy.sparse import csr_matrix

    vocab: dict = {}
    indices, indptr = [], [0]
    for d in docs:
        ids = {vocab.setdefault(t, len(vocab)) for t in d}
        indices.extend(ids)
        indptr.append(len(indices))
    mat = csr_matrix(
        (np.ones(len(indices), np.int32), indices, indptr),
        shape=(len(docs), len(vocab)),
    )
    inter = (mat @ mat.T).tocoo()
    sizes = np.asarray(mat.sum(axis=1)).ravel()
    union = sizes[inter.row] + sizes[inter.col] - inter.data
    hit = (inter.row < inter.col) & (inter.data / union >= threshold)
    return set(
        zip(inter.row[hit].tolist(), inter.col[hit].tolist())
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_ref = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    banding_t = float(sys.argv[3]) if len(sys.argv) > 3 else None
    engine = sys.argv[4] if len(sys.argv) > 4 else "tokens"
    threshold_of_run = 0.8
    docs = make_docs(n) if engine == "tokens" else make_texts(n)

    # first pass pays one-time jit compiles for this corpus' shapes;
    # report the steady-state (second) pass
    ours(docs, banding_threshold=banding_t, engine=engine)
    t_ours, pairs_ours = ours(docs, banding_threshold=banding_t,
                              engine=engine)
    rate_ours = n / t_ours
    print(f"ours[{engine}] {n} docs: {t_ours:.2f}s "
          f"({rate_ours:,.0f} docs/s), "
          f"{len(pairs_ours)} duplicate pairs")

    ref_engine = "tokens" if engine == "tokens" else "text"
    t_ref, pairs_ref = reference(docs[:n_ref], engine=ref_engine)
    rate_ref = n_ref / t_ref
    print(f"reference {n_ref} docs: {t_ref:.2f}s ({rate_ref:,.0f} docs/s)")
    print(f"pipeline speedup: {rate_ours / rate_ref:.1f}x")

    # quality on the slice both processed: candidate sets at equal banding
    # differ only by our fused rerank (the manual filtering the reference
    # docs prescribe, lsh.py:374-378)
    sub_ours = {p for p in pairs_ours if p[0] < n_ref and p[1] < n_ref}
    sub_ref = set(pairs_ref)
    # EXACT all-pairs ground truth on the slice (sparse intersection
    # counts): restricting the denominator to pairs either method
    # surfaced would hide duplicates BOTH methods missed and overstate R
    if engine == "tokens":
        gt_docs = docs[:n_ref]
    else:  # text engines define similarity over the k-shingle sets
        gt_docs = [
            [t[i : i + SHINGLE_K]
             for i in range(max(0, len(t) - SHINGLE_K + 1))]
            for t in docs[:n_ref]
        ]
    true_pairs = exact_duplicate_pairs(gt_docs, threshold_of_run)
    for name, pairs in (("ours", sub_ours), ("ref ", sub_ref)):
        tp = len(pairs & true_pairs)
        prec = tp / len(pairs) if pairs else 1.0
        rec = tp / len(true_pairs) if true_pairs else 1.0
        print(f"{name} on shared slice: {len(pairs)} pairs "
              f"P={prec:.2f} R={rec:.2f} (vs true Jaccard >= threshold)")


if __name__ == "__main__":
    main()

"""Headline benchmark: BOTH halves of BASELINE.json's north star.

1. MinHash signature construction throughput: end-to-end signatures/sec
   at num_perm=128 from raw byte tokens — token hashing (SHA1) included —
   ours (native C++ batch SHA1 + fused device permute/min) vs the
   reference's ``MinHash.update_batch`` NumPy path measured live on this
   host's CPU (``/root/reference/datasketch/minhash.py:226-297``). Falls
   back to a recorded baseline constant if the reference isn't importable.
2. LSH top-k queries/sec at matched recall@10: ``TpuMinHashLSH.top_k``
   over the clustered-sets protocol of ``benchmarks/jaccard_topk.py``,
   recall scored against a live exact-Jaccard scan (the reference's own
   ground-truth procedure), vs that exact scan's queries/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"lsh_topk": {...second metric...}}.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from typing import Optional

import numpy as np

NUM_PERM = 128
TOKENS_PER_DOC = 200
OUR_DOCS = 16384
REF_DOCS = 384
# Reference CPU rate measured locally (docs/sec at this exact config) —
# used only when /root/reference is not importable on the bench host.
# Measured 2026-08-16 on this host (1 core): 640-790 docs/s across runs.
FALLBACK_REF_RATE = 660.0

# Wall-clock budget for the MEASURED sections (the device probe has its
# own bound). Optional protocol rows check the remaining budget before
# running and emit a machine-readable skip instead of overrunning the
# caller's timeout; required rows (headline, lsh_topk) always run.
_BENCH_BUDGET = float(os.environ.get("DATASKETCH_BENCH_BUDGET", "300"))
_BENCH_T0: Optional[float] = None  # set in main() after the device probe


def _budget_left() -> float:
    if _BENCH_T0 is None:
        return _BENCH_BUDGET
    return _BENCH_BUDGET - (time.monotonic() - _BENCH_T0)


_ROW_SECONDS: dict = {}


def _timed(name: str, thunk):
    """Run one bench row recording its wall time (summary.row_seconds —
    the data that says which row to trim when bench_seconds drifts)."""
    t0 = time.monotonic()
    try:
        return thunk()
    finally:
        _ROW_SECONDS[name] = round(time.monotonic() - t0, 1)


_SYNTH_CACHE: dict = {}


def _synth_cached(n_docs: int, num_perm: int):
    """Memoized ``synth_signatures`` — the 131k planted-dup corpus is
    built identically by the lsh_topk_scale and bbit_scan rows (same
    (n, num_perm, seed) -> same output); one host synthesis serves
    both. The 1M row stays uncached (nothing shares it and the 512MB
    matrix should be freed when the row ends)."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from benchmarks.scale_benchmark import synth_signatures

    key = (n_docs, num_perm)
    if key not in _SYNTH_CACHE:
        _SYNTH_CACHE[key] = synth_signatures(n_docs, num_perm)
    return _SYNTH_CACHE[key]


class _phases:
    """Sub-row phase timer: ``with _phases("forest") as ph: ph("gt")``
    stamps the elapsed time since the previous stamp into
    summary.row_seconds as "forest.gt" — the per-phase data that says
    WHAT inside a row to trim (row totals alone said which row)."""

    def __init__(self, row: str):
        self.row = row

    def __enter__(self):
        self.t = time.monotonic()
        return self

    def __call__(self, phase: str):
        now = time.monotonic()
        _ROW_SECONDS["%s.%s" % (self.row, phase)] = round(now - self.t, 1)
        self.t = now

    def __exit__(self, *exc):
        return False


# Shared clustered-sets protocol artifacts. Corpus generation and the
# exact-Jaccard ground truth each cost ~15s at 16k sets on this 1-core
# host, and the forest and hnsw rows use IDENTICAL protocol parameters
# (their ground truths nest: same query order, same k) — paying that
# fixed cost once cut ~25-40s off bench_seconds (round-5 row_seconds).
# Host-side objects only: no device buffers are cached (the tunnel's
# live-corpora pathology — see bench_fast_rows — is about device
# uploads, which each row still owns and frees).
_PROTO_CACHE: dict = {}
_SIG_CACHE: dict = {}


def _protocol(n_sets: int, n_queries: int, mean_size: int = 190,
              gt_queries: int = 0, k: int = 10):
    """(sets, query_sets, query_keys, gt) for the clustered protocol."""
    from benchmarks import utils as butils

    key = (n_sets, n_queries, mean_size)
    if key not in _PROTO_CACHE:
        sets, _keys, query_sets, query_keys = butils.generate_sets(
            n_sets=n_sets, n_queries=n_queries, mean_size=mean_size
        )
        _PROTO_CACHE[key] = {
            "sets": sets, "query_sets": query_sets,
            "query_keys": query_keys, "gt": {},
        }
    ent = _PROTO_CACHE[key]
    gt = None
    if gt_queries:
        have = ent["gt"].get(k)
        if have is None or len(have) < gt_queries:
            ent["gt"][k] = butils.exact_topk_sparse(
                ent["sets"], ent["query_sets"][:gt_queries], k
            )
        gt = ent["gt"][k][:gt_queries]
    return ent["sets"], ent["query_sets"], ent["query_keys"], gt


def _proto_sigs(n_sets: int, n_queries: int, num_perm: int,
                mean_size: int = 190) -> np.ndarray:
    """Signature matrix for a cached protocol corpus. Permutation draws
    are interleaved (ops/minhash_ops.py), so a wide matrix's first
    columns are bit-identical to a narrower build — one widest build
    serves every row (tests/test_tpu_forest.py prefix-stability)."""
    from benchmarks import utils as butils
    from datasketch_tpu import MinHash

    key = (n_sets, n_queries, mean_size)
    cached = _SIG_CACHE.get(key)
    if cached is None or cached.shape[1] < num_perm:
        sets, _, _, _ = _protocol(n_sets, n_queries, mean_size)
        cached = MinHash.bulk_signatures(
            butils.sets_to_docs(sets), num_perm=num_perm
        )
        _SIG_CACHE[key] = cached
    return cached[:, :num_perm]


def _skip(need: float, row: Optional[str] = None) -> Optional[dict]:
    """None if `need` seconds fit the remaining budget, else a skip row.

    A skipped row carries the same row from the last real-TPU capture
    (``tpu_evidence/bench.json``), explicitly labeled with the capture
    mtime — a cold tunnel (first-dispatch warmup can cost 70-90s of the
    300s budget) then degrades the artifact to "this row is from the
    capture N hours ago" instead of losing the numbers entirely."""
    left = _budget_left()
    if left >= need:
        return None
    out = {
        "skipped": "bench budget exhausted (%.0fs left, row needs ~%.0fs)"
        % (left, need)
    }
    if row:
        try:
            cap_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "tpu_evidence", "bench.json",
            )
            with open(cap_path) as f:
                cap = json.loads(f.readline())
            if cap.get("device") == "tpu" and isinstance(cap.get(row), dict):
                out["last_tpu_capture"] = cap[row]
                out["last_tpu_capture_mtime"] = time.strftime(
                    "%Y-%m-%d %H:%M",
                    time.gmtime(os.path.getmtime(cap_path)),
                )
        except Exception:
            pass
    return out


def _import_reference():
    """Import the reference datasketch from /root/reference (or None)."""
    sys.path.insert(0, "/root/reference")
    try:
        import importlib

        return importlib.import_module("datasketch")
    except Exception:
        return None
    finally:
        sys.path.pop(0)


def make_corpus(n_docs: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    # ~10-byte tokens, shared vocabulary so docs overlap realistically.
    vocab = [bytes(rng.randint(0, 256, size=10, dtype=np.uint8)) for _ in range(30000)]
    return [
        [vocab[j] for j in rng.randint(0, len(vocab), size=TOKENS_PER_DOC)]
        for _ in range(n_docs)
    ]


def _sigs_runner(corpus, algo):
    """One-shot end-to-end pass: hash corpus -> signatures, REAL sync."""
    from datasketch_tpu.native import corpus as native_corpus
    from datasketch_tpu.ops import minhash_ops
    from datasketch_tpu.utils.profiling import device_sync

    chunk = min(8192, len(corpus))  # 8192 x 200 tokens x 4B = 6.6MB/chunk

    def run(docs=corpus):
        # Chunked pipeline: JAX dispatch is async, so native SHA-NI hashing
        # of chunk i+1 overlaps device permute+min of chunk i. Flat ragged
        # upload (padding happens device-side): end-to-end rate is bound by
        # the ~50MB/s tunnel H2D, so bytes-per-doc shipped IS the metric —
        # 200-token docs padded to 256 would pay 28% more wall time.
        out = []
        for i in range(0, len(docs), chunk):
            flat, lengths = native_corpus.hash_corpus_ragged(
                docs[i : i + chunk],
                algo,
                mode=native_corpus.MODE_INLINE,
            )
            out.append(
                minhash_ops.compute_signatures_ragged(
                    flat, lengths, 1, NUM_PERM
                )
            )
        # force REAL completion: through the axon tunnel, H2D-carrying
        # dispatches are SPECULATED complete — block_until_ready returns
        # with the transfers still queued client-side, so a timing loop
        # without a dependent D2H fetch measures dispatch, not work
        # (measured: the deferred backlog of 9 such "3ms" calls took 163s
        # to absorb at the first real read). device_sync fetches one
        # reduced scalar per chunk in a single device_get.
        device_sync(out)
        return out

    run(corpus[:chunk])  # warm up jit + native lib
    return run


def bench_ours(corpus, algo: Optional[int] = None) -> float:
    from datasketch_tpu.native import corpus as native_corpus

    if algo is None:
        algo = native_corpus.ALGO_SHA1_32
    run = _sigs_runner(corpus, algo)
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return len(corpus) / best


def bench_reference(corpus) -> float:
    datasketch = _import_reference()
    if datasketch is None:
        return 0.0

    def run(docs):
        out = []
        for doc in docs:
            m = datasketch.MinHash(num_perm=NUM_PERM, seed=1)
            m.update_batch(doc)
            out.append(m)
        return out

    run(corpus[:8])
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run(corpus)
        best = min(best, time.perf_counter() - t0)
    return len(corpus) / best


def bench_fast_rows(n_docs: int, chars_per_doc: int = 1024,
                    k: int = 9, passes: int = 2, iters: int = 3):
    """The fast-hash front-end rows, sampled SEQUENTIALLY with a strict
    corpus lifecycle: each row's data is created right before its
    samples and freed right after.

    Two tunnel pathologies shape this protocol (measured 2026-08-17):
    (1) the H2D rate drifts between ~15 and ~55 MB/s in multi-second
    windows, so each row is sampled in ``passes`` separate time windows
    (best across all samples wins); (2) keeping four-plus distinct
    upload corpora/program families LIVE in one process pins most
    upload paths at ~8-13k docs/s (reproduced and bisected: any pair is
    fine at 52-65k, the quad collapses), so at most two corpora coexist
    here — the headline corpus (still referenced by the caller) and the
    current row's own, freed before the next row's is built.

    Rows (all end-to-end, result device-resident, real-completion sync):
    - xxh32: native XXH32 batch hashing, flat ragged upload — the
      reference docs' "plug in xxhash" recipe, measured.
    - device_ids / device_ids_u16: pre-tokenized ids hashed ON-CHIP
      (4B/token wide ids vs 2B/token for a 50k vocab via the automatic
      uint16 downcast).
    - text shingles: raw-text dedup front end, host-hashed (sha1,
      ~4B/char) vs on-device window hashing (1B/char, ops/text_ops.py).
    """
    from datasketch_tpu import MinHash
    from datasketch_tpu.native import corpus as native_corpus
    from datasketch_tpu.utils.profiling import device_sync

    def make_byte_docs(rng):
        vocab = [
            bytes(rng.randint(0, 256, size=10, dtype=np.uint8))
            for _ in range(30000)
        ]
        return [
            [vocab[j] for j in rng.randint(0, 30000, TOKENS_PER_DOC)]
            for _ in range(n_docs)
        ]

    def make_wide(rng):
        return [
            rng.randint(0, 1 << 31, TOKENS_PER_DOC).astype(np.uint32)
            for _ in range(n_docs)
        ]

    def make_vocab(rng):
        return [
            rng.randint(0, 50000, TOKENS_PER_DOC).astype(np.uint32)
            for _ in range(n_docs)
        ]

    def make_texts(rng):
        return [
            bytes(rng.randint(32, 127, size=chars_per_doc, dtype=np.uint8))
            for _ in range(n_docs)
        ]

    def ids_run(docs):
        device_sync(MinHash.bulk_signatures(
            docs, num_perm=NUM_PERM, hashfunc="device", out="device"
        ))

    def text_run(texts_, hf):
        kwargs = {"hashfunc": hf} if hf else {}
        device_sync(MinHash.bulk_from_text(
            texts_, k=k, num_perm=NUM_PERM, out="device", **kwargs
        ))

    rows_spec = [
        ("xxh32", make_byte_docs, None, n_docs),
        ("device_ids", make_wide, ids_run, n_docs),
        ("device_ids_u16", make_vocab, ids_run, n_docs),
        ("text_sha1", make_texts, lambda d: text_run(d, None), n_docs),
        ("text_device", make_texts, lambda d: text_run(d, "device"),
         n_docs),
    ]
    best = {name: float("inf") for name, _m, _r, _n in rows_spec}
    # per-window samples (one per pass): a degraded tunnel window is then
    # distinguishable from a real regression in the JSON itself
    samples = {name: [] for name, _m, _r, _n in rows_spec}
    for _pass in range(passes):
        for name, maker, runner, n in rows_spec:
            data = maker(np.random.RandomState(7))
            if runner is None:  # xxh32: the chunked sigs pipeline
                run = _sigs_runner(data, native_corpus.ALGO_XXH32)
                # (self-warming at construction)
            else:
                run = functools.partial(runner, data)
                run()  # full-size warm: first dispatch pays the jit
                # compile AND the tunnel's first-transfer warmup for
                # this buffer size (a small warm leaves the full-size
                # first pass 8-17x slow)
            pass_best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                run()
                pass_best = min(pass_best, time.perf_counter() - t0)
            best[name] = min(best[name], pass_best)
            samples[name].append(round(n / pass_best, 1))
            del run, data  # free this row's corpus before the next row's
    rows = {
        name + "_docs_per_sec": round(n / best[name], 1)
        for name, _m, _r, n in rows_spec
    }
    rows["samples"] = samples
    rows["text_chars_per_doc"] = chars_per_doc
    rows["k"] = k
    return rows


def bench_lsh_topk(n_sets: int = 2000, n_queries: int = 50, k: int = 10,
                   cascade_perm: int = 512):
    """Second north-star metric: TpuMinHashLSH.top_k queries/sec, recall
    scored against a live exact-Jaccard scan on the same clustered corpus
    (benchmarks/jaccard_topk.py protocol at its fixed config).

    Served through the signature cascade: banding stays at NUM_PERM
    (same bucket structure and candidate wave as before), rerank scores
    use the full cascade width — the recall lever costs memory
    (cascade_perm/NUM_PERM x), not query dispatches."""
    import os
    import sys as _sys

    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks import utils as butils
    from datasketch_tpu import MinHash, TpuMinHashLSH

    sets, _keys, query_sets, query_keys = butils.generate_sets(
        n_sets=n_sets, n_queries=n_queries
    )
    gt, exact_times = butils.exact_topk(sets, query_sets, k)
    docs = butils.sets_to_docs(sets)
    mhs = [
        MinHash(num_perm=cascade_perm, hashvalues=row)
        for row in MinHash.bulk_signatures(docs, num_perm=cascade_perm)
    ]
    index = TpuMinHashLSH(threshold=0.15, num_perm=NUM_PERM, bucket_cap=512,
                          cascade_perm=cascade_perm)
    index.index(list(range(len(mhs))), mhs)
    queries = [mhs[i] for i in query_keys]
    index.top_k(queries, k=k)  # warm the serving-shape compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rows = index.top_k(queries, k=k)
        best = min(best, time.perf_counter() - t0)
    recall = float(np.mean(butils.compute_recalls(rows, gt)))
    ours_qps = n_queries / best
    # pipelined serving: batches in flight hide the tunnel round trip.
    # Two 8-batch windows (same total cost as one 16-batch run) so the
    # server-side rate drift can't sink the metric — same best-of
    # treatment as the sync loop above.
    n_stream = 8
    stream_samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        stream_rows = list(index.top_k_stream([queries] * n_stream, k=k))
        stream_samples.append(
            round(n_stream * n_queries / (time.perf_counter() - t0), 1)
        )
    stream_qps = max(stream_samples)
    assert stream_rows[0] == rows
    exact_qps = 1.0 / float(np.mean(exact_times))
    return {
        "queries_per_sec": round(ours_qps, 1),
        "pipelined_queries_per_sec": round(stream_qps, 1),
        "pipelined_samples": stream_samples,
        "recall_at_10": round(recall, 3),
        "exact_scan_queries_per_sec": round(exact_qps, 1),
        "vs_exact_scan": round(ours_qps / exact_qps, 2),
        "config": "%d clustered sets, %d queries, k=%d, thr=0.15 banding, "
        "cascade %d" % (n_sets, n_queries, k, cascade_perm),
    }


def bench_lsh_scale(n_docs: int = 131072, n_queries: int = 800, k: int = 10):
    """At-scale serving row: >=100k docs, >=800-query batches — the regime
    where the device index wins (below ~100k docs the ~30ms tunnel RTT,
    not kernel time, bounds q/s; BASELINE.md round-2 notes). Signatures
    are synthesized with planted near-duplicates
    (benchmarks/scale_benchmark.py protocol) so the row isolates the
    index; recall@10 is the fraction of planted sources found."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from datasketch_tpu import TpuMinHashLSH

    sigs, src, dst = _synth_cached(n_docs, NUM_PERM)
    # two build samples (fresh index each): the one-shot build is
    # upload-dominated and the tunnel rate drifts in multi-minute
    # windows — a single sample can land 7x low
    build_samples = []
    for _ in range(2):
        index = TpuMinHashLSH(
            threshold=0.5, num_perm=NUM_PERM, bucket_cap=128
        )
        t0 = time.perf_counter()
        index.index(list(range(n_docs)), sigs)
        index.status()  # forces the build to complete (device sync)
        build_samples.append(round(n_docs / (time.perf_counter() - t0), 1))
    queries = sigs[dst[-n_queries:]]
    expect = src[-n_queries:]
    index.top_k(queries, k=k)  # warm the serving-shape compile
    qps_samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        rows = index.top_k(queries, k=k)
        qps_samples.append(round(n_queries / (time.perf_counter() - t0), 1))
    found = sum(
        1 for want, row in zip(expect, rows) if want in [kk for kk, _ in row]
    )
    return {
        "queries_per_sec": max(qps_samples),
        "queries_per_sec_samples": qps_samples,
        "recall_at_10": round(found / n_queries, 3),
        "build_docs_per_sec": max(build_samples),
        "build_samples": build_samples,
        "config": "%d synthetic docs (planted dups), %d-query batches, k=%d"
        % (n_docs, n_queries, k),
    }


def bench_hll(device_kind: str):
    """BASELINE config 2: HyperLogLog++ p=14 streaming cardinality.

    Ours: ``HyperLogLogPlusPlus.bulk_registers`` — native batch SHA1-64
    (SHA-NI) + ONE flattened scatter-max for the whole corpus — measured
    in tokens/s over a multi-doc stream. An HLL update is all scatter and
    no arithmetic, so the honest fast path is host-side (shipping it to
    the device measured 0.5x — BASELINE.md); a second sample uses
    pre-tokenized integer ids with the vectorized mix64.
    Reference: ``HyperLogLogPlusPlus.update`` per item, measured live
    (the protocol of
    ``/root/reference/benchmark/sketches/hyperloglog_benchmark.py:35-44``
    pinned at p=14).
    """
    from datasketch_tpu import HyperLogLogPlusPlus

    p = 14
    n_docs = 2048 if device_kind == "tpu" else 512
    tokens_per_doc = 512
    n_tokens = n_docs * tokens_per_doc
    docs = [
        [b"d%d-t%d" % (d, i) for i in range(tokens_per_doc)]
        for d in range(n_docs)
    ]
    HyperLogLogPlusPlus.bulk_registers(docs[:8], p=p)  # warm native lib
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        regs = HyperLogLogPlusPlus.bulk_registers(docs, p=p)
        samples.append(round(n_tokens / (time.perf_counter() - t0), 1))
    # accuracy + single-sketch streaming rate. device_mode='disable':
    # an HLL update is all scatter and no arithmetic, so for ONE sketch
    # the host path is the honest fast path (shipping the stream across
    # the tunnel measured 0.5x — BASELINE.md); the device rows above
    # cover the corpus/bulk regime.
    h = HyperLogLogPlusPlus(p=p, device_mode="disable")
    uniq = [b"u-%d" % i for i in range(1 << 17)]
    t0 = time.perf_counter()
    for i in range(0, len(uniq), 1 << 15):
        h.update_batch(uniq[i : i + (1 << 15)])
    stream_rate = round(len(uniq) / (time.perf_counter() - t0), 1)
    rel_err = abs(h.count() - len(uniq)) / len(uniq)
    # pre-tokenized integer ids: vectorized mix64, no per-token hashing
    ids = [np.arange(i, i + tokens_per_doc, dtype=np.uint64)
           for i in range(0, n_tokens, tokens_per_doc)]
    t0 = time.perf_counter()
    HyperLogLogPlusPlus.bulk_registers(ids, p=p, hashfunc="device")
    ids_rate = round(n_tokens / (time.perf_counter() - t0), 1)
    del regs
    ref_rate = 0.0
    datasketch = _import_reference()
    if datasketch is not None:
        rh = datasketch.HyperLogLogPlusPlus(p=p)
        n_ref = 20000
        flat = [t for d in docs[:n_ref // tokens_per_doc + 1] for t in d]
        t0 = time.perf_counter()
        for tok in flat[:n_ref]:
            rh.update(tok)
        ref_rate = n_ref / (time.perf_counter() - t0)
    return {
        "tokens_per_sec": max(samples),
        "samples": samples,
        "stream_tokens_per_sec": stream_rate,
        "device_ids_tokens_per_sec": ids_rate,
        "rel_err_131k_uniques": round(rel_err, 4),
        "ref_tokens_per_sec": round(ref_rate, 1),
        "vs_reference": round(max(samples) / ref_rate, 2) if ref_rate else None,
        "config": "p=14, %d docs x %d tokens (bulk), 131k-unique stream"
        % (n_docs, tokens_per_doc),
    }


def bench_cws(device_kind: str):
    """BASELINE config 4a: Weighted MinHash (CWS) sketching throughput at
    dim=10k, sample_size=128 — ``WeightedMinHashGenerator.minhash_many``
    with device-resident output (Mosaic CWS kernel; chunked upload
    pipeline) vs the reference's per-vector ``minhash`` measured live
    (``/root/reference/benchmark/sketches/weighted_minhash_benchmark.py``
    protocol at its documented dim)."""
    from datasketch_tpu import WeightedMinHashGenerator
    from datasketch_tpu.utils.profiling import device_sync

    import scipy.sparse as sp

    ph = _phases("weighted_cws").__enter__()
    dim, sample_size = 10000, 128
    n_rows = 8192 if device_kind == "tpu" else 128
    rng = np.random.RandomState(17)
    # ~2%-dense corpus generated DIRECTLY in CSR form: drawing the two
    # dense [n_rows, dim] uniforms/normals the old mask construction
    # needed cost 23-28s of the row's budget on this 1-core host for
    # entries that are 98% zeros. Exactly the same law — an iid
    # Bernoulli(2%) mask is a Binomial(dim, 2%) count plus a uniform
    # WITHOUT-replacement subset of that size (Generator.choice uses
    # Floyd's algorithm; RandomState.choice would permute all of dim) —
    # x |N(0,1)| values, one guaranteed nonzero per row.
    subset_rng = np.random.default_rng(17)
    indices, data, indptr = [], [], [0]
    row_nnz = rng.binomial(dim, 0.02, size=n_rows)
    for i in range(n_rows):
        ix = np.unique(np.append(
            subset_rng.choice(dim, row_nnz[i], replace=False), i % dim
        ))
        v = np.abs(rng.randn(ix.size)).astype(np.float32)
        v[np.searchsorted(ix, i % dim)] = 1.0
        indices.append(ix.astype(np.int32))
        data.append(v)
        indptr.append(indptr[-1] + ix.size)
    ph("gen_X")
    # CSR input takes the round-5 sparse upload path: (values,
    # dim-indices) ship ragged (~2KB/row at 2% density vs 40KB dense
    # over the ~50MB/s tunnel) and a Mosaic kernel reduces over only
    # the active dims — bit-identical (k, t) to the dense path
    # (tests/test_pallas_kernels.py parity; reference CSR-in batch API:
    # /root/reference/datasketch/weighted_minhash.py:161-247)
    X_csr = sp.csr_matrix(
        (np.concatenate(data), np.concatenate(indices),
         np.asarray(indptr)),
        shape=(n_rows, dim),
    )
    bytes_per_row = (X_csr.data.nbytes + X_csr.indices.nbytes) / n_rows
    gen = WeightedMinHashGenerator(dim, sample_size=sample_size, seed=1)
    ph("csr_gen")
    device_sync([gen.minhash_many(X_csr[:64], out="device")])  # warm
    ph("warm")
    samples = []
    kt_dev = None
    for _ in range(3):
        t0 = time.perf_counter()
        kt_dev = gen.minhash_many(X_csr, out="device")
        device_sync([kt_dev])
        samples.append(round(n_rows / (time.perf_counter() - t0), 1))
    ph("measure")
    # dense-path contrast sample (the transport-bound r4 configuration)
    n_dense = min(1024, n_rows)
    X_head = X_csr[:n_dense].toarray().astype(np.float32)
    t0 = time.perf_counter()
    device_sync([gen.minhash_many(X_head, out="device")])
    dense_rate = round(n_dense / (time.perf_counter() - t0), 1)
    ph("dense_contrast")
    # device serving: the (k,t) batch indexes into TpuMinHashLSH without
    # ever leaving HBM (on-device kt->slot mix); self top-1 checks the
    # weighted-Jaccard rerank end to end
    from datasketch_tpu import TpuMinHashLSH

    serve = {}
    try:
        idx = TpuMinHashLSH(threshold=0.5, num_perm=sample_size)
        idx.index(list(range(n_rows)), kt_dev)
        n_q = min(256, n_rows)
        q_kt = gen.minhash_many(X_csr[:n_q], out="device")
        idx.top_k(q_kt, k=5)  # warm the serving-shape compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rows = idx.top_k(q_kt, k=5)
            best = min(best, time.perf_counter() - t0)
        self_top1 = sum(
            1 for i, row in enumerate(rows) if row and row[0][0] == i
        )
        serve = {
            "lsh_queries_per_sec": round(n_q / best, 1),
            "self_top1_recall": round(self_top1 / n_q, 3),
        }
        del idx, q_kt
    except Exception as exc:
        serve = {"serving_error": repr(exc)}
    ph("serving")
    ref_rate = 0.0
    datasketch = _import_reference()
    if datasketch is not None:
        rgen = datasketch.WeightedMinHashGenerator(
            dim, sample_size=sample_size, seed=1
        )
        n_ref = 8
        X_ref = X_csr[:n_ref].toarray()
        t0 = time.perf_counter()
        for i in range(n_ref):
            rgen.minhash(X_ref[i])
        ref_rate = n_ref / (time.perf_counter() - t0)
    ph("reference")
    return {
        "sketches_per_sec": max(samples),
        "samples": samples,
        "dense_path_sketches_per_sec": dense_rate,
        "ref_sketches_per_sec": round(ref_rate, 1),
        "vs_reference": round(max(samples) / ref_rate, 2) if ref_rate else None,
        **serve,
        "config": "dim=%d, sample_size=%d, %d CSR rows (~2%% dense, "
        "%.0fB/row shipped vs %dB dense), device-resident (k,t) output; "
        "serving = device kt batch -> TpuMinHashLSH top-5"
        % (dim, sample_size, n_rows, bytes_per_row, dim * 4),
    }


def bench_ensemble(device_kind: str, n_sets: int = 16384,
                   n_queries: int = 256, n_eval: int = 32):
    """BASELINE config 4b: LSH Ensemble containment queries at 8
    partitions — ``TpuMinHashLSHEnsemble`` (stacked device partitions, one
    dispatch wave per unique r) vs the reference ``MinHashLSHEnsemble``
    measured live on the same sets and banding
    (``/root/reference/benchmark/indexes/containment/
    lshensemble_benchmark.py:1-11`` protocol). Throughput is measured on
    ``n_queries``-sized batches (the device regime); precision/recall is
    scored against exact containment on an ``n_eval``-query subset (the
    exact scan is O(n_sets) per query on the 1-core host)."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from benchmarks import utils as butils
    from datasketch_tpu import MinHash, TpuMinHashLSHEnsemble

    threshold, num_part = 0.8, 8
    if device_kind != "tpu":
        n_sets, n_queries, n_eval = 512, 32, 32
    ph = _phases("lsh_ensemble").__enter__()
    sets, _keys, _qs, query_keys = butils.generate_sets(
        n_sets=n_sets, n_queries=n_queries, mean_size=120
    )
    rng = np.random.RandomState(7)
    query_sets = []
    for qk in query_keys:
        s = sets[qk]
        take = rng.rand(len(s)) < rng.uniform(0.3, 1.0)
        q = s[take]
        query_sets.append(q if len(q) else s[:1])
    ph("corpus")
    truth = butils.exact_containment_sparse(
        sets, query_sets[:n_eval], threshold
    )
    ph("gt")
    docs = butils.sets_to_docs(sets)
    sigs = MinHash.bulk_signatures(docs, num_perm=NUM_PERM)
    q_sigs = MinHash.bulk_signatures(
        butils.sets_to_docs(query_sets), num_perm=NUM_PERM
    )
    ph("sigs")
    ens = TpuMinHashLSHEnsemble(
        threshold=threshold, num_perm=NUM_PERM, num_part=num_part
    )
    ens.index((i, sigs[i], len(sets[i])) for i in range(n_sets))
    queries = [
        (q_sigs[i], len(query_sets[i])) for i in range(n_queries)
    ]
    ph("index")
    ens.query_batch(queries)  # warm the per-unique-r probe compiles
    ph("warm")
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        found = ens.query_batch(queries)
        samples.append(round(n_queries / (time.perf_counter() - t0), 1))
    # pipelined serving: sync scan batches pay a tunnel RTT each while
    # the kernel runs single-digit ms; query_stream hides the RTTs.
    # 2 windows like the sync metric (server-side rate drift, see
    # BASELINE.md "transport variance")
    stream_batches = [queries] * 4
    pipe_samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in ens.query_stream(stream_batches, depth=4):
            pass
        pipe_samples.append(
            round(4 * n_queries / (time.perf_counter() - t0), 1)
        )
    pipelined_qps = max(pipe_samples)
    found = [set(f) for f in found[:n_eval]]
    ps = [len(f & t) / len(f) for f, t in zip(found, truth) if f]
    rs = [len(f & t) / len(t) for f, t in zip(found, truth) if t]
    prec = float(np.mean(ps or [1.0]))
    rec = float(np.mean(rs or [1.0]))
    ph("measure")
    ref_qps = 0.0
    n_ref = min(n_sets, 2048)
    datasketch = _import_reference()
    if datasketch is not None:
        # The reference's generator-pipeline insert runs ~185 sets/s on
        # this host (measured: 88.8s to index the full 16k corpus,
        # 0.06s for 64 queries) — its q/s, the only reference number
        # this row reports, is measured on an n_ref-set subset instead.
        # Per-query cost is b dict probes per partition (size-grows only
        # through bucket fan-out), so the subset q/s is an UPPER bound
        # and vs_reference stays conservative.
        rens = datasketch.MinHashLSHEnsemble(
            threshold=threshold, num_perm=NUM_PERM, num_part=num_part
        )
        rmh = [
            datasketch.MinHash(num_perm=NUM_PERM, hashvalues=row)
            for row in sigs[:n_ref]
        ]
        rens.index((i, rmh[i], len(sets[i])) for i in range(n_ref))
        rq = [
            datasketch.MinHash(num_perm=NUM_PERM, hashvalues=row)
            for row in q_sigs
        ]
        t0 = time.perf_counter()
        for (qm, qs) in zip(rq, (len(q) for q in query_sets)):
            list(rens.query(qm, qs))
        ref_qps = n_queries / (time.perf_counter() - t0)
    ph("reference")
    return {
        "queries_per_sec": max(samples),
        "samples": samples,
        "pipelined_queries_per_sec": pipelined_qps,
        "pipelined_samples": pipe_samples,
        "precision": round(prec, 3),
        "recall": round(rec, 3),
        "f1": round(2 * prec * rec / (prec + rec), 3) if prec + rec else 0.0,
        "ref_queries_per_sec": round(ref_qps, 1),
        "vs_reference": round(max(samples) / ref_qps, 2) if ref_qps else None,
        "config": "%d sets, %d-query batches (P/R on %d), threshold=%.1f, "
        "num_part=%d; ref q/s on a %d-set subset (its ~185 inserts/s "
        "build loop — upper bound, conservative ratio)"
        % (n_sets, n_queries, n_eval, threshold, num_part, n_ref),
    }


def bench_forest(device_kind: str, n_docs: int = 16384,
                 n_queries: int = 256, n_eval: int = 64, k: int = 10):
    """BASELINE config 5 (forest half): ``TpuMinHashLSHForest`` top-k
    queries/s, recall vs exact Jaccard, against the reference
    ``MinHashLSHForest`` measured live at equal (num_perm, l)
    (``/root/reference/benchmark/indexes/jaccard/topk_benchmark.py``
    protocol; reference forest: ``datasketch/lshforest.py:11``).
    Throughput on ``n_queries``-sized batches; recall scored on an
    ``n_eval`` subset (exact ground truth is O(n_docs) per query on the
    1-core host)."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from benchmarks import utils as butils
    from datasketch_tpu import MinHash, TpuMinHashLSHForest

    l = 8
    if device_kind != "tpu":
        n_docs, n_queries, n_eval = 512, 32, 32
    n_eval = min(n_eval, n_queries)
    ph = _phases("lsh_forest").__enter__()
    sets, query_sets, query_keys, gt = _protocol(
        n_docs, n_queries, gt_queries=n_eval, k=k
    )
    ph("corpus_gt")
    # 2*NUM_PERM-wide signatures: prefix trees read the first NUM_PERM
    # slots (prefix-stable, bit-identical to plain 128-wide rows — the
    # reference forest below gets exactly those), the Jaccard rerank
    # scores all 256.
    sigs = _proto_sigs(n_docs, n_queries, 2 * NUM_PERM)
    ph("sigs")
    # rank='jaccard' + method='auto' (default): below the bytes-moved
    # crossover (16k rows << the walk's worst-case q_pad*l*k*cap gather
    # volume) queries route to the EXACT fused top-k scan — recall 1.0
    # over stored sketches, so the only loss left is MinHash estimation
    # noise at the cascade width. Round-5 sweep at this protocol:
    # scan cascade 256 -> 5.9k q/s @ 0.908, 512 -> 4.6k @ 0.922,
    # 1024 -> 3.7k @ 0.939 (the r4 prefix walk was 3.9k @ 0.902 — the
    # scan wins BOTH axes at 256). The walk stays measured below via
    # rank='forest' (reference prefix-ordering contract); above the
    # crossover (131k docs, 8-query batches) walk and scan tie at the
    # ~266 q/s RTT floor.
    forest = TpuMinHashLSHForest(
        num_perm=NUM_PERM, l=l, rank="jaccard",
        cascade_perm=2 * NUM_PERM, pool=512,
    )
    forest.index(list(range(n_docs)), sigs)
    ph("index")
    q_sigs = sigs[query_keys]
    forest.query_batch(q_sigs, k)  # warm the serving-shape compile
    ph("warm")
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        rows = forest.query_batch(q_sigs, k)
        samples.append(round(n_queries / (time.perf_counter() - t0), 1))
    pipe_samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in forest.query_stream([q_sigs] * 4, k, depth=4):
            pass
        pipe_samples.append(
            round(4 * n_queries / (time.perf_counter() - t0), 1)
        )
    pipelined_qps = max(pipe_samples)
    rows = rows[:n_eval]
    rows_ref_rank = forest.query_batch(q_sigs, k, rank="forest")[:n_eval]

    def _recall(result_rows, truth=None):  # rows are plain key lists here
        vals = []
        for res, g in zip(result_rows, truth if truth is not None else gt):
            gt_keys = set(kk for kk, _ in g)
            vals.append(
                sum(1 for kk in res if kk in gt_keys) / len(gt_keys)
                if gt_keys else 1.0
            )
        return float(np.mean(vals))

    recall = _recall(rows)
    ph("measure")
    ref_qps, ref_recall = 0.0, None
    # The reference's host build (16k MinHash facades + per-tree sorts
    # in Python) costs ~20s for a q/s number measured in <1s; build it
    # on a subset instead. Per-query prefix probes binary-search l
    # sorted arrays and fan out over bucket collisions, both of which
    # GROW with corpus size, so the subset q/s is an upper bound and
    # vs_reference stays conservative (same treatment as the ensemble
    # row); its recall is scored against ground truth over ITS corpus.
    n_ref = min(n_docs, 4096)
    datasketch = _import_reference()
    if datasketch is not None:
        rforest = datasketch.MinHashLSHForest(num_perm=NUM_PERM, l=l)
        rmh = [
            datasketch.MinHash(num_perm=NUM_PERM, hashvalues=row)
            for row in sigs[:n_ref, :NUM_PERM]
        ]
        for i, m in enumerate(rmh):
            rforest.add(i, m)
        rforest.index()
        rq = [
            datasketch.MinHash(num_perm=NUM_PERM, hashvalues=row)
            for row in sigs[query_keys][:, :NUM_PERM]
        ]
        rforest.query(rq[0], k)  # warm
        t0 = time.perf_counter()
        ref_rows = [rforest.query(m, k) for m in rq]
        ref_qps = n_queries / (time.perf_counter() - t0)
        ref_gt = butils.exact_topk_sparse(
            sets[:n_ref], [sets[i] for i in query_keys[:n_eval]], k
        )
        ref_recall = _recall(ref_rows[:n_eval], ref_gt)
    ph("reference")
    return {
        "queries_per_sec": max(samples),
        "samples": samples,
        "pipelined_queries_per_sec": pipelined_qps,
        "pipelined_samples": pipe_samples,
        "recall_at_10": round(recall, 3),
        "recall_at_10_forest_rank": round(_recall(rows_ref_rank), 3),
        "ref_queries_per_sec": round(ref_qps, 1),
        "ref_recall_at_10": round(ref_recall, 3) if ref_recall is not None
        else None,
        "vs_reference": round(max(samples) / ref_qps, 2) if ref_qps else None,
        "config": "%d clustered sets, %d-query batches (recall on %d), "
        "k=%d, l=%d, cascade %d, pool 512, method=auto (exact scan below "
        "the crossover; forest_rank row is the prefix walk); ref q/s on "
        "a %d-set subset (upper bound, conservative ratio)"
        % (n_docs, n_queries, n_eval, k, l, 2 * NUM_PERM, n_ref),
    }


def bench_hnsw(device_kind: str, n_docs: int = 16384, n_queries: int = 256,
               n_eval: int = 32, k: int = 10, n_ref: int = 2048):
    """BASELINE config 5 (HNSW half): ``TpuHNSW`` top-k with the
    MinHash-Jaccard metric — device-built NSW graph (``ops/knn_graph``)
    + batched beam queries — vs the reference ``HNSW`` measured live
    with the same metric (``/root/reference/datasketch/hnsw.py:605-647``
    query path; ``/root/reference/benchmark/indexes/jaccard/
    topk_benchmark.py:70-128`` protocol). The reference's Python insert
    loop runs ~200-290 inserts/s on this host (measured), so its index
    is built on an ``n_ref``-set subset and queried with the same query
    signatures — its q/s at the SMALLER corpus is an upper bound (beam
    cost grows with n), which makes ``vs_reference`` conservative."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from benchmarks import utils as butils
    from datasketch_tpu import MinHash, TpuHNSW

    m, ef = 16, 64
    if device_kind != "tpu":
        n_docs, n_queries, n_eval, n_ref = 512, 32, 16, 256
    n_eval = min(n_eval, n_queries)
    # identical protocol parameters to bench_forest: corpus, ground
    # truth (its 32 eval queries are a prefix of the forest's 64), and
    # the signature matrix (first 128 columns of the forest's 256-wide
    # build — prefix-stable) all come from the shared cache
    sets, query_sets, query_keys, gt = _protocol(
        n_docs, n_queries, gt_queries=n_eval, k=k
    )
    sigs = _proto_sigs(n_docs, n_queries, NUM_PERM)
    index = TpuHNSW(distance_metric="minhash_jaccard", m=m, ef=ef)
    t0 = time.perf_counter()
    index.index(list(range(n_docs)), sigs)
    from datasketch_tpu.utils.profiling import device_sync

    device_sync([index._graph.adj0])  # tunnel-honest build completion
    build_s = time.perf_counter() - t0
    q_sigs = sigs[query_keys]
    index.query_batch(q_sigs, k)  # warm the serving-shape compile
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        rows = index.query_batch(q_sigs, k)
        samples.append(round(n_queries / (time.perf_counter() - t0), 1))
    pipe_samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _r in index.query_stream([q_sigs] * 4, k, depth=4):
            pass
        pipe_samples.append(
            round(4 * n_queries / (time.perf_counter() - t0), 1)
        )

    def _recall(result_rows):
        vals = []
        for res, g in zip(result_rows, gt):
            gt_keys = set(kk for kk, _ in g)
            got = set(kk for kk, _ in res)
            vals.append(
                len(got & gt_keys) / len(gt_keys) if gt_keys else 1.0
            )
        return float(np.mean(vals))

    recall = _recall(rows[:n_eval])
    ref_qps, ref_recall = 0.0, None
    datasketch = _import_reference()
    if datasketch is not None:
        def _jd(x, y):
            return 1.0 - float(np.mean(x == y))

        rindex = datasketch.HNSW(distance_func=_jd, m=m,
                                 ef_construction=100)
        for i in range(n_ref):
            rindex.insert(i, sigs[i])
        rq = sigs[query_keys]
        rindex.query(rq[0], k, ef=ef)  # warm
        t0 = time.perf_counter()
        ref_rows = [rindex.query(qq, k, ef=ef) for qq in rq]
        ref_qps = n_queries / (time.perf_counter() - t0)
        # reference recall scored against ground truth over ITS corpus
        ref_gt = butils.exact_topk_sparse(
            sets[:n_ref], [sets[i] for i in query_keys[:n_eval]], k
        )
        vals = []
        for res, g in zip(ref_rows[:n_eval], ref_gt):
            gt_keys = set(kk for kk, _ in g)
            got = set(kk for kk, _ in res)
            vals.append(
                len(got & gt_keys) / len(gt_keys) if gt_keys else 1.0
            )
        ref_recall = float(np.mean(vals))
    return {
        "queries_per_sec": max(samples),
        "samples": samples,
        "pipelined_queries_per_sec": max(pipe_samples),
        "pipelined_samples": pipe_samples,
        "recall_at_10": round(recall, 3),
        "build_seconds": round(build_s, 1),
        "ref_queries_per_sec": round(ref_qps, 1),
        "ref_recall_at_10": round(ref_recall, 3) if ref_recall is not None
        else None,
        "ref_corpus": n_ref,
        "vs_reference": round(max(samples) / ref_qps, 2) if ref_qps else None,
        "config": "%d clustered sets (ref on %d — its insert loop is "
        "~200-290/s), %d-query batches (recall on %d), k=%d, m=%d, ef=%d"
        % (n_docs, n_ref, n_queries, n_eval, k, m, ef),
    }


def bench_scale_1m(n_docs: int = 1 << 20, n_queries: int = 1024, k: int = 10):
    """BASELINE config 3 at full scale: 1M synthetic doc signatures —
    device build docs/s (upload-inclusive, dependent-fetch sync) and
    batched top-k q/s at planted-duplicate recall@10. The reference's
    dict/Redis LSH (``/root/reference/datasketch/lsh.py:326-432``) cannot
    serve this configuration at all, which is why the row exists."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from benchmarks.scale_benchmark import synth_signatures
    from datasketch_tpu import TpuMinHashLSH

    sigs, src, dst = synth_signatures(n_docs, NUM_PERM)
    index = TpuMinHashLSH(threshold=0.5, num_perm=NUM_PERM, bucket_cap=128)
    t0 = time.perf_counter()
    index.index(list(range(n_docs)), sigs)
    index.status()  # forces the build to complete (device sync)
    build_s = time.perf_counter() - t0
    queries = sigs[dst[-n_queries:]]
    expect = src[-n_queries:]
    index.top_k(queries, k=k)  # warm the serving-shape compile
    qps_samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        rows = index.top_k(queries, k=k)
        qps_samples.append(round(n_queries / (time.perf_counter() - t0), 1))
    found = sum(
        1 for want, row in zip(expect, rows) if want in [kk for kk, _ in row]
    )
    # pipelined serving at scale: batches in flight hide the tunnel
    # RTT; two windows per the drift-mitigation convention
    pipe_samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _r in index.top_k_stream([queries] * 4, k=k, depth=4):
            pass
        pipe_samples.append(
            round(4 * n_queries / (time.perf_counter() - t0), 1)
        )
    return {
        "queries_per_sec": max(qps_samples),
        "queries_per_sec_samples": qps_samples,
        "pipelined_queries_per_sec": max(pipe_samples),
        "pipelined_samples": pipe_samples,
        "recall_at_10": round(found / n_queries, 3),
        "build_docs_per_sec": round(n_docs / build_s, 1),
        "build_seconds": round(build_s, 2),
        "config": "%d synthetic docs (planted dups), %d-query batches, "
        "k=%d, single build sample (upload-inclusive)"
        % (n_docs, n_queries, k),
    }


def bench_bbit_scan(n_docs: int, n_queries: int = 256, k: int = 10):
    """b-bit compressed serving row: exact-scan top-k over the packed
    corpus (TpuBBitIndex, b=1 — 32x less HBM per doc than full
    signatures; the scan is HBM-bound on TPU, so the packing is also
    the q/s lever at scale). Planted-duplicate protocol as the scale
    row."""
    import os as _os
    import sys as _sys

    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from datasketch_tpu import TpuBBitIndex

    sigs, src, dst = _synth_cached(n_docs, NUM_PERM)
    idx = TpuBBitIndex(b=1, num_perm=NUM_PERM)
    idx.insert_batch(list(range(n_docs)), sigs)
    queries = sigs[dst[-n_queries:]]
    expect = src[-n_queries:]
    idx.query_batch(queries, k)  # warm the serving-shape compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        rows = idx.query_batch(queries, k)
        best = min(best, time.perf_counter() - t0)
    found = sum(1 for want, row in zip(expect, rows) if want in row)
    return {
        "queries_per_sec": round(n_queries / best, 1),
        "recall_at_10": round(found / n_queries, 3),
        "b": 1,
        "corpus_bytes_per_doc": idx.width * 4,
        "compression_x": round(NUM_PERM * 4 / (idx.width * 4), 1),
        "config": "%d synthetic docs (planted dups), %d-query batches, "
        "k=%d, exact packed scan" % (n_docs, n_queries, k),
    }


# uint32 VPU ops per (token, perm) slot in the permutation chain, counted
# from ops/u64.py: umul32_wide ~21 + mul64 tail 4 + add64 4 + mersenne
# fold ~16 + mask/min ~2.
_OPS_PER_SLOT = 47
# v5e TensorCore VPU nominal: (8 x 128) lanes x 4 ALUs x 0.94 GHz.
_V5E_VPU_GOPS = 3850.0


def bench_kernel_utilization(device_kind: str):
    """Achieved uint32-ops/s of the signature kernel vs the v5e VPU
    roofline — data staged on device first, so this isolates the kernel
    from host hashing and the tunnel."""
    import jax
    import jax.numpy as jnp

    from datasketch_tpu.ops import minhash_ops

    b, t = (1024, 512) if device_kind == "tpu" else (256, 256)
    rng = np.random.RandomState(3)
    hashes = jnp.asarray(
        rng.randint(0, 1 << 32, size=(b, t), dtype=np.uint64).astype(
            np.uint32
        )
    )
    lengths = jnp.asarray(np.full(b, t, np.int32))
    from datasketch_tpu.utils.profiling import device_sync

    out = minhash_ops.compute_signatures(hashes, lengths, 1, NUM_PERM)
    device_sync([out])  # warm compile + force the staged input to land
    # enough iterations that the single final-sync tunnel RTT (~30ms) is
    # noise next to accumulated kernel time — at 10 iters it was ~half
    # the measured wall time, understating utilization ~2x
    iters = 50 if device_kind == "tpu" else 3
    # 3 measurement windows (same drift mitigation as every other row:
    # driver captures ranged 47-64% on single-window runs while the
    # sweep best was 70.7% — report best-of with the samples visible)
    gops_samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [
            minhash_ops.compute_signatures(hashes, lengths, 1, NUM_PERM)
            for _ in range(iters)
        ]
        device_sync(outs)  # real completion (cross-checked vs a chained-
        # dependency measurement: 1.21 vs 1.32 ms/iter at [1024, 512])
        dt = time.perf_counter() - t0
        gops_samples.append(
            round(b * t * NUM_PERM * _OPS_PER_SLOT * iters / dt / 1e9, 1)
        )
    gops = max(gops_samples)
    dt_best = b * t * NUM_PERM * _OPS_PER_SLOT * iters / (gops * 1e9)
    result = {
        "achieved_uint32_gops": gops,
        "samples_gops": gops_samples,
        "ops_per_slot": _OPS_PER_SLOT,
        "docs_per_sec_staged": round(b * iters / dt_best, 1),
        "config": "[%d, %d] tokens x %d perms, device-resident" % (b, t, NUM_PERM),
    }
    if device_kind == "tpu":
        result["roofline_v5e_vpu_gops"] = _V5E_VPU_GOPS
        result["vpu_utilization"] = round(gops / _V5E_VPU_GOPS, 3)
    return result


def wait_for_device(max_wait: Optional[float] = None) -> dict:
    """Bounded device probe with retries: a wedged remote-TPU tunnel
    HANGS dispatches instead of raising (observed — see BASELINE.md
    round-2 notes), which would otherwise hang this whole benchmark.
    Waits up to `max_wait` seconds for the device to answer.

    Default 300s (override: DATASKETCH_BENCH_MAX_WAIT): a healthy-but-
    cold tunnel answers within one 30-90s probe, while a wedge outlasts
    any wait (observed >7h) — waiting longer only eats into the caller's
    own timeout budget before the CPU fallback can run."""
    from datasketch_tpu.utils import device_healthcheck

    if max_wait is None:
        max_wait = float(os.environ.get("DATASKETCH_BENCH_MAX_WAIT", "300"))

    deadline = time.time() + max_wait
    res = {"ok": False, "latency_s": None,
           "error": "max_wait too small for one probe"}
    # A probe shorter than ~30s cannot pass cold backend init even on a
    # HEALTHY device (docstring above), so a final short probe would be a
    # guaranteed-false "hung dispatch" that also overruns the deadline.
    min_probe = 30.0
    while deadline - time.time() >= min_probe:
        budget = min(120.0, deadline - time.time())
        res = device_healthcheck(timeout=budget)
        if res["ok"] or deadline - time.time() < min_probe + 20:
            break
        time.sleep(20)
    return res


def main() -> None:
    global _BENCH_T0
    health = wait_for_device()
    _BENCH_T0 = time.monotonic()  # budget starts after the probe
    device_kind = "tpu"
    n_docs = OUR_DOCS
    if not health["ok"]:
        # A wedged tunnel HANGS dispatches (it does not raise), and the
        # wedge can outlast the whole probe window. Rather than record
        # nothing, rerun the identical protocol on the host CPU backend:
        # the JSON line then reports real (much lower) numbers with the
        # device field flagging the degraded mode. The parent has not
        # touched a device yet (probes are subprocess-isolated), so the
        # platform flip still takes effect.
        import jax

        jax.config.update("jax_platforms", "cpu")
        device_kind = "cpu-fallback"
        n_docs = 2048  # XLA-CPU on this 1-core host; keep the run bounded
        print(
            "DEVICE UNREACHABLE (%s) — falling back to CPU backend"
            % health["error"],
            file=sys.stderr,
            flush=True,
        )
    corpus = make_corpus(n_docs)
    ours = _timed("headline", lambda: bench_ours(corpus))
    ref = _timed("headline_ref", lambda: bench_reference(corpus[:REF_DOCS]))
    baseline_ref = (
        "reference MinHash.update_batch measured live on this host CPU "
        "(same corpus config)"
    )
    if ref <= 0 and FALLBACK_REF_RATE:
        ref = FALLBACK_REF_RATE
        baseline_ref = (
            "recorded reference CPU rate %.0f docs/s (reference not "
            "importable on this host)" % FALLBACK_REF_RATE
        )
    # fast-hash rows run BEFORE the index benches (late-in-process state
    # degrades them ~3-4x, measured 2026-08-17), sequentially with a
    # strict per-row corpus lifecycle (see bench_fast_rows)
    try:
        fast_rows = _timed("fast_hash_rows", lambda: bench_fast_rows(
            8192 if device_kind == "tpu" else 512))
    except Exception as exc:
        fast_rows = {"error": repr(exc)}
    # BASELINE protocol config 2: cheap host-side row (config 4a runs
    # after the index rows — see the weighted_cws note below)
    try:
        hll = _skip(15, "hllpp") or _timed("hllpp", lambda: bench_hll(device_kind))
    except Exception as exc:
        hll = {"error": repr(exc)}
    try:
        lsh = _timed("lsh_topk", bench_lsh_topk)
    except Exception as exc:  # the primary metric must still report
        lsh = {"error": repr(exc)}
    # configs 4b and 5: each pays per-shape serving compiles on top of
    # the measurement, so they carry explicit budget gates
    try:
        ensemble = _skip(50, "lsh_ensemble") or _timed("lsh_ensemble",
                                       lambda: bench_ensemble(device_kind))
    except Exception as exc:
        ensemble = {"error": repr(exc)}
    try:
        forest = _skip(60, "lsh_forest") or _timed("lsh_forest",
                                     lambda: bench_forest(device_kind))
    except Exception as exc:
        forest = {"error": repr(exc)}
    try:
        # at-scale row: full size on the TPU; bounded on the CPU fallback
        if device_kind == "tpu":
            lsh_scale = _timed("lsh_topk_scale", bench_lsh_scale)
        else:
            lsh_scale = _timed("lsh_topk_scale",
                               lambda: bench_lsh_scale(n_docs=16384,
                                                       n_queries=128))
    except Exception as exc:
        lsh_scale = {"error": repr(exc)}
    # config 5 first half: device HNSW vs the reference's (its Python
    # insert loop bounds the reference corpus — see bench_hnsw)
    try:
        hnsw = _skip(75, "hnsw") or _timed("hnsw", lambda: bench_hnsw(device_kind))
    except Exception as exc:
        hnsw = {"error": repr(exc)}
    try:
        util = _timed("signature_kernel",
                      lambda: bench_kernel_utilization(device_kind))
    except Exception as exc:
        util = {"error": repr(exc)}
    # config 4a LAST among the serving rows: its sparse-path warm
    # dispatch intermittently stalls for minutes (measured 221s once at
    # 2026-08-19 18:0x vs 4-25s typical — same tunnel stall family as
    # the upload-rate drift), and running it after the index rows means
    # a stall can no longer starve ensemble/forest/hnsw out of the
    # budget; its own gate carries the last capture instead.
    try:
        cws = _skip(35, "weighted_cws") or _timed("weighted_cws", lambda: bench_cws(device_kind))
    except Exception as exc:
        cws = {"error": repr(exc)}
    try:
        bbit = _skip(20, "bbit_scan") or _timed(
            "bbit_scan", lambda: bench_bbit_scan(
                131072 if device_kind == "tpu" else 16384))
    except Exception as exc:
        bbit = {"error": repr(exc)}
    # config 3 at full scale: 512MB of signatures through the tunnel —
    # the most expensive optional row, last and budget-gated (on the CPU
    # fallback the 131k-doc lsh_topk_scale row already covers the config)
    _SYNTH_CACHE.clear()  # free the 131k corpus before the 512MB row
    try:
        if device_kind == "tpu":
            scale_1m = _skip(55, "lsh_scale_1m") or _timed("lsh_scale_1m", bench_scale_1m)
        else:
            scale_1m = {"skipped": "cpu-fallback (1M row is TPU-only)"}
    except Exception as exc:
        scale_1m = {"error": repr(exc)}
    # The tunnel's transfer rate can pin a row at a degraded level for
    # minutes (BASELINE.md "transport variance"); re-sampling the
    # headline ~10 minutes after the first pass and keeping the best
    # samples two independent windows.
    headline_samples = [round(ours, 1)]
    if device_kind == "tpu" and _skip(20) is None:
        try:
            ours2 = _timed("headline_resample", lambda: bench_ours(corpus))
            headline_samples.append(round(ours2, 1))
            ours = max(ours, ours2)
        except Exception:
            pass
    rows = {
        "metric": "minhash_signatures_per_sec",
        "value": round(ours, 1),
        "unit": "sigs/s (num_perm=128, 200 sha1 tokens/doc, end-to-end)",
        "vs_baseline": round(ours / ref, 2) if ref > 0 else None,
        "baseline_ref": baseline_ref,
        "headline_samples": headline_samples,
        "device": device_kind,
        "degraded": device_kind != "tpu",
        "fast_hash_rows": fast_rows,
        "signature_kernel": util,
        "hllpp": hll,
        "weighted_cws": cws,
        "lsh_topk": lsh,
        "lsh_ensemble": ensemble,
        "lsh_forest": forest,
        "hnsw": hnsw,
        "lsh_topk_scale": lsh_scale,
        "lsh_scale_1m": scale_1m,
        "bbit_scan": bbit,
        "bench_seconds": round(time.monotonic() - _BENCH_T0, 1),
    }
    # Compact recap as the LAST key: the driver's artifact keeps only
    # the TAIL of this line (BENCH_r04.json lost the headline — the
    # first keys truncate first), so every row's key numbers repeat
    # here in short form, making the artifact self-sufficient.
    def _pick(row, *names):
        if not isinstance(row, dict):
            return None
        if "error" in row or "skipped" in row:
            return row.get("error") or row.get("skipped")
        out = {}
        for name in names:
            if row.get(name) is not None:
                out[name.replace("queries_per_sec", "qps")] = row[name]
        return out

    last_tpu = None
    if device_kind != "tpu":
        # Degraded run: point the artifact at the most recent real-TPU
        # capture so its reader still sees hardware numbers (the wedge
        # can outlast a whole round — BASELINE.md round-5 notes).
        cap_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tpu_evidence", "bench.json",
        )
        try:
            with open(cap_path) as f:
                cap = json.loads(f.readline())
            if cap.get("device") == "tpu":
                last_tpu = {
                    "path": "tpu_evidence/bench.json",
                    "captured_mtime": time.strftime(
                        "%Y-%m-%d %H:%M", time.gmtime(os.path.getmtime(cap_path))
                    ),
                    "summary": cap.get("summary") or {
                        "headline_sigs_per_sec": cap.get("value"),
                        "vs_baseline": cap.get("vs_baseline"),
                    },
                }
        except Exception:
            pass
    rows["summary"] = {
        "headline_sigs_per_sec": rows["value"],
        "vs_baseline": rows["vs_baseline"],
        "device": device_kind,
        "bench_seconds": rows["bench_seconds"],
        "row_seconds": _ROW_SECONDS,
        **({"last_tpu_capture": last_tpu} if last_tpu else {}),
        "signature_kernel": _pick(util, "vpu_utilization",
                                  "achieved_uint32_gops"),
        "hllpp": _pick(hll, "tokens_per_sec", "vs_reference"),
        "weighted_cws": _pick(cws, "sketches_per_sec", "vs_reference"),
        "lsh_topk": _pick(lsh, "queries_per_sec", "recall_at_10",
                          "vs_exact_scan"),
        "lsh_ensemble": _pick(ensemble, "queries_per_sec", "precision",
                              "recall", "vs_reference"),
        "lsh_forest": _pick(forest, "queries_per_sec", "recall_at_10",
                            "vs_reference"),
        "hnsw": _pick(hnsw, "queries_per_sec", "recall_at_10",
                      "vs_reference"),
        "lsh_topk_scale": _pick(lsh_scale, "queries_per_sec",
                                "recall_at_10"),
        "lsh_scale_1m": _pick(scale_1m, "queries_per_sec", "recall_at_10"),
        "bbit_scan": _pick(bbit, "queries_per_sec", "recall_at_10",
                           "compression_x"),
    }
    print(json.dumps(rows))
    sys.stdout.flush()
    if device_kind == "cpu-fallback":
        # skip atexit: jax/PJRT teardown may join the wedged tunnel's
        # dispatch thread and block this exit indefinitely
        os._exit(0)


if __name__ == "__main__":
    main()

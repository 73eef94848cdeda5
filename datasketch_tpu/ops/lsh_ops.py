"""Device-resident LSH band tables (functional core).

The reference's per-band ``dict: bytes-key -> set`` tables
(``/root/reference/datasketch/lsh.py:191-200,326-347``) become, on TPU:

- band fingerprints: each band's r uint32 signature slots mixed to one
  uint32 fingerprint (replaces the byte-string ``_H`` at lsh.py:537),
- per-band *sorted arrays* of (fingerprint, doc_id) in device memory,
- insert = append + re-sort (bulk build), query = batched two-sided
  ``searchsorted`` + bounded gather of bucket runs + fused Jaccard rerank.

Everything is static-shape and jittable; dynamic bucket sizes are handled
with a per-band gather cap (overflow is *reported*, not silently dropped:
``query_tables`` returns the number of truncated candidates).

Fingerprint collisions (two different band values mixing to the same
uint32) only add rerank work — the Jaccard rerank (encouraged by the
reference docs, lsh.py:374-378) filters them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from datasketch_tpu.ops.hashing import mix32

__all__ = [
    "band_fingerprints",
    "build_tables",
    "build_offsets",
    "bucket_stats",
    "query_tables",
    "query_tables_direct",
    "query_bands_masked",
    "build_tables_stacked",
    "query_stacked_masked",
    "rerank_jaccard",
    "topk_candidates",
    "threshold_select",
    "unique_compact",
    "query_candidates_fused",
    "query_fused",
    "topk_fused",
    "topk_scan",
]


@functools.partial(jax.jit, static_argnames=("b", "r"))
def band_fingerprints(sigs, b: int, r: int):
    """uint32 fingerprint per band: [N, num_perm] -> [N, b].

    Sequential fmix32 fold over the band's r values (unrolled at trace
    time; r is small). Deterministic, band-local.
    """
    n = sigs.shape[0]
    bands = sigs[:, : b * r].reshape(n, b, r)
    h = jnp.full((n, b), 0x9E3779B9, dtype=jnp.uint32)
    for i in range(r):
        h = mix32(h ^ bands[:, :, i])
    return h


@jax.jit
def build_tables(fps):
    """Sort (fingerprint, doc_id) per band: [N, b] -> ([b, N], [b, N]).

    The per-band sorted array replaces the reference's unordered bucket
    dicts; a bucket is a run of equal fingerprints.
    """
    n, b = fps.shape
    fps_t = fps.T  # [b, N]
    ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (b, n))
    sorted_fp, sorted_ids = jax.vmap(
        lambda f, i: jax.lax.sort((f, i), num_keys=1)
    )(fps_t, ids)
    return sorted_fp, sorted_ids


def _bucket_shift(n_buckets: int) -> int:
    return 32 - int(n_buckets).bit_length() + 1


@functools.partial(jax.jit, static_argnames=("n_buckets",))
def build_offsets(sorted_fp, n_buckets: int):
    """Direct-address offsets over the sorted band tables.

    Fingerprints are uniform uint32, so the top ``log2(n_buckets)`` bits
    index a bucket; ``offsets[band, i]`` is the first table position whose
    fingerprint falls in bucket i. Queries then locate their bucket with a
    single gather instead of a ~20-step binary search over N.
    """
    shift = _bucket_shift(n_buckets)
    bucket = (sorted_fp >> shift).astype(jnp.int32)  # [b, N] nondecreasing
    bounds = jnp.arange(n_buckets + 1, dtype=jnp.int32)
    return jax.vmap(
        lambda bk: jnp.searchsorted(bk, bounds, side="left").astype(jnp.int32)
    )(bucket)


@functools.partial(jax.jit, static_argnames=("cap", "n_buckets"))
def query_tables_direct(sorted_fp, sorted_ids, offsets, q_fps,
                        cap: int, n_buckets: int):
    """Band-bucket lookup via direct addressing.

    Same result contract as :func:`query_tables`, but ``cap`` bounds the
    scanned *bucket* window (bucket spans include any fingerprints sharing
    the top bits); non-matching entries in the window are filtered by an
    exact fingerprint compare. ``truncated`` counts window overflow.
    """
    shift = _bucket_shift(n_buckets)

    def per_band(fp_row, id_row, off_row, q_col):
        bk = (q_col >> shift).astype(jnp.int32)
        start = off_row[bk]
        end = off_row[bk + 1]
        pos = start[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        valid = pos < end[:, None]
        safe = jnp.where(valid, pos, 0)
        match = valid & (fp_row[safe] == q_col[:, None])
        ids = jnp.where(match, id_row[safe], -1)
        trunc = jnp.sum(jnp.maximum(end - start - cap, 0))
        return ids, trunc

    ids, trunc = jax.vmap(per_band, in_axes=(0, 0, 0, 1))(
        sorted_fp, sorted_ids, offsets, q_fps
    )
    return jnp.transpose(ids, (1, 0, 2)), jnp.sum(trunc)


@jax.jit
def bucket_stats(sorted_fp):
    """Health counters over built band tables: per-band bucket occupancy.

    A bucket is a run of equal fingerprints in the sorted band row; the
    max run length tells whether ``bucket_cap`` is about to truncate and
    the distinct count how evenly the corpus spreads.

    Returns:
        (max_run int32[b], n_distinct int32[b]).
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, sorted_fp.shape, 1)
    boundary = jnp.concatenate(
        [
            jnp.ones((sorted_fp.shape[0], 1), dtype=bool),
            sorted_fp[:, 1:] != sorted_fp[:, :-1],
        ],
        axis=1,
    )
    last_start = jax.lax.cummax(jnp.where(boundary, idx, 0), axis=1)
    run_len = idx - last_start + 1
    return run_len.max(axis=1), boundary.sum(axis=1, dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("cap",))
def query_tables(sorted_fp, sorted_ids, q_fps, cap: int = 128):
    """Batched band-bucket lookup.

    Args:
        sorted_fp, sorted_ids: [b, N] built tables.
        q_fps: [Q, b] query fingerprints.
        cap: max members gathered per (query, band) bucket run.

    Returns:
        ids: int32[Q, b, cap] candidate doc ids, -1 where invalid.
        truncated: int32[] total candidates dropped by the cap
            (0 means the result is exact).
    """
    def per_band(fp_row, id_row, q_col):
        start = jnp.searchsorted(fp_row, q_col, side="left")
        end = jnp.searchsorted(fp_row, q_col, side="right")
        pos = start[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
        valid = pos < end[:, None]
        safe_pos = jnp.where(valid, pos, 0)
        ids = jnp.where(valid, id_row[safe_pos], -1)
        trunc = jnp.sum(jnp.maximum(end - start - cap, 0))
        return ids, trunc

    ids, trunc = jax.vmap(per_band, in_axes=(0, 0, 1))(
        sorted_fp, sorted_ids, q_fps
    )  # ids: [b, Q, cap]
    return jnp.transpose(ids, (1, 0, 2)), jnp.sum(trunc)


# Test-only knob: force the Mosaic score-kernel branch in INTERPRET mode so
# CPU CI covers the integrated pallas path of topk_scan / rerank_jaccard
# (the platform gate would otherwise leave it untested until a real-TPU
# run). Read at trace time — flip it before touching new shapes.
SCORE_KERNEL_INTERPRET = False


def _score_kernel_ok(p: int) -> bool:
    """Trace-time gate for the Mosaic score kernels (TPU + lane-tiled P).

    The compare+mean over [Q, C/T, P] is the shape-pathological XLA
    fusion on the remote-TPU path (minutes per unlucky shape); Mosaic
    compiles the same computation in ~1s, so serving paths prefer it
    whenever the platform allows. Row counts are padded by the callers.
    """
    from datasketch_tpu.ops import pallas_kernels as pk

    if p % 128:
        return False
    return pk.signature_kernel_available() or SCORE_KERNEL_INTERPRET


@functools.partial(jax.jit, static_argnames=("chunk",))
def rerank_jaccard(db_sigs, q_sigs, cand_ids, chunk: int = 64):
    """Estimated Jaccard for gathered candidates, chunked over queries.

    The candidate gather runs in XLA (cheap to compile); the [chunk, C, P]
    compare+mean runs as a Mosaic kernel on TPU
    (:func:`datasketch_tpu.ops.pallas_kernels.rerank_scores_pallas`).

    Args:
        db_sigs: uint32[N, P] indexed signatures.
        q_sigs: uint32[Q, P] query signatures.
        cand_ids: int32[Q, C] candidate ids (-1 = invalid).

    Returns:
        float32[Q, C] Jaccard estimates (0 where invalid).
    """
    q_total, c_real = cand_ids.shape
    p = db_sigs.shape[1]
    use_pallas = _score_kernel_ok(p)
    pad = (-q_total) % chunk
    pad_c = (-c_real) % 128 if use_pallas else 0
    q_sigs_p = jnp.pad(q_sigs, ((0, pad), (0, 0)))
    cand_p = jnp.pad(
        cand_ids, ((0, pad), (0, pad_c)), constant_values=-1
    )
    nq = q_sigs_p.shape[0] // chunk
    c = c_real + pad_c

    def body(_, inp):
        qs, cids = inp  # [chunk, P], [chunk, C]
        valid = cids >= 0
        safe = jnp.where(valid, cids, 0)
        cand_sigs = db_sigs[safe]  # [chunk, C, P]
        if use_pallas:
            from datasketch_tpu.ops import pallas_kernels as pk

            eq = pk.rerank_scores_pallas(
                qs, cand_sigs, interpret=SCORE_KERNEL_INTERPRET
            )
        else:
            eq = (cand_sigs == qs[:, None, :]).mean(
                axis=-1, dtype=jnp.float32
            )
        return None, jnp.where(valid, eq, 0.0)

    _, out = jax.lax.scan(
        body,
        None,
        (
            q_sigs_p.reshape(nq, chunk, p),
            cand_p.reshape(nq, chunk, c),
        ),
    )
    return out.reshape(-1, c)[:q_total, :c_real]


@functools.partial(jax.jit, static_argnames=("k", "max_dup"))
def topk_candidates(scores, ids, k: int, max_dup: int = 0):
    """Device-side dedupe + top-k over gathered candidates.

    A band-collision candidate appears once per colliding band with an
    identical score; per-row sort by id exposes runs, duplicates and
    invalid (-1) slots are masked to -1 score, then ``lax.top_k`` selects.

    Args:
        scores: float32[Q, C], ids: int32[Q, C] (-1 = invalid).
        max_dup: if > 0, an id appears at most this many times per row
            (= number of bands); a cheap ``top_k(k * max_dup)`` score
            prefilter then shrinks the expensive per-row id sort.
    Returns:
        (top_ids int32[Q, k], top_scores float32[Q, k]); empty slots have
        id -1 and score -1.
    """
    # Invalid (-1) slots carry score 0.0 from rerank_jaccard; push them to
    # -1 BEFORE any score-based prefilter so they can't displace genuine
    # zero-score candidates (fingerprint collisions).
    scores = jnp.where(ids >= 0, scores, -1.0)
    if max_dup and scores.shape[1] > k * max_dup:
        pre = k * max_dup
        scores, pos = jax.lax.top_k(scores, pre)
        ids = jnp.take_along_axis(ids, pos, axis=1)
    order = jnp.argsort(ids, axis=1)
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    sc_s = jnp.take_along_axis(scores, order, axis=1)
    prev = jnp.concatenate(
        [jnp.full((ids_s.shape[0], 1), -2, dtype=ids_s.dtype), ids_s[:, :-1]],
        axis=1,
    )
    first = (ids_s != prev) & (ids_s >= 0)
    sc_m = jnp.where(first, sc_s, -1.0)
    k_eff = min(k, sc_m.shape[1])
    top_sc, pos = jax.lax.top_k(sc_m, k_eff)
    top_ids = jnp.take_along_axis(ids_s, pos, axis=1)
    top_ids = jnp.where(top_sc >= 0, top_ids, -1)
    if k_eff < k:
        pad = k - k_eff
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=-1)
        top_sc = jnp.pad(top_sc, ((0, 0), (0, pad)), constant_values=-1.0)
    return top_ids, top_sc


@functools.partial(jax.jit, static_argnames=("max_out",))
def threshold_select(scores, ids, cutoff, max_out: int):
    """Device-side dedupe + threshold filter + score-ordered compaction.

    The device finish for threshold queries (the reference's ``query``,
    ``/root/reference/datasketch/lsh.py:370-432``, returns the band-bucket
    union; the rerank cutoff is the filtering its docs tell users to add).
    Replaces the per-query host ``np.unique`` loop: candidates are sorted
    by id per row, duplicate ids (one per colliding band, identical
    scores) and sub-cutoff ids are masked, and the survivors are compacted
    score-descending into ``max_out`` slots — the host receives one small
    buffer and does boolean indexing only.

    Args:
        scores: float32[Q, C] candidate scores (>= 0 for valid slots).
        ids: int32[Q, C] candidate ids, -1 invalid.
        cutoff: scalar (traced — no recompile per threshold); candidates
            with score < cutoff are dropped. Pass -1.0 to keep every
            valid candidate (dedupe only).
        max_out: output slots per query (static).

    Returns:
        (sel_ids int32[Q, max_out], sel_sc float32[Q, max_out],
        n_match int32[Q]) — ``n_match`` counts DISTINCT matching ids
        BEFORE the ``max_out`` cap, so callers can detect truncation.
        Empty slots have id -1 / score -1.
    """
    q, c = ids.shape
    sc = jnp.where((ids >= 0) & (scores >= cutoff), scores, -1.0)
    order = jnp.argsort(ids, axis=1)
    ids_s = jnp.take_along_axis(ids, order, axis=1)
    sc_s = jnp.take_along_axis(sc, order, axis=1)
    prev = jnp.concatenate(
        [jnp.full((q, 1), -2, dtype=ids_s.dtype), ids_s[:, :-1]], axis=1
    )
    first = (ids_s != prev) & (ids_s >= 0) & (sc_s >= 0)
    sc_m = jnp.where(first, sc_s, -1.0)
    n_match = first.sum(axis=1, dtype=jnp.int32)
    k_eff = min(max_out, c)
    top_sc, pos = jax.lax.top_k(sc_m, k_eff)
    top_ids = jnp.take_along_axis(ids_s, pos, axis=1)
    top_ids = jnp.where(top_sc >= 0, top_ids, -1)
    if k_eff < max_out:
        pad = max_out - k_eff
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=-1)
        top_sc = jnp.pad(top_sc, ((0, 0), (0, pad)), constant_values=-1.0)
    return top_ids, top_sc, n_match


@functools.partial(jax.jit, static_argnames=("max_out",))
def unique_compact(ids, max_out: int):
    """Dedupe + compact candidate ids on device, no scores involved.

    The score-free corner of :func:`threshold_select` (containment
    queries have no rerank in the reference, ``lshensemble.py:230-249``):
    per row, distinct valid ids are compacted ascending into ``max_out``
    slots. Returns (sel_ids int32[Q, max_out], n_distinct int32[Q]) —
    ``n_distinct`` counts before the cap so callers detect truncation.
    Constants derive from ``ids`` so the op stays shard_map-safe.
    """
    zeros = (ids & 0).astype(jnp.float32)
    sel_ids, _, n = threshold_select(zeros, ids, zeros[0, 0] - 1.0, max_out)
    return sel_ids, n


@functools.partial(jax.jit, static_argnames=("b", "r", "cap"))
def query_bands_masked(sorted_fp, sorted_ids, q_sigs, b: int, r: int,
                       cap: int, n_bands):
    """Probe ALL ``b`` bands, keep only the first ``n_bands`` (dynamic).

    The containment ensemble probes one r-index with a different band
    count per x/q ratio (``/root/reference/datasketch/lsh.py:545-558``);
    slicing tables to ``[:n_bands]`` would compile one program per
    distinct band count (expensive through a remote-TPU tunnel, and
    there are up to 10 counts per r-index). Probing every band and
    masking keeps ONE compiled program per (r, query-bucket) shape.

    Note: ``truncated`` counts cap overflow across all b bands, so it can
    overreport relative to an exact first-``n_bands`` probe — 0 still
    means the kept results are exact.

    Returns (flat ids int32[Q, b*cap], truncated int32[]).
    """
    q_fps = band_fingerprints(q_sigs, b, r)
    ids, trunc = query_tables(sorted_fp, sorted_ids, q_fps, cap=cap)
    keep = jnp.arange(b, dtype=jnp.int32)[None, :, None] < n_bands
    ids = jnp.where(keep, ids, -1)
    return ids.reshape(q_sigs.shape[0], -1), trunc


@functools.partial(jax.jit, static_argnames=("b", "r"))
def build_tables_stacked(sigs_stack, b: int, r: int):
    """Band tables for a STACK of equally-padded sub-indexes in one
    program: ``sigs_stack`` is uint32[parts, N_pad, P]; returns
    (sorted_fp, sorted_ids) each [parts, b, N_pad].

    The containment ensemble's partitions (``/root/reference/datasketch/
    lshensemble.py:137-151``) become one vmapped build per unique r —
    one XLA program + one dispatch instead of ``num_part`` of each
    (remote-TPU compiles are minutes-scale; this is the difference
    between a usable and an unusable cold start)."""

    def per_part(sigs):
        return build_tables(band_fingerprints(sigs, b, r))

    return jax.vmap(per_part)(sigs_stack)


@functools.partial(jax.jit, static_argnames=("b", "r", "cap"))
def query_stacked_masked(sorted_fp, sorted_ids, q_sigs, b: int, r: int,
                         cap: int, b_keep, n_valid):
    """Probe every partition of a stacked r-index with per-(query,
    partition) DYNAMIC band counts.

    Args:
        sorted_fp / sorted_ids: [parts, b, N_pad] stacked tables.
        q_sigs: uint32[Q, P] queries.
        b_keep: int32[Q, parts] — how many leading bands to keep for
            this (query, partition); 0 disables the pair entirely (the
            ensemble assigns each query a possibly different (b, r) per
            partition; pairs whose chosen r differs from this stack's r
            are passed as 0).
        n_valid: int32[parts] real row count per partition.

    Returns:
        (flat global ids int32[Q, parts*b*cap] where global id =
        part * N_pad + local, -1 where masked; truncated int32[]).
    """
    n_pad = sorted_fp.shape[2]
    q_fps = band_fingerprints(q_sigs, b, r)

    def per_part(fp_t, id_t, nv, kb, off):
        ids, trunc = query_tables(fp_t, id_t, q_fps, cap=cap)  # [Q,b,cap]
        keep = jax.lax.broadcasted_iota(jnp.int32, ids.shape, 1) < kb[:, None, None]
        valid = keep & (ids >= 0) & (ids < nv)
        return jnp.where(valid, ids + off, -1), trunc

    parts = sorted_fp.shape[0]
    offs = jnp.arange(parts, dtype=jnp.int32) * jnp.int32(n_pad)
    ids, trunc = jax.vmap(per_part, in_axes=(0, 0, 0, 1, 0))(
        sorted_fp, sorted_ids, n_valid, b_keep, offs
    )  # ids: [parts, Q, b, cap]
    ids = jnp.transpose(ids, (1, 0, 2, 3)).reshape(q_sigs.shape[0], -1)
    return ids, jnp.sum(trunc)


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def topk_scan(db_sigs, q_sigs, k: int, n_valid=None, alive=None,
              tile: int = 8192, count_ge=None):
    """Exact top-k by scanning EVERY indexed signature — no banding.

    On TPU the brute-force path is often strictly cheaper than band
    probing: the band path gathers ``Q x (b*cap) x P`` signature slots at
    random (uncoalesced HBM traffic), while the scan streams the whole
    ``N x P`` table once per query tile, sequentially. Whenever
    ``N < Q*b*cap`` the scan moves fewer bytes AND has recall 1.0 over
    the stored signatures (the only loss left is MinHash estimation
    noise, which banding also pays). This is the fused-rerank endgame of
    the reference docs' "filter candidates with ``MinHash.jaccard``"
    advice (``/root/reference/datasketch/lsh.py:374-378``).

    Tiled over N with a running top-k carry so compile shape and peak
    memory are bounded by ``tile`` regardless of corpus size.

    Args:
        db_sigs: uint32[N_pad, P] indexed signatures (padded rows allowed).
        q_sigs: uint32[Q, P] query signatures.
        k: results per query.
        n_valid: scalar int32 — rows >= n_valid are padding.
        alive: optional bool[N_pad] tombstone mask (False = removed).
        tile: rows scored per scan step.
        count_ge: optional scalar cutoff — the scan then ALSO counts, per
            query, how many valid rows score >= cutoff (the exact
            threshold-query match count), masks returned slots below the
            cutoff to -1, and returns a third ``n_match int32[Q]`` output.
            This is the threshold-query scan path: exact over stored
            sketches, truncation (n_match > k) visible to the caller.

    Returns:
        (top_ids int32[Q, k], top_scores float32[Q, k]) — plus
        ``n_match int32[Q]`` when ``count_ge`` is given; empty slots have
        id -1 and score -1.
    """
    n_pad, p = db_sigs.shape
    q = q_sigs.shape[0]
    from datasketch_tpu.ops import pallas_kernels as pk

    if (
        p % 128 == 0
        and k <= pk._TOPK_MAX_K
        and (pk.signature_kernel_available() or SCORE_KERNEL_INTERPRET)
    ):
        # Fused Mosaic scan: the running top-k lives in VMEM across db
        # tiles, so no [Q, tile] score matrix ever reaches HBM — query
        # chunks scale to 8k+ where the lax.scan form capped at ~1024
        # (the round-3 dedup bottleneck).
        return _topk_scan_fused(db_sigs, q_sigs, k, n_valid, alive,
                                count_ge)
    tile = min(tile, n_pad)
    n_tiles = -(-n_pad // tile)
    pad_rows = n_tiles * tile - n_pad
    if pad_rows:
        db_sigs = jnp.pad(db_sigs, ((0, pad_rows), (0, 0)))
    # Mosaic scorer for the [Q, tile, P] compare+mean (the XLA fusion of
    # this shape family compiles pathologically through the remote-TPU
    # path); query rows are padded to the kernel block and sliced after.
    from datasketch_tpu.ops import pallas_kernels as pk

    use_pallas = _score_kernel_ok(p) and tile % pk.SCORE_BT == 0
    q_pad = ((-q) % pk.SCORE_BQ) if use_pallas else 0
    if q_pad:
        q_sigs = jnp.pad(q_sigs, ((0, q_pad), (0, 0)))
    q_run = q + q_pad
    nv = jnp.int32(n_pad) if n_valid is None else n_valid.astype(jnp.int32)
    if alive is not None and alive.shape[0] != n_tiles * tile:
        # the tombstone mask covers only real rows; padded rows are
        # already excluded by the n_valid bound
        alive = jnp.pad(alive, (0, n_tiles * tile - alive.shape[0]))
    base = jnp.arange(tile, dtype=jnp.int32)
    k_eff = min(k, tile)

    def body(carry, inp):
        if count_ge is None:
            c_sc, c_ids = carry
        else:
            c_sc, c_ids, c_cnt = carry
        if alive is not None:
            db_tile, t_idx, alive_tile = inp
        else:
            db_tile, t_idx = inp
            alive_tile = None
        ids = base + t_idx * tile  # int32[tile]
        if use_pallas:
            eq = pk.score_matrix_pallas(
                q_sigs, db_tile, interpret=SCORE_KERNEL_INTERPRET
            )  # [Q, tile]
        else:
            eq = (db_tile[None, :, :] == q_sigs[:, None, :]).mean(
                axis=-1, dtype=jnp.float32
            )  # [Q, tile]
        valid = ids < nv
        if alive_tile is not None:
            valid = valid & alive_tile
        eq = jnp.where(valid[None, :], eq, -1.0)
        sc = jnp.concatenate([c_sc, eq], axis=1)
        idc = jnp.concatenate(
            [c_ids, jnp.broadcast_to(ids[None, :], (q_run, tile))], axis=1
        )
        top_sc, pos = jax.lax.top_k(sc, k_eff)
        top_ids = jnp.take_along_axis(idc, pos, axis=1)
        if count_ge is None:
            return (top_sc, top_ids), None
        c_cnt = c_cnt + (eq >= count_ge).sum(axis=1, dtype=jnp.int32)
        return (top_sc, top_ids, c_cnt), None

    # carry init derived from the inputs so it carries their
    # varying-manual-axes type inside shard_map (a plain jnp.full would
    # be unvarying and fail lax.scan's carry check — see
    # parallel/sharded_sketch._local_signatures); the &0 masks fold to
    # constants under plain jit
    zero = (
        (db_sigs[:1, :1] & jnp.uint32(0)) | (q_sigs[:1, :1] & jnp.uint32(0))
    ).astype(jnp.float32)
    init = (
        jnp.broadcast_to(zero, (q_run, k_eff)) - 1.0,
        jnp.broadcast_to(zero.astype(jnp.int32), (q_run, k_eff)) - 1,
    )
    if count_ge is not None:
        init = init + (
            jnp.broadcast_to(zero.astype(jnp.int32)[:, 0], (q_run,)),
        )
    xs = (
        db_sigs.reshape(n_tiles, tile, p),
        jnp.arange(n_tiles, dtype=jnp.int32),
    )
    if alive is not None:
        xs = xs + (alive.reshape(n_tiles, tile),)
    out_carry, _ = jax.lax.scan(body, init, xs)
    if count_ge is None:
        sc, ids = out_carry
    else:
        sc, ids, cnt = out_carry
        # below-cutoff slots are masked out of the returned top-k
        ids = jnp.where(sc >= count_ge, ids, -1)
        sc = jnp.where(sc >= count_ge, sc, -1.0)
    ids = jnp.where(sc >= 0, ids, -1)
    if q_pad:
        ids, sc = ids[:q], sc[:q]
        if count_ge is not None:
            cnt = cnt[:q]
    if k_eff < k:
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        sc = jnp.pad(sc, ((0, 0), (0, k - k_eff)), constant_values=-1.0)
    if count_ge is None:
        return ids, sc
    return ids, sc, cnt


def _topk_scan_fused(db_sigs, q_sigs, k: int, n_valid, alive, count_ge):
    """Trace-time body for :func:`topk_scan`'s Mosaic branch: pad shapes
    to the kernel tiles, normalize the dynamic scalars, slice the query
    padding back off. Same return contract as the lax.scan form."""
    from datasketch_tpu.ops import pallas_kernels as pk

    n_pad, _ = db_sigs.shape
    q = q_sigs.shape[0]
    bq, bt = pk.topk_blocks(db_sigs.shape[1], k)
    n_bt = -(-n_pad // bt) * bt
    if n_bt != n_pad:
        db_sigs = jnp.pad(db_sigs, ((0, n_bt - n_pad), (0, 0)))
    q_pad = (-q) % bq
    if q_pad:
        q_sigs = jnp.pad(q_sigs, ((0, q_pad), (0, 0)))
    nv = (
        jnp.int32(n_pad)
        if n_valid is None
        else jnp.asarray(n_valid, jnp.int32)
    )
    # estimated Jaccard is never negative, so cutoff 0.0 == plain top-k
    cut = (
        jnp.float32(0.0)
        if count_ge is None
        else jnp.asarray(count_ge, jnp.float32)
    )
    use_mask = alive is not None
    alive_i32 = None
    if use_mask:
        if alive.shape[0] != n_bt:
            alive = jnp.pad(alive, (0, n_bt - alive.shape[0]))
        alive_i32 = alive.astype(jnp.int32).reshape(n_bt // bt, 1, bt)
    ids, sc, cnt = pk.topk_scan_pallas(
        db_sigs, q_sigs, nv, cut, k, alive_i32=alive_i32,
        use_mask=use_mask, interpret=SCORE_KERNEL_INTERPRET,
    )
    ids, sc, cnt = ids[:q], sc[:q], cnt[:q]
    if count_ge is None:
        return ids, sc
    return ids, sc, cnt


def _containment_scan_fused(db_sigs, db_sizes, q_sigs, q_sizes, cutoff,
                            k: int):
    """Trace-time body for :func:`containment_scan`'s Mosaic branch:
    pad to the kernel tiles, broadcast the query sizes across the lane
    axis, slice the query padding back off. Same return contract."""
    from datasketch_tpu.ops import pallas_kernels as pk

    n_pad, _p = db_sigs.shape
    q = q_sigs.shape[0]
    bq, bt = pk.topk_blocks(db_sigs.shape[1], k, sizes=True)
    n_bt = -(-n_pad // bt) * bt
    if n_bt != n_pad:
        db_sigs = jnp.pad(db_sigs, ((0, n_bt - n_pad), (0, 0)))
        db_sizes = jnp.pad(db_sizes, (0, n_bt - n_pad))
    q_pad = (-q) % bq
    if q_pad:
        q_sigs = jnp.pad(q_sigs, ((0, q_pad), (0, 0)))
        q_sizes = jnp.pad(q_sizes, (0, q_pad), constant_values=1)
    sizes_i32 = db_sizes.astype(jnp.int32).reshape(n_bt // bt, 1, bt)
    qs_b = jnp.broadcast_to(
        jnp.maximum(q_sizes.astype(jnp.int32), 1)[:, None],
        (q_sigs.shape[0], 128),
    )
    ids, sc, cnt = pk.topk_scan_pallas(
        db_sigs, q_sigs, jnp.int32(n_bt),  # padding rows carry size 0
        jnp.asarray(cutoff, jnp.float32), k,
        db_sizes_i32=sizes_i32, q_sizes_b=qs_b, use_sizes=True,
        interpret=SCORE_KERNEL_INTERPRET,
    )
    return ids[:q], sc[:q], cnt[:q]


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def containment_scan(db_sigs, db_sizes, q_sigs, q_sizes, cutoff, k: int,
                     tile: int = 8192):
    """Exact containment-threshold scan: score EVERY stored signature.

    The containment-index analogue of :func:`topk_scan`'s threshold
    mode. Containment of query A in stored set B is estimated from the
    MinHash Jaccard estimate plus the EXACT set sizes the ensemble is
    given anyway (reference entries are ``(key, minhash, size)``,
    ``/root/reference/datasketch/lshensemble.py:189``):

        ``|A ∩ B| = J/(1+J)·(|A|+|B|)``  ⇒  ``c = J·(x+q) / ((1+J)·q)``

    On TPU this replaces partitioned band probing wholesale: one
    streamed pass over the stacked table (sequential HBM reads, Mosaic
    compare+mean scorer) instead of ``parts × b × cap`` random gathers —
    and precision comes from thresholding the containment estimate
    itself rather than from banding collision statistics.

    Args:
        db_sigs: uint32[N_pad, P] stacked signatures.
        db_sizes: int32[N_pad] exact set sizes; <= 0 marks padding rows.
        q_sigs: uint32[Q, P] queries; q_sizes: int32[Q] query set sizes.
        cutoff: containment threshold (traced scalar, no recompiles).
        k: max results per query (top-k by estimated containment).
        tile: db rows scored per scan step (bounds peak memory).

    Returns:
        (ids int32[Q, k], containment float32[Q, k], n_match int32[Q]);
        slots below the cutoff are -1 / -1.0. ``n_match`` counts ALL
        rows >= cutoff, so truncation (n_match > k) is caller-visible.
    """
    n_pad, p = db_sigs.shape
    q = q_sigs.shape[0]
    from datasketch_tpu.ops import pallas_kernels as pk

    if (
        p % 128 == 0
        and k <= pk._TOPK_MAX_K
        and (pk.signature_kernel_available() or SCORE_KERNEL_INTERPRET)
    ):
        # Fused Mosaic scan (same kernel as topk_scan's branch, sizes
        # mode): the running top-k lives in VMEM across db tiles — no
        # [Q, tile] containment matrix and no [Q, k + tile] lax.top_k
        # per tile. Measured 64ms -> ~13ms per 256-query batch over 32k
        # rows on v5e (the per-tile top_k at k=2048 dominated the scan
        # form; serving callers keep k <= 128 and escalate on overflow).
        return _containment_scan_fused(
            db_sigs, db_sizes, q_sigs, q_sizes, cutoff, k
        )
    tile = min(tile, n_pad)
    n_tiles = -(-n_pad // tile)
    pad_rows = n_tiles * tile - n_pad
    if pad_rows:
        db_sigs = jnp.pad(db_sigs, ((0, pad_rows), (0, 0)))
        db_sizes = jnp.pad(db_sizes, (0, pad_rows))
    use_pallas = _score_kernel_ok(p) and tile % pk.SCORE_BT == 0
    q_pad = ((-q) % pk.SCORE_BQ) if use_pallas else 0
    if q_pad:
        q_sigs = jnp.pad(q_sigs, ((0, q_pad), (0, 0)))
        q_sizes = jnp.pad(q_sizes, (0, q_pad), constant_values=1)
    q_run = q + q_pad
    qf = jnp.maximum(q_sizes.astype(jnp.float32), 1.0)[:, None]  # [Q, 1]
    cut = jnp.asarray(cutoff, jnp.float32)
    base = jnp.arange(tile, dtype=jnp.int32)
    k_eff = min(k, tile)

    def body(carry, inp):
        c_sc, c_ids, c_cnt = carry
        db_tile, size_tile, t_idx = inp
        ids = base + t_idx * tile
        if use_pallas:
            eq = pk.score_matrix_pallas(
                q_sigs, db_tile, interpret=SCORE_KERNEL_INTERPRET
            )  # [Q, tile] estimated Jaccard
        else:
            eq = (db_tile[None, :, :] == q_sigs[:, None, :]).mean(
                axis=-1, dtype=jnp.float32
            )
        x = size_tile.astype(jnp.float32)[None, :]  # [1, tile]
        cont = eq * (x + qf) / ((1.0 + eq) * qf)
        cont = jnp.where(size_tile[None, :] > 0, cont, -1.0)
        c_cnt = c_cnt + (cont >= cut).sum(axis=1, dtype=jnp.int32)
        sc = jnp.concatenate([c_sc, cont], axis=1)
        idc = jnp.concatenate(
            [c_ids, jnp.broadcast_to(ids[None, :], (q_run, tile))], axis=1
        )
        top_sc, pos = jax.lax.top_k(sc, k_eff)
        top_ids = jnp.take_along_axis(idc, pos, axis=1)
        return (top_sc, top_ids, c_cnt), None

    # carry init derived from the inputs (varying-type under shard_map;
    # folds to constants under plain jit — see topk_scan)
    zero = (
        (db_sigs[:1, :1] & jnp.uint32(0)) | (q_sigs[:1, :1] & jnp.uint32(0))
    ).astype(jnp.float32)
    init = (
        jnp.broadcast_to(zero, (q_run, k_eff)) - 1.0,
        jnp.broadcast_to(zero.astype(jnp.int32), (q_run, k_eff)) - 1,
        jnp.broadcast_to(zero.astype(jnp.int32)[:, 0], (q_run,)),
    )
    xs = (
        db_sigs.reshape(n_tiles, tile, p),
        db_sizes.reshape(n_tiles, tile),
        jnp.arange(n_tiles, dtype=jnp.int32),
    )
    (sc, ids, cnt), _ = jax.lax.scan(body, init, xs)
    ids = jnp.where(sc >= cut, ids, -1)
    sc = jnp.where(sc >= cut, sc, -1.0)
    if q_pad:
        ids, sc, cnt = ids[:q], sc[:q], cnt[:q]
    if k_eff < k:
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        sc = jnp.pad(sc, ((0, 0), (0, k - k_eff)), constant_values=-1.0)
    return ids, sc, cnt


@functools.partial(
    jax.jit, static_argnames=("b", "r", "cap", "max_out")
)
def query_candidates_fused(sorted_fp, sorted_ids, q_sigs, b: int, r: int,
                           cap: int, max_out: int, n_valid=None):
    """Candidates-only threshold query in ONE dispatch (no rerank).

    The ``rerank=False`` twin of :func:`query_fused` — reference
    candidate semantics (``lsh.py:370-432`` returns the raw band-bucket
    union): fingerprints -> band probes -> dedupe + compaction
    (:func:`unique_compact`), never touching the signature table.

    Returns (sel_ids int32[Q, max_out], n_match int32[Q],
    truncated int32[]).
    """
    q_fps = band_fingerprints(q_sigs, b, r)
    ids, trunc = query_tables(sorted_fp, sorted_ids, q_fps, cap=cap)
    flat = ids.reshape(q_sigs.shape[0], -1)
    if n_valid is not None:
        flat = jnp.where(flat < n_valid, flat, -1)
    sel_ids, n_match = unique_compact(flat, max_out)
    return sel_ids, n_match, trunc


@functools.partial(
    jax.jit, static_argnames=("b", "r", "cap", "max_out", "n_buckets")
)
def query_fused(sorted_fp, sorted_ids, db_sigs, q_sigs, b: int, r: int,
                cap: int, cutoff, max_out: int, offsets=None,
                n_buckets: int = 0, n_valid=None):
    """Whole THRESHOLD query pipeline in ONE dispatch.

    fingerprints -> band probes -> Jaccard rerank -> dedupe + cutoff
    filter + score-ordered compaction (:func:`threshold_select`). The
    threshold twin of :func:`topk_fused`: at serving scale each separate
    dispatch costs a host<->device round trip. ``cutoff`` is traced (no
    recompile per threshold); pass -1.0 to keep all candidates.

    Returns (sel_ids int32[Q, max_out], sel_sc float32[Q, max_out],
    n_match int32[Q], truncated int32[]).
    """
    q_fps = band_fingerprints(q_sigs, b, r)
    if offsets is not None:
        ids, trunc = query_tables_direct(
            sorted_fp, sorted_ids, offsets, q_fps, cap, n_buckets
        )
    else:
        ids, trunc = query_tables(sorted_fp, sorted_ids, q_fps, cap=cap)
    flat = ids.reshape(q_sigs.shape[0], -1)
    if n_valid is not None:
        flat = jnp.where(flat < n_valid, flat, -1)
    scores = rerank_jaccard(db_sigs, q_sigs, flat)
    sel_ids, sel_sc, n_match = threshold_select(scores, flat, cutoff, max_out)
    return sel_ids, sel_sc, n_match, trunc


@functools.partial(
    jax.jit, static_argnames=("b", "r", "cap", "k", "n_buckets")
)
def topk_fused(sorted_fp, sorted_ids, db_sigs, q_sigs, b: int, r: int,
               cap: int, k: int, offsets=None, n_buckets: int = 0,
               n_valid=None):
    """Whole top-k query pipeline in ONE dispatch.

    fingerprints -> band probes (direct-addressed when ``offsets`` given,
    binary search otherwise) -> Jaccard rerank -> dedupe top-k; at serving
    scale each separate dispatch costs a host<->device round trip, which
    dominates for sub-100ms batches.
    """
    q_fps = band_fingerprints(q_sigs, b, r)
    if offsets is not None:
        ids, trunc = query_tables_direct(
            sorted_fp, sorted_ids, offsets, q_fps, cap, n_buckets
        )
    else:
        ids, trunc = query_tables(sorted_fp, sorted_ids, q_fps, cap=cap)
    flat = ids.reshape(q_sigs.shape[0], -1)
    if n_valid is not None:
        # tables may be padded to a power-of-two row count (bounds the set
        # of XLA compile shapes); padded ids are masked out here
        flat = jnp.where(flat < n_valid, flat, -1)
    scores = rerank_jaccard(db_sigs, q_sigs, flat)
    top_ids, top_sc = topk_candidates(scores, flat, k, max_dup=b)
    return top_ids, top_sc, trunc

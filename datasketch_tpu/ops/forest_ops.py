"""Device-resident LSH Forest (functional core).

The reference forest (``/root/reference/datasketch/lshforest.py:30-44,74-128``)
keeps, per tree, a sorted list of byte-string keys and binary-searches an
r-byte prefix per query, descending r = k..1 until enough results. On TPU
that becomes:

- per tree, a CUMULATIVE fingerprint per prefix length: ``fp[lev] =
  fmix32 fold of the first lev+1 signature slots`` — prefix equality
  becomes uint32 equality per level (a 2^-32 collision only adds rerank
  work, it never loses a true match),
- one lexicographic multi-key device sort per tree over the k fingerprint
  levels: rows sharing a prefix of ANY length form a contiguous run,
- query = per-level run NARROWING (two bounded binary searches per level,
  all queries vectorized) + bounded gather per level + one fused
  level-weighted Jaccard top-k. The reference's "stop descending once k
  results" becomes a score ordering: a level-``r`` match strictly outranks
  any level-``r-1`` match, ties broken by estimated Jaccard.

Everything is static-shape and one ``jit`` dispatch end to end
(:func:`forest_query_fused`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from datasketch_tpu.ops.hashing import mix32
from datasketch_tpu.ops.lsh_ops import rerank_jaccard

__all__ = [
    "prefix_fingerprints",
    "build_forest",
    "build_forest_host",
    "query_forest",
    "forest_topk",
    "forest_query_fused",
]

_FP_SEED = 0x85EBCA6B


@functools.partial(jax.jit, static_argnames=("l", "k"))
def prefix_fingerprints(sigs, l: int, k: int):
    """Cumulative per-prefix fingerprints: uint32[N, P] -> uint32[l, k, N].

    ``out[tree, lev, i]`` hashes row i's slots ``[tree*k : tree*k+lev+1]``;
    equal prefixes => equal fingerprints at every level up to their length.
    """
    n = sigs.shape[0]
    trees = sigs[:, : l * k].reshape(n, l, k)
    h = jnp.full((n, l), _FP_SEED, dtype=jnp.uint32)
    levels = []
    for lev in range(k):
        h = mix32(h ^ trees[:, :, lev])
        levels.append(h)
    return jnp.stack(levels, axis=0).transpose(2, 0, 1)  # [l, k, N]


@jax.jit
def build_forest(fps):
    """Lexicographic sort per tree: [l, k, N] -> ([l, k, N], [l, N]).

    After the multi-key sort, the rows matching a query prefix of length
    r are contiguous for EVERY r (the prefix-tree property the reference
    gets from sorted byte strings), and each fingerprint level is
    nondecreasing within its parent run — which is what the bounded
    binary searches in :func:`query_forest` rely on.
    """
    l, k, n = fps.shape
    ids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (l, n))

    def per_tree(f, i):
        out = jax.lax.sort(tuple(f[lev] for lev in range(k)) + (i,), num_keys=k)
        return jnp.stack(out[:-1]), out[-1]

    return jax.vmap(per_tree)(fps, ids)


def _mix32_np(x):
    """Host twin of :func:`datasketch_tpu.ops.hashing.mix32` (bit-exact)."""
    import numpy as np

    x = x.astype(np.uint32)
    x ^= x >> np.uint32(16)
    x *= np.uint32(0x85EBCA6B)
    x ^= x >> np.uint32(13)
    x *= np.uint32(0xC2B2AE35)
    x ^= x >> np.uint32(16)
    return x


def build_forest_host(sigs, l: int, k: int):
    """Host-side forest build: fingerprints + per-tree ``np.lexsort``.

    Bit-identical to ``build_forest(prefix_fingerprints(sigs, l, k))``
    (both sorts are stable) but runs in milliseconds on the host, where
    the XLA multi-key sort was measured to take MINUTES to compile
    through the remote-TPU tunnel. The facade uploads the result once.

    Returns numpy ``(sorted_fps uint32[l, k, N], sorted_ids int32[l, N])``.
    """
    import numpy as np

    sigs = np.asarray(sigs, dtype=np.uint32)
    n = sigs.shape[0]
    trees = sigs[:, : l * k].reshape(n, l, k)
    fps = np.empty((l, k, n), np.uint32)
    h = np.full((n, l), _FP_SEED, np.uint32)
    for lev in range(k):
        h = _mix32_np(h ^ trees[:, :, lev])
        fps[:, lev, :] = h.T
    sorted_fps = np.empty_like(fps)
    sorted_ids = np.empty((l, n), np.int32)
    for t in range(l):
        order = np.lexsort(fps[t][::-1])  # lexsort's LAST key is primary
        sorted_ids[t] = order.astype(np.int32)
        sorted_fps[t] = fps[t][:, order]
    return sorted_fps, sorted_ids


def _run_bounds(row, q, lo, hi):
    """Left/right bounds of value `q` inside the sorted window [lo, hi).

    Vectorized over queries; both searches advance in lockstep inside one
    ``fori_loop`` (the step count is static in the row length).
    """
    steps = int(row.shape[0]).bit_length() + 1
    last = row.shape[0] - 1

    def probe(plo, phi, inclusive):
        active = plo < phi
        mid = (plo + phi) >> 1
        v = row[jnp.clip(mid, 0, last)]
        descend_right = (v <= q) if inclusive else (v < q)
        nlo = jnp.where(descend_right, mid + 1, plo)
        nhi = jnp.where(descend_right, phi, mid)
        return jnp.where(active, nlo, plo), jnp.where(active, nhi, phi)

    def body(_, st):
        llo, lhi, rlo, rhi = st
        llo, lhi = probe(llo, lhi, False)
        rlo, rhi = probe(rlo, rhi, True)
        return llo, lhi, rlo, rhi

    llo, _, rlo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi, lo, hi))
    return llo, rlo


@functools.partial(jax.jit, static_argnames=("cap",))
def query_forest(sorted_fps, sorted_ids, q_fps, cap: int):
    """Prefix-run candidates at every level for a query batch.

    Args:
        sorted_fps: uint32[l, k, N] built forest.
        sorted_ids: int32[l, N].
        q_fps: uint32[l, k, Q] query prefix fingerprints.
        cap: max rows gathered per (query, tree, level) run.

    Returns:
        ids: int32[Q, k, l*cap], level axis ascending by prefix length
            (index lev = prefix of lev+1 slots); -1 where invalid.
        truncated: int32[] rows dropped by the cap, summed over levels
            (an upper bound — parent runs contain their children).
    """
    l, k, n = sorted_fps.shape
    nq = q_fps.shape[2]

    def per_tree(fps_tree, ids_tree, q_tree):
        lo = jnp.zeros((nq,), jnp.int32)
        hi = jnp.full((nq,), n, jnp.int32)
        per_level, truncs = [], []
        for lev in range(k):
            lo, hi = _run_bounds(fps_tree[lev], q_tree[lev], lo, hi)
            pos = lo[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :]
            valid = pos < hi[:, None]
            ids = jnp.where(valid, ids_tree[jnp.where(valid, pos, 0)], -1)
            per_level.append(ids)
            truncs.append(jnp.sum(jnp.maximum(hi - lo - cap, 0)))
        return jnp.stack(per_level, axis=1), sum(truncs)  # [Q, k, cap], []

    ids, trunc = jax.vmap(per_tree)(sorted_fps, sorted_ids, q_fps)
    ids = jnp.transpose(ids, (1, 2, 0, 3)).reshape(nq, k, l * cap)
    return ids, jnp.sum(trunc)


@functools.partial(jax.jit, static_argnames=("k_out", "pool", "rank"))
def forest_topk(db_sigs, q_sigs, level_ids, k_out: int, n_valid=None,
                pool: int = 0, rank: str = "forest"):
    """Level-weighted dedupe + top-k over per-level candidates.

    With ``rank='forest'`` the key is (longest matching prefix, estimated
    Jaccard): a match at prefix length r scores ``2*r + jaccard``, so
    deeper matches always win — the device analogue of the reference's
    descend-until-k loop. ``rank='jaccard'`` orders the SAME candidate
    pool purely by estimated Jaccard — the post-query rerank the
    reference docs tell users to add by hand
    (``/root/reference/datasketch/lshforest.py`` returns unranked keys;
    rerank guidance at ``/root/reference/datasketch/lsh.py:374-378``).
    Prefix depth is a noisy Jaccard proxy, so for recall-vs-exact-top-k
    'jaccard' is strictly better at equal candidates; 'forest' is kept
    for reference-semantics parity.

    Runs in two phases so the expensive signature gather touches only a
    small pool: (1) integer-only dedupe keeping each id's deepest match,
    top-``pool`` by depth; (2) Jaccard rerank of the pool. Candidates are
    massively duplicated across nested prefix levels, so phase 1 shrinks
    the rerank by ~two orders of magnitude.

    Args:
        pool: rerank pool size (static); 0 means ``max(32, 4*k_out)``
            for rank='forest' and ``max(256, 8*k_out)`` for
            rank='jaccard' (pure-Jaccard ordering profits from a wider
            net — depth picked the pool, so widening it costs only
            rerank gathers).
    Returns:
        (ids int32[Q, k_out], jaccard float32[Q, k_out],
         level int32[Q, k_out] — matched prefix length, 0 if slot empty).
    """
    if rank not in ("forest", "jaccard"):
        raise ValueError("rank must be 'forest' or 'jaccard'")
    nq, klev, c = level_ids.shape
    flat = level_ids.reshape(nq, klev * c)
    if n_valid is not None:
        flat = jnp.where(flat < n_valid, flat, -1)
    length = 1 + jax.lax.broadcasted_iota(jnp.int32, (nq, klev * c), 1) // c
    length = jnp.where(flat >= 0, length, 0)

    # Phase 1: per id keep its deepest match — sort rows by (id, -depth),
    # the first slot of each id-run is its maximum; then pool the deepest.
    ids_s, neglen_s = jax.lax.sort((flat, -length), num_keys=2)
    prev = jnp.concatenate(
        [jnp.full((nq, 1), -2, dtype=ids_s.dtype), ids_s[:, :-1]], axis=1
    )
    best = (ids_s != prev) & (ids_s >= 0)
    depth = jnp.where(best, -neglen_s, -1)
    if not pool:
        # 'jaccard' profits from a wide net: recall saturates by ~256 on
        # the clustered-set protocol (pool sweep in BASELINE.md round 4)
        pool = max(32, 4 * k_out) if rank == "forest" else max(256, 8 * k_out)
    pool = min(pool, depth.shape[1])
    pool_depth, pos = jax.lax.top_k(depth, pool)
    pool_ids = jnp.where(
        pool_depth >= 1, jnp.take_along_axis(ids_s, pos, axis=1), -1
    )

    # Phase 2: rerank the pooled survivors only.
    jac = rerank_jaccard(db_sigs, q_sigs, pool_ids)
    if rank == "forest":
        score = jnp.where(
            pool_ids >= 0, 2.0 * pool_depth.astype(jnp.float32) + jac, -1.0
        )
    else:
        score = jnp.where(pool_ids >= 0, jac, -1.0)
    k_eff = min(k_out, score.shape[1])
    top_sc, pos2 = jax.lax.top_k(score, k_eff)
    hit = top_sc >= 0
    top_ids = jnp.where(hit, jnp.take_along_axis(pool_ids, pos2, axis=1), -1)
    top_jac = jnp.where(hit, jnp.take_along_axis(jac, pos2, axis=1), -1.0)
    top_len = jnp.where(
        hit, jnp.take_along_axis(pool_depth, pos2, axis=1), 0
    )
    if k_eff < k_out:
        pad = k_out - k_eff
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=-1)
        top_jac = jnp.pad(top_jac, ((0, 0), (0, pad)), constant_values=-1.0)
        top_len = jnp.pad(top_len, ((0, 0), (0, pad)))
    return top_ids, top_jac, top_len


@functools.partial(
    jax.jit, static_argnames=("l", "k_prefix", "cap", "k_out", "pool", "rank")
)
def forest_query_fused(sorted_fps, sorted_ids, db_sigs, q_sigs, l: int,
                       k_prefix: int, cap: int, k_out: int, n_valid=None,
                       pool: int = 0, rank: str = "forest"):
    """Whole forest query in ONE dispatch: query fingerprints -> per-level
    run narrowing -> gather -> level-weighted Jaccard top-k (``rank`` as
    in :func:`forest_topk`)."""
    q_fps = prefix_fingerprints(q_sigs, l, k_prefix)
    level_ids, trunc = query_forest(sorted_fps, sorted_ids, q_fps, cap)
    top_ids, top_jac, top_len = forest_topk(
        db_sigs, q_sigs, level_ids, k_out, n_valid, pool=pool, rank=rank
    )
    return top_ids, top_jac, top_len, trunc

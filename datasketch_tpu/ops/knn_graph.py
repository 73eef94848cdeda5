"""Device-built ANN graph: tiled exact kNN adjacency + NSW beam search.

The host HNSW insert loop (``models/hnsw.py``, parity path) is inherently
sequential — ~16ms/doc in Python. This module builds the graph ON DEVICE
instead: a ``lax.scan`` over row tiles computes all-pairs distances and
keeps each node's k nearest (exact kNN graph), which the flat NSW beam
search of :mod:`datasketch_tpu.ops.hnsw_ops` then queries (no hierarchy —
entry points come from a random sample, which for kNN-graph methods
matches hierarchical descent in practice: cf. NSG / KGraph lines of work).

O(N^2 D) build compute is the trade: on TPU that's dense vectorized work
(seconds up to ~50k points) versus minutes of pointer-chasing Python.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from datasketch_tpu.ops.hnsw_ops import DeviceGraph, _distance_fn

__all__ = ["knn_adjacency", "build_nsw_graph"]


@functools.partial(jax.jit, static_argnames=("k", "tile", "dist"))
def _knn_rows(points, k: int, tile: int, dist):
    """Exact kNN ids for every row: [N, D] -> int32[N, k] (self excluded)."""
    n = points.shape[0]
    pad = (-n) % tile
    q = jnp.pad(points, ((0, pad), (0, 0)))
    nt = q.shape[0] // tile
    row_ids = jnp.arange(q.shape[0], dtype=jnp.int32).reshape(nt, tile)
    tiles = q.reshape(nt, tile, -1)

    def body(_, inp):
        qt, rid = inp  # [tile, D], [tile]
        d = dist(qt, points[None, :, :])  # broadcast -> [tile, N]
        d = jnp.where(
            jnp.arange(n, dtype=jnp.int32)[None, :] == rid[:, None],
            jnp.float32(3.4e38),
            d,
        )
        _, idx = jax.lax.top_k(-d, k)
        return None, idx.astype(jnp.int32)

    _, out = jax.lax.scan(body, None, (tiles, row_ids))
    return out.reshape(-1, k)[:n]


def knn_adjacency(points, k: int = 16, metric="l2", tile: int = 256):
    """Exact kNN graph adjacency int32[N, k] (directed, self excluded)."""
    dist = _distance_fn(metric)
    return _knn_rows(jnp.asarray(points), k, tile, dist)


@functools.partial(jax.jit, static_argnames=("m", "tile", "dist"))
def _prune_diverse(points, cand_ids, m: int, tile: int, dist):
    """hnswlib-style heuristic pruning, vectorized over nodes.

    From each node's distance-sorted candidates keep c only if
    ``d(node, c) <= min_u d(c, u)`` over already-kept u — the diversity
    rule that makes graphs *navigable* (raw kNN graphs strand greedy
    search in mutual-neighbor clusters). Tie-tolerant (<=, not hnswlib's
    strict <): metrics with pervasive ties degrade to the kNN graph
    instead of pruning everything. Returns int32[N, m], -1 padded.
    """
    n, kc = cand_ids.shape
    pad = (-n) % tile
    ids_p = jnp.pad(cand_ids, ((0, pad), (0, 0)))
    pts_p = jnp.pad(points, ((0, pad), (0, 0)))
    nt = ids_p.shape[0] // tile

    def body(_, inp):
        node_pts, cids = inp  # [tile, D], [tile, kc]
        cpts = points[cids]  # [tile, kc, D]
        d_node = dist(node_pts, cpts)  # [tile, kc] ascending already
        # candidate-candidate distances [tile, kc, kc]:
        # dist broadcasts q[..., None, :] against pts, so [tile, kc, 1, D]
        # vs [tile, 1, kc, D]
        cc = dist(cpts, cpts[:, None, :, :])
        big = jnp.float32(3.4e38)

        def step(state, j):
            kept_mask, kept_count = state  # [tile, kc], [tile]
            # min distance from candidate j to any kept candidate; <= (not
            # hnswlib's strict <) so metrics with pervasive ties — e.g.
            # equality-count Jaccard, where random pairs all sit at exactly
            # 1.0 — degrade to the kNN graph instead of pruning everything
            dj = jnp.where(kept_mask, cc[:, j, :], big).min(axis=-1)
            ok = (d_node[:, j] <= dj) & (kept_count < m)
            kept_mask = kept_mask.at[:, j].set(ok)
            return (kept_mask, kept_count + ok.astype(jnp.int32)), None

        (kept, _), _ = jax.lax.scan(
            step,
            (jnp.zeros((node_pts.shape[0], kc), bool),
             jnp.zeros((node_pts.shape[0],), jnp.int32)),
            jnp.arange(kc),
        )
        # compact kept ids to the front, -1 pad, take first m
        order = jnp.argsort(~kept, axis=1, stable=True)  # kept first
        sel = jnp.take_along_axis(cids, order, axis=1)[:, :m]
        selk = jnp.take_along_axis(kept, order, axis=1)[:, :m]
        return None, jnp.where(selk, sel, -1)

    _, out = jax.lax.scan(
        body, None, (pts_p.reshape(nt, tile, -1), ids_p.reshape(nt, tile, kc))
    )
    return out.reshape(-1, m)[:n]


def build_nsw_graph(points, keys=None, m: int = 16, metric="l2",
                    tile: int = 256, level_ratio: int = 8,
                    seed: int = 7) -> DeviceGraph:
    """Device-built hierarchical NSW index queryable by
    :func:`datasketch_tpu.ops.hnsw_ops.batch_query`.

    Base layer: exact m-NN graph augmented with reverse edges (union,
    capped at 2m per node). Upper levels (HNSW's long-range routing):
    random subsets shrinking by ``level_ratio``, each with its own exact
    kNN adjacency among subset members — a flat kNN graph alone strands
    the beam in the entry's neighborhood.
    """
    points = jnp.asarray(points)
    n = points.shape[0]
    if n == 0:
        raise ValueError("cannot build a graph over zero points")
    if n == 1:
        # degenerate but legal (first add() before any other): a single
        # node with no edges — k=0 top_k/reshape would divide by zero
        return DeviceGraph(
            points=points,
            adj0=jnp.full((1, 2 * m), -1, dtype=jnp.int32),
            upper_nodes=[],
            upper_adj=[],
            entry=0,
            keys=list(keys) if keys is not None else [0],
            deleted=jnp.zeros((1,), dtype=bool),
        )
    dist = _distance_fn(metric)
    # 3m nearest candidates, then diversity-prune to m navigable edges
    kc = min(3 * m, n - 1)
    cands = knn_adjacency(points, k=kc, metric=metric, tile=tile)
    adj = np.asarray(_prune_diverse(points, cands, m, tile, dist))

    # symmetrize (vectorized — this host has one core; a Python loop over
    # N*m edges costs seconds at 50k points): append src as a reverse edge
    # of dst unless the forward edge already exists, capped at 2m per node
    deg_cap = 2 * m
    full = np.full((n, deg_cap), -1, dtype=np.int32)
    full[:, : adj.shape[1]] = adj
    fill = (adj >= 0).sum(axis=1).astype(np.int64)
    src = np.repeat(np.arange(n, dtype=np.int32), adj.shape[1])
    dst = adj.ravel()
    ok = dst >= 0
    src, dst = src[ok], dst[ok]
    # drop pairs where dst already points back at src
    already = (adj[dst] == src[:, None]).any(axis=1)
    src, dst = src[~already], dst[~already]
    # stable group by dst; rank within group = arange - first occurrence
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    first = np.searchsorted(dst, dst, side="left")
    rank = np.arange(dst.shape[0]) - first
    slot = fill[dst] + rank
    keep = slot < deg_cap
    full[dst[keep], slot[keep]] = src[keep]

    # Upper levels: NESTED random subsets (one shared permutation), kNN
    # within each on device. Nesting preserves the HNSW invariant the
    # descent relies on: every level-l node exists in all lower levels, so
    # per-query entries always resolve by searchsorted.
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    upper = []  # built bottom-up, reversed at the end (top first)
    size = n // level_ratio
    while size > max(2 * m, 8):
        subset = np.sort(perm[:size]).astype(np.int32)
        sub_pts = points[jnp.asarray(subset)]
        sub_cands = knn_adjacency(
            sub_pts, k=min(3 * m, size - 1), metric=metric, tile=tile
        )
        sub_adj = np.asarray(
            _prune_diverse(sub_pts, sub_cands, min(m, size - 1), tile, dist)
        )
        upper.append((jnp.asarray(subset), jnp.asarray(sub_adj)))
        size //= level_ratio

    # entry must belong to the top (smallest) level
    entry = int(np.asarray(upper[-1][0])[0]) if upper else 0
    upper = list(reversed(upper))  # top (smallest) level first
    return DeviceGraph(
        points=points,
        adj0=jnp.asarray(full),
        upper_nodes=[u for u, _ in upper],
        upper_adj=[a for _, a in upper],
        entry=entry,
        keys=list(keys) if keys is not None else list(range(n)),
        deleted=jnp.zeros((n,), dtype=bool),
    )


@functools.partial(jax.jit, static_argnames=("m", "tile", "dist"))
def prune_candidates(node_pts, cand_ids, all_pts, m: int, dist,
                     tile: int = 128):
    """Diversity-prune candidates whose points live in a SEPARATE gather
    array — the incremental-insert twin of :func:`_prune_diverse`.

    Serves both halves of ``TpuHNSW`` appends (VERDICT round 3 #4):
    forward edges for new nodes (``node_pts`` = the new points,
    ``cand_ids`` = frozen-graph beam results) and re-pruning overflowed
    rows (``node_pts`` = the touched nodes, ``cand_ids`` = old neighbors
    + newcomers). Unlike ``_prune_diverse``, candidates need not arrive
    distance-sorted (they are sorted here) and ``-1`` ids are ignored.

    Args:
        node_pts: [R, D] the rows being (re)linked.
        cand_ids: int32[R, C] candidate ids into ``all_pts``, -1 invalid.
        all_pts: [N, D] gather source.
        m: max edges kept per row.
    Returns:
        int32[R, m] kept ids (diverse, distance-ascending), -1 padded.
    """
    r, c = cand_ids.shape
    pad = (-r) % tile
    node_p = jnp.pad(node_pts, ((0, pad), (0, 0)))
    ids_p = jnp.pad(cand_ids, ((0, pad), (0, 0)), constant_values=-1)
    nt = node_p.shape[0] // tile
    big = jnp.float32(3.4e38)

    def body(_, inp):
        npts, cids = inp  # [tile, D], [tile, C]
        safe = jnp.where(cids >= 0, cids, 0)
        cpts = all_pts[safe]  # [tile, C, D]
        d_node = jnp.where(cids >= 0, dist(npts, cpts), big)
        order = jnp.argsort(d_node, axis=1)
        cids = jnp.take_along_axis(cids, order, axis=1)
        d_node = jnp.take_along_axis(d_node, order, axis=1)
        cpts = jnp.take_along_axis(cpts, order[..., None], axis=1)
        cc = dist(cpts, cpts[:, None, :, :])  # [tile, C, C]

        def step(state, j):
            kept_mask, kept_count = state
            dj = jnp.where(kept_mask, cc[:, j, :], big).min(axis=-1)
            ok = (
                (d_node[:, j] < big)
                & (d_node[:, j] <= dj)
                & (kept_count < m)
            )
            kept_mask = kept_mask.at[:, j].set(ok)
            return (kept_mask, kept_count + ok.astype(jnp.int32)), None

        (kept, _), _ = jax.lax.scan(
            step,
            (jnp.zeros((npts.shape[0], c), bool),
             jnp.zeros((npts.shape[0],), jnp.int32)),
            jnp.arange(c),
        )
        order2 = jnp.argsort(~kept, axis=1, stable=True)  # kept first
        sel = jnp.take_along_axis(cids, order2, axis=1)[:, :m]
        selk = jnp.take_along_axis(kept, order2, axis=1)[:, :m]
        return None, jnp.where(selk, sel, -1)

    _, out = jax.lax.scan(
        body, None,
        (node_p.reshape(nt, tile, -1), ids_p.reshape(nt, tile, c)),
    )
    return out.reshape(-1, m)[:r]

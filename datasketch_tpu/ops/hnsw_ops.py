"""On-chip batched HNSW query over padded adjacency arrays.

The reference HNSW query walks Python dicts and heaps edge-by-edge
(``/root/reference/datasketch/hnsw.py:605-780``). The TPU re-expression
(SURVEY.md §7.6): the graph is exported once to padded device arrays —
points ``[N, D]``, base-layer adjacency ``int32[N, deg]`` (-1 padded), and
compact per-upper-level ``(nodes, adj)`` pairs — and queries run as a
*batch*: greedy descent through upper levels with ``lax.while_loop``, then
a fixed-iteration masked beam search at the base layer where every
iteration expands each query's best unexpanded beam entry and evaluates
all its neighbors in one vectorized distance call.

Differences vs the host algorithm: the device beam search has no global
visited set (a beam-duplicate mask stands in; re-expansions are bounded by
the iteration count), so candidate ordering can differ — recall is
empirically equal at the same ``ef`` (tests/test_hnsw_ops.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable, Union

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["DeviceGraph", "export_graph", "batch_query"]

# Host-side constant ON PURPOSE: a module-level jnp scalar would initialize
# the device backend at import time (through a remote tunnel, `import
# datasketch_tpu` would then hang whenever the device is wedged).
_BIG = np.float32(3.4e38)


@functools.lru_cache(maxsize=16)
def _distance_fn(metric: Union[str, Callable]):
    """Resolve a metric name to a jittable fn (cached: a fresh lambda per
    call would defeat the jit cache via the static `dist` argument)."""
    if callable(metric):
        return metric
    if metric == "l2":
        return lambda q, pts: jnp.sqrt(
            jnp.sum((pts - q[..., None, :]) ** 2, axis=-1)
        )
    if metric == "cosine":

        def cos(q, pts):
            qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
            pn = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
            return 1.0 - jnp.sum(pn * qn[..., None, :], axis=-1)

        return cos
    if metric == "minhash_jaccard":
        # 1 - fraction of equal signature slots (hnsw.py test metric;
        # MinHash-Jaccard distance of docs/lsh.rst).
        return lambda q, pts: 1.0 - (pts == q[..., None, :]).mean(
            axis=-1, dtype=jnp.float32
        )
    raise ValueError("unknown metric: %r" % (metric,))


@dataclass
class DeviceGraph:
    """HNSW graph exported to device arrays (query-only snapshot).

    Device form of the dict-graph layers of
    ``/root/reference/datasketch/hnsw.py:15-116`` (``_Layer``/``_Node``);
    ``deleted`` carries the soft-delete tombstones of ``hnsw.py:933-936``.
    """

    points: jax.Array  # [N, D]
    adj0: jax.Array  # int32[N, deg0], -1 padded
    upper_nodes: list  # per level (top..1): int32[n_l] sorted global ids
    upper_adj: list  # per level: int32[n_l, deg], LOCAL indices, -1 padded
    entry: int
    keys: list = field(default_factory=list)
    deleted: jax.Array = None  # bool[N] soft-delete tombstones

    @property
    def n(self) -> int:
        return self.points.shape[0]


def export_graph(index, dtype=None) -> DeviceGraph:
    """Snapshot a :class:`datasketch_tpu.models.hnsw.HNSW` for device query.

    Soft-deleted nodes keep their edges (they still route) but are exported
    so queries can mask them out; hard-removed nodes are absent already.
    """
    keys = [k for k in index._nodes.keys()]
    key_pos = {k: i for i, k in enumerate(keys)}
    pts = np.stack(
        [np.asarray(index._nodes[k].point) for k in keys]
    )
    if dtype is not None:
        pts = pts.astype(dtype)
    deleted = np.array(
        [index._nodes[k].is_deleted for k in keys], dtype=bool
    )

    graphs = index._graphs  # list of layers, 0 = base
    base = graphs[0]
    deg0 = max(2, max((len(base[k]) for k in base), default=2))
    adj0 = np.full((len(keys), deg0), -1, dtype=np.int32)
    for k in base:
        row = key_pos[k]
        for j, nb in enumerate(base[k]):
            adj0[row, j] = key_pos[nb]

    upper_nodes, upper_adj = [], []
    for layer in reversed(graphs[1:]):  # top level first
        nodes = np.array(sorted(key_pos[k] for k in layer), dtype=np.int32)
        local = {int(g): i for i, g in enumerate(nodes)}
        deg = max(2, max((len(layer[k]) for k in layer), default=2))
        adj = np.full((len(nodes), deg), -1, dtype=np.int32)
        for k in layer:
            li = local[key_pos[k]]
            for j, nb in enumerate(layer[k]):
                adj[li, j] = local[key_pos[nb]]
        upper_nodes.append(jnp.asarray(nodes))
        upper_adj.append(jnp.asarray(adj))

    return DeviceGraph(
        points=jnp.asarray(pts),
        adj0=jnp.asarray(adj0),
        upper_nodes=upper_nodes,
        upper_adj=upper_adj,
        entry=key_pos[index._entry_point],
        keys=keys,
        deleted=jnp.asarray(deleted),
    )


def _greedy_level(points, nodes, adj, entry_local, queries, dist):
    """ef=1 greedy descent on one compact level, batched over queries.

    Returns the GLOBAL id of the local minimum per query.
    """

    def cond(state):
        _, improved = state
        return jnp.any(improved)

    def body(state):
        (cur, cur_d), _ = state
        nbrs = adj[cur]  # [Q, deg] local
        valid = nbrs >= 0
        safe = jnp.where(valid, nbrs, 0)
        nb_pts = points[nodes[safe]]  # [Q, deg, D]
        d = dist(queries, nb_pts)  # [Q, deg]
        d = jnp.where(valid, d, _BIG)
        j = jnp.argmin(d, axis=-1)
        best_d = jnp.take_along_axis(d, j[:, None], axis=-1)[:, 0]
        best = jnp.take_along_axis(safe, j[:, None], axis=-1)[:, 0]
        better = best_d < cur_d
        return (
            (jnp.where(better, best, cur), jnp.where(better, best_d, cur_d)),
            better,
        )

    q = queries.shape[0]
    cur = entry_local.astype(jnp.int32)  # [Q] local indices
    cur_d = dist(queries, points[nodes[cur]][:, None, :])[:, 0]
    (cur, _), _ = jax.lax.while_loop(
        cond, body, ((cur, cur_d), jnp.ones((q,), bool))
    )
    return nodes[cur]


def _beam_search(points, adj0, deleted, entries, queries, dist, ef, iters):
    """Fixed-iteration masked beam search at the base layer.

    State per query: beam ids int32[ef] (-1 empty), dists float32[ef],
    expanded bool[ef]. Each iteration expands the best unexpanded entry.
    """
    q = queries.shape[0]
    deg = adj0.shape[1]

    ids0 = jnp.full((q, ef), -1, dtype=jnp.int32).at[:, 0].set(entries)
    d_entry = dist(queries, points[entries][:, None, :])[:, 0]
    dists0 = jnp.full((q, ef), _BIG).at[:, 0].set(d_entry)
    expanded0 = jnp.zeros((q, ef), dtype=bool)

    def body(state, _):
        ids, dists, expanded = state
        # best unexpanded beam slot per query
        cand_d = jnp.where(expanded | (ids < 0), _BIG, dists)
        slot = jnp.argmin(cand_d, axis=-1)  # [Q]
        has = jnp.take_along_axis(cand_d, slot[:, None], axis=-1)[:, 0] < _BIG
        node = jnp.take_along_axis(ids, slot[:, None], axis=-1)[:, 0]
        expanded = expanded.at[jnp.arange(q), slot].set(
            expanded[jnp.arange(q), slot] | has
        )

        nbrs = adj0[jnp.where(has, node, 0)]  # [Q, deg]
        valid = (nbrs >= 0) & has[:, None]
        safe = jnp.where(valid, nbrs, 0)
        nd = dist(queries, points[safe])  # [Q, deg]
        nd = jnp.where(valid, nd, _BIG)
        # beam-dedupe: drop neighbors already present
        dup = (safe[:, :, None] == ids[:, None, :]) & (ids[:, None, :] >= 0)
        nd = jnp.where(dup.any(axis=-1), _BIG, nd)

        # merge (beam + neighbors), keep best ef by distance
        all_ids = jnp.concatenate([ids, jnp.where(nd < _BIG, safe, -1)], axis=1)
        all_d = jnp.concatenate([dists, nd], axis=1)
        all_exp = jnp.concatenate(
            [expanded, jnp.zeros((q, deg), dtype=bool)], axis=1
        )
        order = jnp.argsort(all_d, axis=1)[:, :ef]
        ids = jnp.take_along_axis(all_ids, order, axis=1)
        dists = jnp.take_along_axis(all_d, order, axis=1)
        expanded = jnp.take_along_axis(all_exp, order, axis=1)
        return (ids, dists, expanded), None

    (ids, dists, _), _ = jax.lax.scan(
        body, (ids0, dists0, expanded0), None, length=iters
    )
    # mask tombstoned nodes out of results (they may still route)
    tomb = deleted[jnp.where(ids >= 0, ids, 0)] & (ids >= 0)
    dists = jnp.where(tomb, _BIG, dists)
    order = jnp.argsort(dists, axis=1)
    return (
        jnp.take_along_axis(jnp.where(tomb, -1, ids), order, axis=1),
        jnp.take_along_axis(dists, order, axis=1),
    )


@functools.partial(jax.jit, static_argnames=("dist", "k", "ef", "iters"))
def _query_jit(points, adj0, deleted, upper, entry, queries, dist, k, ef, iters):
    entries = jnp.full((queries.shape[0],), entry, dtype=jnp.int32)
    for nodes, adj in upper:
        # upper-level nodes exist in every lower level, so per-query global
        # entries always resolve to a local index via the sorted node list
        entry_local = jnp.searchsorted(nodes, entries).astype(jnp.int32)
        entries = _greedy_level(points, nodes, adj, entry_local, queries, dist)

    ids, dists = _beam_search(
        points, adj0, deleted, entries, queries, dist, ef, iters
    )
    return ids[:, :k], dists[:, :k]


def batch_query(graph: DeviceGraph, queries, k: int = 10, ef: int = 64,
                metric: Union[str, Callable] = "minhash_jaccard",
                iters: int = None):
    """Batched ANN query on the exported graph.

    Args:
        queries: [Q, D] array matching ``graph.points`` dtype semantics.
        ef: beam width; ``iters`` defaults to ``ef`` expansions.
    Returns:
        list (per query) of (key, distance) pairs, ascending distance.
    """
    dist = _distance_fn(metric)
    iters = ef if iters is None else iters
    q = jnp.asarray(queries)
    deleted = graph.deleted
    if deleted is None:
        deleted = jnp.zeros((graph.n,), dtype=bool)

    # Upper-level descent: run levels sequentially outside jit boundaries
    # is simpler, but we keep everything in one jit for dispatch economy.
    upper = tuple(zip(graph.upper_nodes, graph.upper_adj))
    ids, dists = _query_jit(
        graph.points,
        graph.adj0,
        deleted,
        upper,
        graph.entry,
        q,
        dist,
        k,
        ef,
        iters,
    )
    # one D2H round trip: separate fetches each pay a full tunnel RTT
    ids, dists = jax.device_get((ids, dists))
    out = []
    for row_ids, row_d in zip(ids, dists):
        out.append(
            [
                (graph.keys[int(i)], float(d))
                for i, d in zip(row_ids, row_d)
                if i >= 0 and d < 1e37
            ]
        )
    return out

"""HNSW — hierarchical navigable small world graph ANN index.

API parity with ``/root/reference/datasketch/hnsw.py:146`` (full
MutableMapping surface, soft/hard remove with graph repair, merge,
pickle/copy, optional reverse-edge layers), algorithm per Malkov & Yashunin
(arXiv:1603.09320) with hnswlib-style heuristic pruning.

TPU-era difference: every frontier expansion evaluates distances to ALL
unvisited neighbors in one call. Pass ``batch_distance_func(query,
points_matrix) -> dists`` (e.g. a jitted JAX kernel or vectorized NumPy)
to get SIMD/device evaluation; otherwise the scalar ``distance_func`` is
mapped. The fully on-chip batched-query path over padded adjacency lives in
:mod:`datasketch_tpu.ops.hnsw_ops`.
"""

from __future__ import annotations

import heapq
from collections import OrderedDict
from collections.abc import Mapping, MutableMapping
from typing import Callable, Hashable, Optional, Union

import numpy as np

__all__ = ["HNSW"]


class _Node:
    """An indexed point: key, vector, and a soft-delete tombstone."""

    __slots__ = ("key", "point", "is_deleted")

    def __init__(self, key, point, is_deleted=False):
        self.key = key
        self.point = point
        self.is_deleted = is_deleted

    def __eq__(self, other):
        return (
            self.key == other.key
            and np.array_equal(self.point, other.point)
            and self.is_deleted == other.is_deleted
        )

    def copy(self) -> "_Node":
        return _Node(self.key, self.point, self.is_deleted)

    def __repr__(self):
        return f"_Node({self.key!r}, deleted={self.is_deleted})"


class _Layer:
    """One graph level: key -> {neighbor: distance}."""

    def __init__(self, key: Hashable) -> None:
        self._graph: dict = {key: {}}

    def __contains__(self, key) -> bool:
        return key in self._graph

    def __getitem__(self, key) -> dict:
        return self._graph[key]

    def __setitem__(self, key, value: dict) -> None:
        self._graph[key] = value

    def __delitem__(self, key) -> None:
        del self._graph[key]

    def __eq__(self, other) -> bool:
        if not isinstance(other, _Layer):
            return False
        return self._graph == other._graph

    def __len__(self) -> int:
        return len(self._graph)

    def __iter__(self):
        return iter(self._graph)

    def copy(self) -> "_Layer":
        new = object.__new__(type(self))
        new._graph = {k: dict(v) for k, v in self._graph.items()}
        if isinstance(new, _LayerWithReversedEdges):
            new._reverse = {k: set(v) for k, v in getattr(self, "_reverse", {}).items()}
        return new

    def get_reverse_edges(self, key) -> set:
        """All nodes with an out-edge to `key` (linear scan here; the
        reverse-edge layer answers in O(1))."""
        return {n for n, nbrs in self._graph.items() if key in nbrs}


class _LayerWithReversedEdges(_Layer):
    """Layer that maintains reverse edges: O(1) hard-remove at the cost of
    extra memory and bookkeeping on every edge write."""

    def __init__(self, key: Hashable) -> None:
        self._graph = {key: {}}
        self._reverse: dict = {key: set()}

    def __setitem__(self, key, value: dict) -> None:
        old = self._graph.get(key, {})
        for n in old:
            if n not in value and n in self._reverse:
                self._reverse[n].discard(key)
        for n in value:
            self._reverse.setdefault(n, set()).add(key)
        self._reverse.setdefault(key, set())
        self._graph[key] = value

    def __delitem__(self, key) -> None:
        for n in self._graph[key]:
            if n in self._reverse:
                self._reverse[n].discard(key)
        del self._graph[key]
        self._reverse.pop(key, None)

    def __eq__(self, other) -> bool:
        if not isinstance(other, _LayerWithReversedEdges):
            return False
        return self._graph == other._graph

    def get_reverse_edges(self, key) -> set:
        return set(self._reverse.get(key, set()))


class HNSW(MutableMapping):
    """Approximate nearest-neighbor index under any distance function.

    Args:
        distance_func: ``(x, y) -> float`` distance between two points.
        m: Out-degree kept per node (level 0 keeps ``m0``).
        ef_construction: Beam width during construction.
        m0: Level-0 out-degree; defaults to ``2 * m``.
        seed: Seed for the level generator.
        reversed_edges: Maintain reverse edges for fast hard-removes.
        batch_distance_func: Optional ``(query, points[N, ...]) -> float[N]``
            vectorized distance used for frontier expansion.
    """

    def __init__(
        self,
        distance_func: Callable,
        m: int = 16,
        ef_construction: int = 200,
        m0: Optional[int] = None,
        seed: Optional[int] = None,
        reversed_edges: bool = False,
        batch_distance_func: Optional[Callable] = None,
    ) -> None:
        self._nodes: OrderedDict = OrderedDict()
        self._distance_func = distance_func
        self._batch_distance_func = batch_distance_func
        self._m = m
        self._ef_construction = ef_construction
        self._m0 = 2 * m if m0 is None else m0
        self._level_mult = 1 / np.log(m)
        self._graphs: list = []
        self._entry_point = None
        self._random = np.random.RandomState(seed)
        self._layer_class = _LayerWithReversedEdges if reversed_edges else _Layer

    @classmethod
    def from_points(
        cls,
        points,
        keys=None,
        distance_func: Optional[Callable] = None,
        metric="l2",
        m: int = 16,
        ef_construction: int = 200,
        m0: Optional[int] = None,
        reversed_edges: bool = False,
        batch_distance_func: Optional[Callable] = None,
        tile: int = 256,
    ) -> "HNSW":
        """Bulk-build a fully mutable HNSW at device speed.

        The graph is constructed on device (exact kNN + diversity pruning +
        nested routing levels, :mod:`datasketch_tpu.ops.knn_graph` — ~3x
        faster than the Python insert loop at 2k points and growing with N)
        and converted into the normal mutable layer structure: the result
        supports insert/remove/query exactly like an incrementally built
        index.

        Args:
            points: [N, D] array; ``metric`` names the device metric
                ('l2' / 'cosine' / 'minhash_jaccard' or a jittable fn).
            distance_func: host-side distance for subsequent incremental
                operations; defaults to a NumPy equivalent of ``metric``.
        """
        if distance_func is None:
            if metric == "l2":
                distance_func = lambda x, y: float(np.linalg.norm(x - y))  # noqa: E731
                if batch_distance_func is None:
                    batch_distance_func = lambda q, pts: np.linalg.norm(  # noqa: E731
                        np.asarray(pts) - q, axis=-1
                    )
            elif metric == "minhash_jaccard":
                distance_func = lambda x, y: 1.0 - float(np.mean(x == y))  # noqa: E731
                if batch_distance_func is None:
                    batch_distance_func = lambda q, pts: 1.0 - (  # noqa: E731
                        np.asarray(pts) == q
                    ).mean(axis=-1)
            else:
                raise ValueError(
                    "provide distance_func for metric %r" % (metric,)
                )
        return _bulk_build_hnsw(
            points,
            keys,
            distance_func,
            metric,
            m,
            ef_construction,
            m0,
            reversed_edges,
            batch_distance_func,
            tile,
        )

    # ------------------------------------------------------------- distances

    def _dists_to(self, query_point, keys: list) -> list:
        """Distances from query to many stored points, batched if possible."""
        if not keys:
            return []
        if self._batch_distance_func is not None:
            pts = np.stack([self._nodes[p].point for p in keys])
            return list(np.asarray(self._batch_distance_func(query_point, pts)))
        return [
            self._distance_func(query_point, self._nodes[p].point) for p in keys
        ]

    # ------------------------------------------------------- mapping surface

    def __len__(self) -> int:
        return sum(not node.is_deleted for node in self._nodes.values())

    def __contains__(self, key) -> bool:
        return key in self._nodes and not self._nodes[key].is_deleted

    def __getitem__(self, key):
        if key not in self:
            raise KeyError(key)
        return self._nodes[key].point

    def __setitem__(self, key, value) -> None:
        self.insert(key, value)

    def __delitem__(self, key) -> None:
        self.remove(key)

    def __iter__(self):
        return (key for key in self._nodes if not self._nodes[key].is_deleted)

    def reversed(self):
        """Reverse-order iterator over live keys."""
        return (
            key for key in reversed(self._nodes) if not self._nodes[key].is_deleted
        )

    def __eq__(self, other) -> bool:
        if not isinstance(other, HNSW):
            return False
        if (
            self._distance_func != other._distance_func
            or self._m != other._m
            or self._ef_construction != other._ef_construction
            or self._m0 != other._m0
            or self._level_mult != other._level_mult
            or self._entry_point != other._entry_point
        ):
            return False
        s1 = self._random.get_state()
        s2 = other._random.get_state()
        for a, b in zip(s1, s2):
            if isinstance(a, np.ndarray):
                if not np.array_equal(a, b):
                    return False
            elif a != b:
                return False
        return (
            set(self._nodes) == set(other._nodes)
            and all(self._nodes[k] == other._nodes[k] for k in self._nodes)
            and self._graphs == other._graphs
        )

    def get(self, key, default=None):
        if key not in self:
            return default
        return self._nodes[key].point

    def items(self):
        return (
            (key, node.point)
            for key, node in self._nodes.items()
            if not node.is_deleted
        )

    def keys(self):
        return (key for key in self._nodes if not self._nodes[key].is_deleted)

    def values(self):
        return (
            node.point for node in self._nodes.values() if not node.is_deleted
        )

    def pop(self, key, default=None, hard: bool = False):
        """Remove and return the point at key (KeyError if absent and no
        default given)."""
        if key not in self:
            if default is None:
                raise KeyError(key)
            return default
        point = self._nodes[key].point
        self.remove(key, hard=hard)
        return point

    def popitem(self, last: bool = True, hard: bool = False):
        """Remove and return a (key, point) pair, LIFO if `last`."""
        if not self._nodes:
            raise KeyError("popitem(): index is empty")
        order = reversed(self._nodes) if last else iter(self._nodes)
        key = next((k for k in order if not self._nodes[k].is_deleted), None)
        if key is None:
            raise KeyError("popitem(): index is empty")
        point = self._nodes[key].point
        self.remove(key, hard=hard)
        return key, point

    def clear(self) -> None:
        """Drop all points (random state is kept)."""
        self._nodes = OrderedDict()
        self._graphs = []
        self._entry_point = None

    def copy(self) -> "HNSW":
        """Deep copy sharing no graph structure with the original."""
        new_index = HNSW(
            self._distance_func,
            m=self._m,
            ef_construction=self._ef_construction,
            m0=self._m0,
            reversed_edges=self._layer_class is _LayerWithReversedEdges,
            batch_distance_func=self._batch_distance_func,
        )
        new_index._nodes = OrderedDict(
            (key, node.copy()) for key, node in self._nodes.items()
        )
        new_index._graphs = [layer.copy() for layer in self._graphs]
        new_index._entry_point = self._entry_point
        new_index._random.set_state(self._random.get_state())
        return new_index

    def update(self, other: Union[Mapping, "HNSW"]) -> None:
        """Insert every (key, point) from the mapping/index, overwriting."""
        for key, point in other.items():
            self.insert(key, point)

    def setdefault(self, key, default):
        if default is None:
            raise ValueError("Default value cannot be None.")
        if key not in self._nodes or self._nodes[key].is_deleted:
            self.insert(key, default)
        return self._nodes[key].point

    def merge(self, other: "HNSW") -> "HNSW":
        """New index = copy of self updated with other's points."""
        new_index = self.copy()
        new_index.update(other)
        return new_index

    # --------------------------------------------------------------- insert

    def insert(
        self,
        key,
        new_point,
        ef: Optional[int] = None,
        level: Optional[int] = None,
    ) -> None:
        """Insert or update a point; updates repair the neighborhood."""
        if ef is None:
            ef = self._ef_construction
        if key in self._nodes:
            if self._nodes[key].is_deleted:
                self._nodes[key].is_deleted = False
            self._update(key, new_point, ef)
            return
        if level is None:
            level = int(-np.log(self._random.random_sample()) * self._level_mult)
        self._nodes[key] = _Node(key, new_point)
        if self._entry_point is not None:
            dist = self._distance_func(new_point, self._nodes[self._entry_point].point)
            point = self._entry_point
            for layer in reversed(self._graphs[level + 1 :]):
                point, dist = self._search_ef1(
                    new_point, point, dist, layer, allow_soft_deleted=True
                )
            entry_points = [(-dist, point)]
            for layer in reversed(self._graphs[: level + 1]):
                level_m = self._m if layer is not self._graphs[0] else self._m0
                entry_points = self._search_base_layer(
                    new_point, entry_points, layer, ef, allow_soft_deleted=True
                )
                layer[key] = {
                    p: d
                    for d, p in self._heuristic_prune(
                        [(-md, p) for md, p in entry_points], level_m
                    )
                }
                for neighbor_key, dist in layer[key].items():
                    layer[neighbor_key] = {
                        p: d
                        for d, p in self._heuristic_prune(
                            [(d, p) for p, d in layer[neighbor_key].items()]
                            + [(dist, key)],
                            level_m,
                        )
                    }
        for _ in range(len(self._graphs), level + 1):
            self._graphs.append(self._layer_class(key))
            self._entry_point = key

    def _update(self, key, new_point, ef: int) -> None:
        """Point update: rewire the 2nd-degree neighborhood, then repair the
        node's own out-edges by re-searching the graph."""
        if key not in self._nodes:
            raise KeyError(key)
        self._nodes[key].point = new_point
        if self._entry_point == key and len(self._nodes) == 1:
            return
        for layer in self._graphs:
            if key not in layer:
                break
            layer_m = self._m if layer is not self._graphs[0] else self._m0
            neighborhood_keys = {key}
            for p in layer[key]:
                neighborhood_keys.add(p)
                for p2 in layer[p]:
                    neighborhood_keys.add(p2)
            for p in layer[key]:
                cands: list = []
                elem_to_keep = min(ef, len(neighborhood_keys) - 1)
                cand_keys = [ck for ck in neighborhood_keys if ck != p]
                dists = self._dists_to(self._nodes[p].point, cand_keys)
                for candidate_key, dist in zip(cand_keys, dists):
                    if len(cands) < elem_to_keep:
                        heapq.heappush(cands, (-dist, candidate_key))
                    elif dist < -cands[0][0]:
                        heapq.heappushpop(cands, (-dist, candidate_key))
                layer[p] = {
                    p2: d2
                    for d2, p2 in self._heuristic_prune(
                        [(-md, pk) for md, pk in cands], layer_m
                    )
                }
        self._repair_connections(key, new_point, ef)

    def _repair_connections(
        self, key, new_point, ef: int, key_to_delete=None
    ) -> None:
        entry_point = self._entry_point
        entry_point_dist = self._distance_func(
            new_point, self._nodes[entry_point].point
        )
        entry_points = [(-entry_point_dist, entry_point)]
        for layer in reversed(self._graphs):
            if key not in layer:
                entry_point, entry_point_dist = self._search_ef1(
                    new_point,
                    entry_point,
                    entry_point_dist,
                    layer,
                    allow_soft_deleted=True,
                    key_to_hard_delete=key_to_delete,
                )
                entry_points = [(-entry_point_dist, entry_point)]
            else:
                level_m = self._m if layer is not self._graphs[0] else self._m0
                entry_points = self._search_base_layer(
                    new_point,
                    entry_points,
                    layer,
                    ef + 1,  # +1 accounts for the point itself
                    allow_soft_deleted=True,
                    key_to_hard_delete=key_to_delete,
                )
                filtered = [(-md, p) for md, p in entry_points if p != key]
                layer[key] = {
                    p: d for d, p in self._heuristic_prune(filtered, level_m)
                }

    # ---------------------------------------------------------------- query

    def query(
        self,
        query_point,
        k: Optional[int] = None,
        ef: Optional[int] = None,
    ) -> list:
        """k nearest neighbors as (key, distance) pairs, nearest first."""
        if ef is None:
            ef = self._ef_construction
        if self._entry_point is None:
            raise ValueError("Entry point not found.")
        entry_point = self._entry_point
        entry_point_dist = self._distance_func(
            query_point, self._nodes[entry_point].point
        )
        for layer in reversed(self._graphs[1:]):
            entry_point, entry_point_dist = self._search_ef1(
                query_point, entry_point, entry_point_dist, layer
            )
        candidates = self._search_base_layer(
            query_point, [(-entry_point_dist, entry_point)], self._graphs[0], ef
        )
        if k is not None:
            candidates = heapq.nlargest(k, candidates)
        else:
            candidates.sort(reverse=True)
        return [(key, -mdist) for mdist, key in candidates]

    def _search_ef1(
        self,
        query_point,
        entry_point,
        entry_point_dist: float,
        layer: _Layer,
        allow_soft_deleted: bool = False,
        key_to_hard_delete=None,
    ):
        """Greedy single-best descent through one layer."""
        candidates = [(entry_point_dist, entry_point)]
        visited = {entry_point}
        best = entry_point
        best_dist = entry_point_dist
        while candidates:
            dist, curr = heapq.heappop(candidates)
            if dist > best_dist:
                break
            neighbors = [p for p in layer[curr] if p not in visited]
            visited.update(neighbors)
            dists = self._dists_to(query_point, neighbors)
            for p, d in zip(neighbors, dists):
                if d < best_dist:
                    if (
                        not allow_soft_deleted and self._nodes[p].is_deleted
                    ) or p == key_to_hard_delete:
                        pass  # traverse through, never return
                    else:
                        best, best_dist = p, d
                    heapq.heappush(candidates, (d, p))
        return best, best_dist

    def _search_base_layer(
        self,
        query_point,
        entry_points: list,
        layer: _Layer,
        ef: int,
        allow_soft_deleted: bool = False,
        key_to_hard_delete=None,
    ) -> list:
        """Beam search with an ef-bounded result heap of (-dist, key)."""
        candidates = [(-mdist, p) for mdist, p in entry_points]
        heapq.heapify(candidates)
        visited = {p for _, p in entry_points}
        while candidates:
            dist, curr_key = heapq.heappop(candidates)
            closest_dist = -entry_points[0][0]
            if dist > closest_dist:
                break
            neighbors = [p for p in layer[curr_key] if p not in visited]
            visited.update(neighbors)
            dists = self._dists_to(query_point, neighbors)
            for p, d in zip(neighbors, dists):
                if (
                    not allow_soft_deleted and self._nodes[p].is_deleted
                ) or p == key_to_hard_delete:
                    if d <= closest_dist:
                        # traverse through deleted points without returning them
                        heapq.heappush(candidates, (d, p))
                elif len(entry_points) < ef:
                    heapq.heappush(candidates, (d, p))
                    heapq.heappush(entry_points, (-d, p))
                    closest_dist = -entry_points[0][0]
                elif d <= closest_dist:
                    heapq.heappush(candidates, (d, p))
                    heapq.heapreplace(entry_points, (-d, p))
                    closest_dist = -entry_points[0][0]
        return entry_points

    def _heuristic_prune(self, candidates: list, max_size: int) -> list:
        """hnswlib-style diversification: keep a candidate only if it is
        closer to the query node than to every already-kept neighbor."""
        if len(candidates) < max_size:
            return candidates
        heapq.heapify(candidates)
        pruned: list = []
        while candidates and len(pruned) < max_size:
            candidate_dist, candidate_key = heapq.heappop(candidates)
            good = True
            for _, selected_key in pruned:
                if (
                    self._distance_func(
                        self._nodes[selected_key].point,
                        self._nodes[candidate_key].point,
                    )
                    < candidate_dist
                ):
                    good = False
                    break
            if good:
                pruned.append((candidate_dist, candidate_key))
        return pruned

    # --------------------------------------------------------------- remove

    def remove(self, key, hard: bool = False, ef: Optional[int] = None) -> None:
        """Soft remove (tombstone) or hard remove (unlink + re-wire the
        in-neighbors). Entry point is re-assigned if needed; removing the
        last point clears the index."""
        if not self._nodes or key not in self._nodes:
            raise KeyError(key)
        if self._entry_point == key:
            new_entry_point = None
            for layer in reversed(list(self._graphs)):
                new_entry_point = next(
                    (
                        p
                        for p in layer
                        if p != key and not self._nodes[p].is_deleted
                    ),
                    None,
                )
                if new_entry_point is not None:
                    break
                self._graphs.pop()
            if new_entry_point is None:
                self.clear()
                return
            self._entry_point = new_entry_point
        if ef is None:
            ef = self._ef_construction

        self._nodes[key].is_deleted = True
        if not hard:
            return

        keys_to_update = set()
        for layer in self._graphs:
            if key not in layer:
                break
            keys_to_update.update(layer.get_reverse_edges(key))
        for key_to_update in keys_to_update:
            self._repair_connections(
                key_to_update,
                self._nodes[key_to_update].point,
                ef,
                key_to_delete=key,
            )
        for layer in self._graphs:
            if key not in layer:
                break
            del layer[key]
        del self._nodes[key]

    def clean(self, ef: Optional[int] = None) -> None:
        """Hard-remove every tombstoned point."""
        keys_to_remove = [k for k in self._nodes if self._nodes[k].is_deleted]
        for key in keys_to_remove:
            self.remove(key, ef=ef, hard=True)


def _bulk_build_hnsw(
    points,
    keys,
    distance_func,
    metric,
    m,
    ef_construction,
    m0,
    reversed_edges,
    batch_distance_func,
    tile,
):
    """Implementation of :meth:`HNSW.from_points` (module-level to keep the
    class namespace clean)."""
    import jax.numpy as jnp

    from datasketch_tpu.ops import knn_graph
    from datasketch_tpu.ops.hnsw_ops import _distance_fn

    points = np.asarray(points)
    n = points.shape[0]
    keys = list(keys) if keys is not None else list(range(n))
    if len(keys) != n:
        raise ValueError("keys and points must have equal length")

    index = HNSW(
        distance_func=distance_func,
        m=m,
        ef_construction=ef_construction,
        m0=m0,
        reversed_edges=reversed_edges,
        batch_distance_func=batch_distance_func,
    )
    if n == 0:
        return index
    graph = knn_graph.build_nsw_graph(
        points, keys=keys, m=m, metric=metric, tile=tile
    )
    dist = _distance_fn(metric)
    pts_dev = graph.points

    for i, k in enumerate(keys):
        index._nodes[k] = _Node(k, points[i])

    def layer_from(adj_local, node_ids):
        """adj int32[nl, deg] LOCAL indices + global node ids -> _Layer."""
        nl = adj_local.shape[0]
        # one device pass for all edge distances of this level
        safe = np.where(adj_local >= 0, adj_local, 0)
        d = np.asarray(
            dist(
                pts_dev[jnp.asarray(node_ids)],
                pts_dev[jnp.asarray(node_ids[safe])],
            )
        )
        layer = object.__new__(index._layer_class)
        layer._graph = {}
        if reversed_edges:
            layer._reverse = {keys[g]: set() for g in node_ids}
        for li in range(nl):
            nbrs = {}
            for j, lj in enumerate(adj_local[li]):
                if lj >= 0:
                    nbrs[keys[node_ids[lj]]] = float(d[li, j])
            layer._graph[keys[node_ids[li]]] = nbrs
        if reversed_edges:
            for src, nbrs in layer._graph.items():
                for dst in nbrs:
                    layer._reverse[dst].add(src)
        return layer

    # base layer: LOCAL ids == global row ids
    index._graphs.append(
        layer_from(np.asarray(graph.adj0), np.arange(n, dtype=np.int64))
    )
    # upper levels come top-first from DeviceGraph; HNSW stores bottom-up
    for nodes, adj in zip(
        reversed(graph.upper_nodes), reversed(graph.upper_adj)
    ):
        index._graphs.append(
            layer_from(np.asarray(adj), np.asarray(nodes, dtype=np.int64))
        )
    index._entry_point = keys[graph.entry]
    return index

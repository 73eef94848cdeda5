"""ShardedMinHashLSHEnsemble — containment index sharded over a mesh.

The mesh form of :class:`datasketch_tpu.models.tpu_ensemble.
TpuMinHashLSHEnsemble` (reference semantics:
``/root/reference/datasketch/lshensemble.py:61,230-249``). The stacked
``[parts, N_pad, P]`` layout shards over the PARTITION axis: each device
owns ``num_part / n_shards`` size-partitions (the reference probes every
partition per query anyway, so partition-sharding balances query work
perfectly), builds their band tables locally inside ``shard_map``, probes
them with the same per-(query, partition) dynamic band masks, and
candidates return via one ``all_gather`` per unique r. The host-side DP
size-partitioner and per-x/q (b, r) parameter tables are inherited
unchanged; checkpoints interoperate with the single-chip class in both
directions.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble
from datasketch_tpu.ops import lsh_ops

__all__ = ["ShardedMinHashLSHEnsemble"]


class ShardedMinHashLSHEnsemble(TpuMinHashLSHEnsemble):
    """Containment-threshold index with partition-sharded device tables.

    Args:
        mesh: device mesh; partitions shard over ``shard_axis``. The
            partition stack is padded to a multiple of the shard count
            with empty partitions (``n_valid`` 0 masks their every row).
        shard_axis: mesh axis name.
        Other args as :class:`TpuMinHashLSHEnsemble`.
    """

    def __init__(self, mesh: Mesh, threshold: float = 0.9,
                 num_perm: int = 128, num_part: int = 16, m: int = 8,
                 weights: tuple = (0.5, 0.5), bucket_cap: int = 128,
                 shard_axis: str = "data", max_results: int = 2048):
        super().__init__(
            threshold=threshold, num_perm=num_perm, num_part=num_part,
            m=m, weights=weights, bucket_cap=bucket_cap,
            max_results=max_results,
        )
        self.mesh = mesh
        self.shard_axis = shard_axis
        self.n_shards = mesh.shape[shard_axis]
        self._parts_pad = -(-num_part // self.n_shards) * self.n_shards
        self._probe_fns: dict = {}  # r -> compiled sharded probe
        self._sizes_sharded = None  # int32[parts_pad, N_pad], P(axis, None)
        self._scan_fns = {}  # compiled sharded containment scan

    # ------------------------------------------------------------------ build

    def _build_tables(self, stack: np.ndarray) -> None:
        """Shard the partition stack over the mesh and build every r's
        band tables locally per shard (overrides the single-chip hook;
        called by the inherited ``index`` and ``load`` paths)."""
        mesh, axis = self.mesh, self.shard_axis
        stack = np.asarray(stack)
        pad = self._parts_pad - stack.shape[0]
        n_valid = self._n_valid
        if pad:
            rng = np.random.RandomState(self._n_pad & 0x7FFFFFFF)
            filler = rng.randint(
                0, 1 << 32, size=(pad, stack.shape[1], self.h),
                dtype=np.uint64,
            ).astype(np.uint32)
            stack = np.concatenate([stack, filler], axis=0)
            n_valid = np.concatenate([n_valid, np.zeros(pad, np.int32)])
        self._sigs_dev = jax.device_put(
            stack, NamedSharding(mesh, P(axis, None, None))
        )
        self._n_valid_dev = jax.device_put(
            jnp.asarray(n_valid), NamedSharding(mesh, P(axis))
        )
        b_by_r = {r: self.h // r for r in self.rs}

        def build_body(s):
            return {r: lsh_ops.build_tables_stacked(s, b, r)
                    for r, b in b_by_r.items()}

        self._tables = jax.jit(
            jax.shard_map(
                build_body,
                mesh=mesh,
                in_specs=P(axis, None, None),
                out_specs={r: (P(axis, None, None), P(axis, None, None))
                           for r in b_by_r},
            )
        )(self._sigs_dev)
        self._probe_fns = {}
        self._scan_fns = {}
        if self._sizes_host is not None:
            sizes = self._sizes_host
            if pad:
                # filler partitions carry size 0 = padding, which the
                # containment scan already masks
                sizes = np.concatenate(
                    [sizes, np.zeros((pad, sizes.shape[1]), np.int32)]
                )
            self._sizes_sharded = jax.device_put(
                sizes, NamedSharding(mesh, P(axis, None))
            )

    def _to_host(self, arr) -> np.ndarray:
        """Full host copy, multi-process safe; COLLECTIVE on a
        multi-process mesh (see :func:`~datasketch_tpu.parallel.mesh.
        fetch_global` for the ordering rule)."""
        from datasketch_tpu.parallel.mesh import fetch_global

        return fetch_global(arr, self.mesh)

    def _host_stack(self) -> np.ndarray:
        # drop the filler partitions: checkpoints stay layout-independent
        return self._to_host(self._sigs_dev)[: self.num_part]

    def _has_scan_sizes(self) -> bool:
        # the sharded scan reads its own partition-sharded layout, not
        # the base class's flat single-device copy
        return self._sizes_sharded is not None

    # ------------------------------------------------------------------ query

    def _make_probe_fn(self, r: int):
        mesh, axis = self.mesh, self.shard_axis
        b = self.h // r
        cap, n_pad = self.bucket_cap, self._n_pad

        max_results = self.max_results

        def body(sorted_fp, sorted_ids, q_sigs, b_keep, n_valid):
            flat, trunc = lsh_ops.query_stacked_masked(
                sorted_fp, sorted_ids, q_sigs, b, r, cap, b_keep, n_valid
            )
            # globalize: local part p on shard s is partition
            # s * parts_local + p; flat ids are part_local * n_pad + row
            parts_local = sorted_fp.shape[0]
            base = jax.lax.axis_index(axis) * parts_local * n_pad
            flat = jnp.where(flat >= 0, flat + base, -1)
            # per-shard dedupe + compaction BEFORE the collective: only
            # max_out slots per shard ride the all_gather (vs
            # parts_local*b*cap); overflow is counted, never silent
            max_out = min(max_results, flat.shape[1])
            sel, n_match = lsh_ops.unique_compact(flat, max_out)
            over = jnp.sum(jnp.maximum(n_match - max_out, 0))
            g = jax.lax.all_gather(sel, axis, axis=1, tiled=True)
            return g, jax.lax.psum(trunc + over, axis)

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axis, None, None), P(axis, None, None),
                          P(None, None), P(None, axis), P(axis)),
                out_specs=(P(None, None), P()),
                check_vma=False,
            )
        )

    def _make_scan_fn(self, max_out: int):
        """Sharded containment scan: each shard streams its local
        partitions once (:func:`datasketch_tpu.ops.lsh_ops.
        containment_scan`), keeps its top ``max_out`` passing rows,
        and the per-shard selections ride ONE all_gather — candidate
        id spaces are shard-disjoint, so no cross-shard dedupe is
        needed."""
        mesh, axis = self.mesh, self.shard_axis
        n_pad = self._n_pad
        parts_local = self._parts_pad // self.n_shards
        cutoff = float(self.threshold)

        def body(sigs_local, sizes_local, q_sigs, q_sizes):
            flat_sigs = sigs_local.reshape(-1, sigs_local.shape[-1])
            flat_sizes = sizes_local.reshape(-1)
            ids, _sc, cnt = lsh_ops.containment_scan(
                flat_sigs, flat_sizes, q_sigs, q_sizes,
                jnp.float32(cutoff), max_out,
            )
            base = jax.lax.axis_index(axis) * parts_local * n_pad
            ids = jnp.where(ids >= 0, ids + base, -1)
            over = jnp.sum(jnp.maximum(cnt - max_out, 0))
            g = jax.lax.all_gather(ids, axis, axis=1, tiled=True)
            return g, jax.lax.psum(over, axis)

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axis, None, None), P(axis, None),
                          P(None, None), P(None)),
                out_specs=(P(None, None), P()),
                check_vma=False,
            )
        )

    def query_batch(self, queries, method: str = "auto") -> list:
        """Batched containment query across all shards: per unique r,
        one sharded band dispatch + all_gather (method='bands'), or one
        sharded streamed containment scan (method='scan'; same
        estimate-thresholding semantics as the single-chip class —
        'auto' applies the same table-vs-gather-volume rule)."""
        if method not in ("auto", "bands", "scan"):
            raise ValueError("method must be 'auto', 'bands' or 'scan'")
        queries = list(queries)
        if not queries or not self._tables:
            return [[] for _ in queries]
        from datasketch_tpu.models.tpu_lsh import _as_signature_matrix

        q_sigs = _as_signature_matrix([mh for mh, _ in queries])
        if q_sigs.shape[1] != self.h:
            raise ValueError(
                "Expecting minhash with length %d, got %d"
                % (self.h, q_sigs.shape[1])
            )
        nq = q_sigs.shape[0]
        q_pad = 8
        while q_pad < nq:
            q_pad *= 2
        if q_pad != nq:
            q_sigs = np.pad(q_sigs, ((0, q_pad - nq), (0, 0)))
        method = self._resolve_scan_method(method, q_pad)
        if method == "scan":
            return self._query_scan_sharded(queries, q_sigs, nq)

        b_keep = {r: np.zeros((q_pad, self._parts_pad), dtype=np.int32)
                  for r in self.rs}
        for qi, (_, size) in enumerate(queries):
            for part in range(self.num_part):
                u = self.uppers[part]
                if u is None:
                    continue
                bb, rr = self._get_optimal_param(u, size)
                b_keep[int(rr)][qi, part] = int(bb)

        rep = NamedSharding(self.mesh, P(None, None))
        q_dev = jax.device_put(jnp.asarray(q_sigs), rep)
        probes = []
        for r in self.rs:
            if not b_keep[r].any():
                continue
            if r not in self._probe_fns:
                self._probe_fns[r] = self._make_probe_fn(r)
            sorted_fp, sorted_ids = self._tables[r]
            out = self._probe_fns[r](
                sorted_fp, sorted_ids, q_dev, jnp.asarray(b_keep[r]),
                self._n_valid_dev,
            )
            for arr in out:
                if getattr(arr, "is_fully_addressable", True):
                    arr.copy_to_host_async()
            probes.append(out)

        results = [set() for _ in queries]
        total_trunc = 0
        for out in probes:
            ids_host, trunc = jax.device_get(out)
            total_trunc += int(trunc)
            for qi in range(nq):
                row = ids_host[qi]
                # per-shard compaction already deduped; shard-disjoint
                # global ids cannot collide across the gather
                for g in row[row >= 0]:
                    part, local = divmod(int(g), self._n_pad)
                    results[qi].add(self._keys_per_part[part][local])
        self.last_truncated = total_trunc
        return [list(r) for r in results]

    def _scan_dispatch(self, queries, q_sigs: np.ndarray, nq: int):
        """Sharded twin of the base ``_scan_dispatch`` (the inherited
        :meth:`TpuMinHashLSHEnsemble.query_stream` pipelines through
        these overrides): no transfer is forced here."""
        q_sizes = np.ones(q_sigs.shape[0], dtype=np.int32)
        q_sizes[:nq] = [int(size) for _, size in queries]
        parts_local = self._parts_pad // self.n_shards
        full_out = min(self.max_results, parts_local * self._n_pad)
        # SMALL per-shard k first (the kernel's extraction merge unrolls
        # k rounds — see TpuMinHashLSHEnsemble._scan_dispatch); staged
        # escalation below when a shard actually overflowed
        scan_k = min(full_out, 16)
        rep = NamedSharding(self.mesh, P(None, None))
        rep1 = NamedSharding(self.mesh, P(None))
        q_dev = jax.device_put(jnp.asarray(q_sigs), rep)
        qs_dev = jax.device_put(jnp.asarray(q_sizes), rep1)

        def _scan(k_):
            if k_ not in self._scan_fns:
                self._scan_fns[k_] = self._make_scan_fn(k_)
            return self._scan_fns[k_](
                self._sigs_dev, self._sizes_sharded, q_dev, qs_dev
            )

        ids, over = _scan(scan_k)
        return ids, over, _scan, scan_k, full_out, nq

    def _scan_finish(self, item) -> list:
        ids, over, scan, scan_k, full_out, nq = item
        ids_host, over_host = jax.device_get((ids, over))
        # staged: one retry inside the fused branch (k=128) before the
        # full per-shard width
        while scan_k < full_out and int(over_host) > 0:
            scan_k = min(full_out, 128 if scan_k < 128 else full_out)
            ids, over = scan(scan_k)
            ids_host, over_host = jax.device_get((ids, over))
        results = []
        for qi in range(nq):
            row = ids_host[qi]
            keys = []
            for g in row[row >= 0]:
                part, local = divmod(int(g), self._n_pad)
                keys.append(self._keys_per_part[part][local])
            results.append(keys)
        self.last_truncated = int(over_host)
        return results

    def _query_scan_sharded(self, queries, q_sigs: np.ndarray,
                            nq: int) -> list:
        """Containment-scan finish: one sharded dispatch, one fetch."""
        return self._scan_finish(self._scan_dispatch(queries, q_sigs, nq))

    # ------------------------------------------------------------ persistence

    @classmethod
    def load(cls, path: str, mesh: Mesh, shard_axis: str = "data",
             ) -> "ShardedMinHashLSHEnsemble":
        """Reload a single-chip or sharded ensemble checkpoint onto
        ``mesh`` (tables re-derive; the shard count may differ).
        SECURITY: the key lists inside the file are a pickle payload —
        only load index files you created or trust."""
        from datasketch_tpu.persist import npz_path, unpack_keys

        data = np.load(npz_path(path), allow_pickle=False)
        if str(data["kind"]) != "tpu_ensemble":
            raise ValueError("not a TpuMinHashLSHEnsemble checkpoint")
        weights = tuple(float(w) for w in data["weights"])
        obj = cls(
            mesh,
            threshold=float(data["threshold"]),
            num_perm=int(data["num_perm"]),
            num_part=int(data["num_part"]),
            m=int(data["m"]),
            bucket_cap=int(data["bucket_cap"]),
            weights=weights,
            shard_axis=shard_axis,
        )
        obj.lowers = [None if x < 0 else int(x) for x in data["lowers"]]
        obj.uppers = [None if x < 0 else int(x) for x in data["uppers"]]
        obj._n_valid = data["n_valid"].astype(np.int32)
        sigs = data["sigs"]
        obj._n_pad = sigs.shape[1]
        obj._keys_per_part = unpack_keys(data["keys"])
        obj._key_set = set().union(*map(set, obj._keys_per_part)) if len(
            obj._keys_per_part
        ) else set()
        if "sizes" in data:
            # sizes ride along so a later single-chip re-load of this
            # index's re-save keeps the containment-scan path
            obj._set_sizes(data["sizes"])
        obj._build_tables(sigs)
        return obj

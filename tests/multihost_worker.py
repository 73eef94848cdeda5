"""Worker process for tests/test_multihost.py — two-process DCN simulation.

Each worker is a FRESH interpreter: it forces the CPU platform before any
device use (sitecustomize pre-imports jax with the remote-TPU backend; a
wedged tunnel would otherwise hang the worker), carves 4 virtual CPU
devices, joins the jax.distributed coordinator, and then drives the full
multi-host story the reference delegates to shared Redis/Cassandra
keyspaces (``/root/reference/datasketch/storage.py:819+``, SURVEY §2.4):

1. cross-process collectives over the global 8-device mesh,
2. a ShardedMinHashLSH built and queried on the GLOBAL mesh (documents
   sharded across both processes' devices),
3. a save -> barrier -> load handoff: process 0 persists the index,
   process 1 reloads it onto its own LOCAL 4-device mesh (different shard
   count than the saving mesh) and re-queries.

Usage: python multihost_worker.py <port> <process_id> <n_processes> <tmpdir>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    port, pid, nproc, tmpdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )

    from datasketch_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4
    assert len(jax.devices()) == 4 * nproc

    import numpy as np
    import jax.numpy as jnp  # noqa: F401
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from datasketch_tpu import MinHash
    from datasketch_tpu.parallel.sharded_lsh import ShardedMinHashLSH

    n_global = 4 * nproc
    mesh = Mesh(np.array(jax.devices()).reshape(n_global), ("data",))

    # 1. cross-process collective
    f = jax.jit(
        jax.shard_map(
            lambda x: jax.lax.psum(x, "data"),
            mesh=mesh,
            in_specs=P("data"),
            out_specs=P(None),
            check_vma=False,
        )
    )
    x = jax.device_put(
        np.ones(n_global, np.float32), NamedSharding(mesh, P("data"))
    )
    assert float(np.asarray(f(x))[0]) == float(n_global)
    print(f"[{pid}] collective OK", flush=True)

    # 2. global-mesh sharded index (documents spread over BOTH processes)
    rng = np.random.RandomState(0)  # same corpus in every process
    docs = [
        rng.choice(20000, 100, replace=False).astype(np.uint32)
        for _ in range(64)
    ]
    sigs = MinHash.bulk_signatures(docs, num_perm=128, hashfunc="device")
    index = ShardedMinHashLSH(mesh, threshold=0.5, num_perm=128, bucket_cap=32)
    index.index(list(range(64)), sigs)
    queries = [MinHash(hashvalues=r, hashfunc="device") for r in sigs[:6]]
    res = index.query_batch(queries)
    for i, row in enumerate(res):
        assert i in row, (pid, i, row)
    topk = index.top_k(queries, k=3)
    for i, row in enumerate(topk):
        assert row and row[0][0] == i and row[0][1] == 1.0, (pid, i, row)
    # cross-host fetch paths: status (table stats), snapshot, incremental
    st = index.status()
    assert st["n_live"] == 64 and st["n_shards"] == n_global, (pid, st)
    snap = index.host_snapshot()
    assert snap["sigs"].shape == (64, 128)
    assert np.array_equal(snap["sigs"], sigs)
    extra = [
        rng.choice(20000, 100, replace=False).astype(np.uint32)
        for _ in range(8)
    ]
    index.index(
        list(range(64, 72)),
        MinHash.bulk_signatures(extra, num_perm=128, hashfunc="device"),
    )
    assert len(index) == 72
    res_inc = index.query_batch(queries)
    for i, row in enumerate(res_inc):
        assert i in row, (pid, i, row)
    print(f"[{pid}] global-mesh index OK", flush=True)

    # 3. save -> barrier -> load handoff onto a DIFFERENT (local) mesh.
    # save() is a COLLECTIVE on a multi-process mesh (the host fetch
    # all-gathers shards), so every process calls it — each to its own
    # path — before the barrier; loading then uses process 0's file.
    my_path = os.path.join(tmpdir, f"handoff_{pid}.npz")
    index.save(my_path)
    path = os.path.join(tmpdir, "handoff_0.npz")
    multihost_utils.sync_global_devices("saved")
    if pid != 0:
        local_mesh = Mesh(
            np.array(jax.local_devices()).reshape(4), ("data",)
        )
        loaded = ShardedMinHashLSH.load(path, local_mesh)
        assert len(loaded) == 72
        res2 = loaded.query_batch(queries)
        for i, row in enumerate(res2):
            assert set(row) == set(res_inc[i]), (pid, i, row, res_inc[i])
    multihost_utils.sync_global_devices("loaded")
    print(f"[{pid}] handoff OK", flush=True)

    # 4. the other sharded indexes on the same global mesh
    from datasketch_tpu.parallel import (
        ShardedMinHashLSHEnsemble,
        ShardedMinHashLSHForest,
    )

    forest = ShardedMinHashLSHForest(mesh, num_perm=128, l=8, cap=16)
    forest.index(list(range(64)), sigs)
    frows = forest.query_batch(sigs[:4], k=3, return_scores=True)
    for i, row in enumerate(frows):
        assert row and row[0][0] == i and row[0][1] == 1.0, (pid, i, row)

    sizes = [100] * 64
    ens = ShardedMinHashLSHEnsemble(
        mesh, threshold=0.8, num_perm=128, num_part=4, bucket_cap=16
    )
    ens.index(
        [(i, MinHash(hashvalues=sigs[i], hashfunc="device"), sizes[i])
         for i in range(64)]
    )
    erows = ens.query_batch(
        [(MinHash(hashvalues=sigs[i], hashfunc="device"), sizes[i])
         for i in range(4)]
    )
    for i, row in enumerate(erows):
        assert i in row, (pid, i, row)
    multihost_utils.sync_global_devices("indexes")
    print(f"[{pid}] forest+ensemble OK", flush=True)


if __name__ == "__main__":
    main()

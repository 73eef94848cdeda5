"""ShardedMinHashLSHBloom over the virtual CPU mesh.

Bit-space sharding of the membership LSH (reference semantics:
``/root/reference/datasketch/lsh_bloom.py:126-372``): each device owns a
contiguous bitmap slice, probes split into (owner, local) pairs, misses
are psum-combined. Because the global bitmap and probe scheme are
identical to the single-chip :class:`TpuMinHashLSHBloom`, query results
must be EXACTLY equal — these are equality tests, not statistical ones.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

from datasketch_tpu import MinHash
from datasketch_tpu.models.lsh_bloom import TpuMinHashLSHBloom
from datasketch_tpu.parallel import ShardedMinHashLSHBloom


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("data",))


def _mh(tokens):
    m = MinHash(num_perm=128)
    m.update_batch([t.encode() for t in tokens])
    return m


def _docs(n=24, seed=3):
    rng = np.random.RandomState(seed)
    return [
        _mh(["w%d" % t for t in rng.choice(5000, 30, replace=False)])
        for _ in range(n)
    ]


def test_sharded_bloom_exact_parity_with_single_chip():
    mhs = _docs()
    fresh = _docs(n=7, seed=99)
    single = TpuMinHashLSHBloom(threshold=0.5, num_perm=128, n=1000, fp=0.01)
    sharded = ShardedMinHashLSHBloom(
        _mesh(4), threshold=0.5, num_perm=128, n=1000, fp=0.01
    )
    single.insert_batch(mhs)
    sharded.insert_batch(mhs)
    assert sharded.query_batch(mhs).all()
    np.testing.assert_array_equal(
        sharded.query_batch(fresh), np.asarray(single.query_batch(fresh))
    )
    # global packed bitmap identical (word-space partition is lossless)
    from datasketch_tpu.parallel.mesh import fetch_global

    got = fetch_global(sharded._words, sharded.mesh)[:, : sharded.num_words]
    np.testing.assert_array_equal(got, np.asarray(single._words))


def test_sharded_bloom_incremental_and_odd_batch():
    # batch sizes off the pow2 grid exercise the edge-replication padding
    mhs = _docs(n=11, seed=7)
    sharded = ShardedMinHashLSHBloom(
        _mesh(8), threshold=0.5, num_perm=128, n=500, fp=0.01
    )
    sharded.insert_batch(mhs[:3])
    sharded.insert_batch(mhs[3:])
    assert sharded.query_batch(mhs).all()
    assert not sharded.query_batch([]).size


def test_sharded_bloom_checkpoint_interop(tmp_path):
    mhs = _docs(n=10, seed=11)
    fresh = _docs(n=6, seed=42)
    sharded = ShardedMinHashLSHBloom(
        _mesh(4), threshold=0.5, num_perm=128, n=500, fp=0.01
    )
    sharded.insert_batch(mhs)
    p1 = str(tmp_path / "sb")
    sharded.save(p1)

    # sharded -> single-chip
    single = TpuMinHashLSHBloom.load(p1)
    np.testing.assert_array_equal(
        np.asarray(single.query_batch(mhs + fresh)),
        sharded.query_batch(mhs + fresh),
    )

    # single-chip -> sharded on a DIFFERENT mesh shape
    p2 = str(tmp_path / "single")
    single.save(p2)
    re_sharded = ShardedMinHashLSHBloom.load(p2, _mesh(8))
    np.testing.assert_array_equal(
        re_sharded.query_batch(mhs + fresh),
        sharded.query_batch(mhs + fresh),
    )
    # and it keeps accepting inserts after the re-shard
    re_sharded.insert_batch(fresh)
    assert re_sharded.query_batch(fresh).all()

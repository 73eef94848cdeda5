"""Multi-device scale-out over a ``jax.sharding.Mesh``.

The reference's "distributed" story is client/server storage backends
(Redis/Cassandra/Mongo, ``/root/reference/datasketch/storage.py:819+``) plus
mergeable sketch state for MapReduce-style parallelism
(``/root/reference/docs/minhash.rst:57-59``). The TPU-native counterpart
(SURVEY.md §2.4) is collectives over ICI:

- sketch construction is data-parallel over the batch axis and
  tensor-parallel over the permutation axis (``shard_map``),
- sketch merge/union is ``lax.pmin`` / ``lax.pmax`` tree reductions,
- the LSH index shards its documents across devices; queries broadcast and
  candidates return via ``all_gather``.
"""

from datasketch_tpu.parallel.mesh import init_distributed, make_mesh
from datasketch_tpu.parallel.sharded_sketch import (
    sharded_compute_signatures,
    distributed_minhash_union,
    distributed_hll_union,
)
from datasketch_tpu.parallel.sharded_lsh import ShardedMinHashLSH
from datasketch_tpu.parallel.sharded_forest import ShardedMinHashLSHForest
from datasketch_tpu.parallel.sharded_ensemble import ShardedMinHashLSHEnsemble
from datasketch_tpu.parallel.sharded_hnsw import ShardedHNSW
from datasketch_tpu.parallel.sharded_bloom import ShardedMinHashLSHBloom
from datasketch_tpu.parallel.sharded_bbit import ShardedBBitIndex

__all__ = [
    "make_mesh",
    "init_distributed",
    "sharded_compute_signatures",
    "distributed_minhash_union",
    "distributed_hll_union",
    "ShardedMinHashLSH",
    "ShardedMinHashLSHForest",
    "ShardedMinHashLSHEnsemble",
    "ShardedHNSW",
    "ShardedMinHashLSHBloom",
    "ShardedBBitIndex",
]

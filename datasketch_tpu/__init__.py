"""datasketch_tpu — a TPU-native sketch-and-search framework.

A from-scratch rebuild of the capabilities of ekzhu/datasketch (reference:
``/root/reference``) designed TPU-first: sketch state is struct-of-arrays on
device, hot loops are JAX/XLA (with Pallas kernels on TPU), and scale-out is
``jax.sharding`` over a device mesh instead of Redis/Cassandra backends.

Public API parity target: ``/root/reference/datasketch/__init__.py:10-44``.
"""

from datasketch_tpu.hashfunc import (
    device_hash,
    sha1_hash32,
    sha1_hash64,
    xxhash_hash32,
)
from datasketch_tpu.models.minhash import MinHash
from datasketch_tpu.models.lean_minhash import LeanMinHash
from datasketch_tpu.models.weighted_minhash import (
    WeightedMinHash,
    WeightedMinHashGenerator,
)
from datasketch_tpu.models.hyperloglog import HyperLogLog, HyperLogLogPlusPlus
from datasketch_tpu.models.b_bit_minhash import bBitMinHash
from datasketch_tpu.models.lsh import MinHashLSH
from datasketch_tpu.models.lshforest import MinHashLSHForest
from datasketch_tpu.models.lshensemble import MinHashLSHEnsemble
from datasketch_tpu.models.lsh_bloom import MinHashLSHBloom
from datasketch_tpu.models.hnsw import HNSW
from datasketch_tpu.models.tpu_lsh import TpuMinHashLSH
from datasketch_tpu.models.tpu_ensemble import TpuMinHashLSHEnsemble
from datasketch_tpu.models.tpu_forest import TpuMinHashLSHForest
from datasketch_tpu.models.tpu_hnsw import TpuHNSW
from datasketch_tpu.models.tpu_bbit import TpuBBitIndex
from datasketch_tpu.models.lsh_bloom import TpuMinHashLSHBloom
from datasketch_tpu.aio import AsyncMinHashLSH  # instantiation gates optional deps
from datasketch_tpu.serving import FailoverIndex
from datasketch_tpu.storage import (
    ordered_storage,
    unordered_storage,
    DictListStorage,
    DictSetStorage,
)

# Aliases for MinHash LSH with WeightedMinHash, mirroring
# /root/reference/datasketch/__init__.py:24-25.
WeightedMinHashLSH = MinHashLSH
WeightedMinHashLSHForest = MinHashLSHForest

__version__ = "0.1.0"

__all__ = [
    "MinHash",
    "LeanMinHash",
    "WeightedMinHash",
    "WeightedMinHashGenerator",
    "HyperLogLog",
    "HyperLogLogPlusPlus",
    "bBitMinHash",
    "MinHashLSH",
    "WeightedMinHashLSH",
    "MinHashLSHForest",
    "WeightedMinHashLSHForest",
    "MinHashLSHEnsemble",
    "MinHashLSHBloom",
    "HNSW",
    "TpuMinHashLSH",
    "TpuMinHashLSHEnsemble",
    "TpuMinHashLSHForest",
    "TpuHNSW",
    "TpuBBitIndex",
    "TpuMinHashLSHBloom",
    "AsyncMinHashLSH",
    "FailoverIndex",
    "device_hash",
    "sha1_hash32",
    "sha1_hash64",
    "xxhash_hash32",
    "ordered_storage",
    "unordered_storage",
    "DictListStorage",
    "DictSetStorage",
]

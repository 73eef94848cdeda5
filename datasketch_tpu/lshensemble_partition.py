"""Drop-in submodule alias: the reference exposes
``datasketch.lshensemble_partition.optimal_partitions``
(`/root/reference/datasketch/lshensemble_partition.py:174`) as its own
importable module; forward to the vectorized implementation in
:mod:`datasketch_tpu.models.lshensemble`."""

from datasketch_tpu.models.lshensemble import (  # noqa: F401
    _best_partitions,
    _nfps_matrix,
    optimal_partitions,
)

"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "fetch_global", "init_distributed"]


def fetch_global(arr, mesh: Mesh) -> np.ndarray:
    """Full host copy of a device array, multi-process safe.

    On a single-process mesh this is a plain transfer. On a multi-process
    (DCN) mesh some shards live in OTHER processes and ``np.asarray``
    cannot materialize them; a replicating identity jit first collects
    the full array onto every process's devices (one cross-host
    all-gather), then the local replica is fetched.

    NOTE: the replicating jit is a COLLECTIVE — on a multi-process mesh
    EVERY process must reach this call in the same order (i.e. call
    save/host_snapshot/status from all processes, not just one), or the
    mesh deadlocks like any mismatched psum.
    """
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(*([None] * arr.ndim))
    rep = jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, spec)
    )(arr)
    return np.asarray(rep.addressable_data(0))


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data", "model"),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """Build a Mesh over the first ``n_devices`` available devices.

    Default is a 2-D ``(data, model)`` mesh: ``data`` shards document
    batches (the MapReduce axis of ``/root/reference/docs/minhash.rst:57-59``),
    ``model`` shards the permutation axis of signature construction
    (tensor parallelism — permutations are independent). If ``n_devices``
    is not divisible for a 2-D layout, the model axis degenerates to 1.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(
            "requested %d devices but only %d available" % (n_devices, len(devs))
        )
    devs = devs[:n_devices]
    if shape is None:
        if len(axis_names) == 2:
            model = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
            shape = (n_devices // model, model)
        else:
            shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n_devices:
        raise ValueError("mesh shape %r != n_devices %d" % (shape, n_devices))
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None) -> None:
    """Initialize multi-host JAX (DCN) before building cross-host meshes.

    Thin wrapper over ``jax.distributed.initialize`` so multi-pod
    deployments of :class:`~datasketch_tpu.parallel.ShardedMinHashLSH` use
    one entry point; all arguments auto-detect on Cloud TPU pods. Call once
    per process, before any device access.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)

"""Tracing and timing utilities.

The reference has no in-library profiling; its benchmarks wrap ops in
``time.perf_counter`` (``/root/reference/benchmark/sketches/
minhash_benchmark.py:19-23``). Here ``jax.profiler`` fills that role
(SURVEY.md §5), plus a timing helper that forces REAL completion: on
remote-attached TPUs ``block_until_ready`` can return before transfers
land, so we fetch a dependent scalar instead.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["trace", "time_op", "device_sync"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto.

    >>> with trace("/tmp/ds_trace"):
    ...     index.query_batch(queries)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(out) -> None:
    """Force actual completion of every array in `out` (pytree).

    Fetches one reduced scalar per leaf — unlike ``block_until_ready``,
    which on tunnel-attached devices may return before data movement
    completes. All reductions are dispatched first and fetched with ONE
    ``jax.device_get``: each separate blocking fetch pays a full tunnel
    round trip (~30ms), which would otherwise be attributed to the op
    being timed.
    """
    scalars = []
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype"):
            # sum/any have identities for empty arrays (max does not)
            if leaf.dtype == bool:
                scalars.append(jnp.any(leaf))
            else:
                scalars.append(jnp.sum(leaf))
    if scalars:
        jax.device_get(scalars)


def time_op(fn: Callable, *args, warmup: int = 1, iters: int = 3, **kwargs):
    """Best-of-`iters` wall time of ``fn(*args, **kwargs)`` with real sync.

    Returns (best_seconds, last_output).
    """
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
        device_sync(out)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out

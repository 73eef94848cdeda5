"""Dispatch pipelining for batched device serving.

A synchronous query pays a full host<->device round trip per batch
(~30ms through a remote-TPU tunnel, regardless of payload size — see
BASELINE.md round-2 notes). JAX dispatch is asynchronous, and device
arrays support ``copy_to_host_async``; keeping a few batches in flight
and starting D2H copies eagerly overlaps batch i's round trip with
batches i+1..i+depth's compute and transfer. This is the TPU-native
replacement for the reference's asyncio gather concurrency
(``/root/reference/datasketch/aio/lsh.py:269``): concurrency becomes
transfer/compute pipelining around one device.

Keep batch shapes uniform where possible: each distinct shape compiles
its own program.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Iterator

import jax

__all__ = ["stream_batches"]


def _start_copies(tree) -> None:
    for leaf in jax.tree_util.tree_leaves(tree):
        copy_async = getattr(leaf, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()


def stream_batches(
    batches: Iterable,
    dispatch: Callable,
    finish: Callable,
    depth: int = 4,
) -> Iterator:
    """Yield ``finish(dispatch(batch))`` per batch, pipelined.

    Args:
        batches: iterable of per-batch inputs.
        dispatch: batch -> pytree of device arrays (and static values);
            must not force any transfer. Called in order.
        finish: dispatched pytree -> final host result; this is where
            ``jax.device_get`` happens. Called in order, ``depth``
            batches behind dispatch.
        depth: max batches in flight.
    """
    if depth < 1:
        raise ValueError("depth must be >= 1")
    inflight: deque = deque()
    for batch in batches:
        out = dispatch(batch)
        _start_copies(out)
        inflight.append(out)
        if len(inflight) >= depth:
            yield finish(inflight.popleft())
    while inflight:
        yield finish(inflight.popleft())

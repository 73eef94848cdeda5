"""Deprecated alias package; see :mod:`datasketch_tpu.aio`.

Parity with ``/root/reference/datasketch/experimental/aio/lsh.py:31-49``.
"""

from datasketch_tpu.aio import AsyncMinHashLSH  # noqa: F401

__all__ = ["AsyncMinHashLSH"]

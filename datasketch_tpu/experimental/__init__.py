"""Deprecated forwarding shim to :mod:`datasketch_tpu.aio`.

Parity with ``/root/reference/datasketch/experimental/__init__.py:23-49``:
the reference's async classes originally lived under ``experimental.aio``
and are lazily forwarded (PEP 562) with a deprecation warning.
"""

import warnings


def __getattr__(name):
    if name == "aio":
        warnings.warn(
            "datasketch_tpu.experimental.aio is deprecated; "
            "use datasketch_tpu.aio instead",
            DeprecationWarning,
            stacklevel=2,
        )
        import datasketch_tpu.experimental.aio as aio

        return aio
    raise AttributeError(name)

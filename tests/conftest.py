"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's guidance — multi-device behavior is exercised with
``--xla_force_host_platform_device_count`` as the fake-backend analogue of
the reference's mocked Redis.

Note: this environment pre-imports jax at interpreter startup (sitecustomize
registers the TPU tunnel), so env vars alone are too late — we must flip the
platform via jax.config before any backend is resolved.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Subprocess device probes (utils/health.py) must not touch the real TPU
# tunnel from the test suite either.
os.environ["DATASKETCH_TPU_PROBE_PLATFORM"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Importing the package must never initialize a device backend.

Serving processes import ``datasketch_tpu`` long before they are ready to
pay (or able to survive) device-backend initialization: through a remote
tunnel a wedged device turns import-time initialization into an
unbounded hang before any user code — including the health probe — can
run. Regression: a module-level ``jnp.float32`` constant in
``ops/hnsw_ops.py`` once initialized the backend via the package
``__init__`` import chain.
"""

import subprocess
import sys

_CHECK_SRC = """
import sys
import datasketch_tpu  # must not resolve any backend
import datasketch_tpu.utils.health  # bench.py's pre-probe import
from jax._src import xla_bridge
sys.exit(1 if getattr(xla_bridge, "_backends", None) else 0)
"""


def test_package_import_initializes_no_backend():
    proc = subprocess.run(
        [sys.executable, "-c", _CHECK_SRC],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, (
        "importing datasketch_tpu initialized a jax backend "
        "(module-level device constant?): rc=%d\n%s"
        % (proc.returncode, proc.stderr[-500:])
    )

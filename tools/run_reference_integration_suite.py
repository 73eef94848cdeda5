"""Run the reference's INTEGRATION test suite against datasketch_tpu.

Completes the drop-in sweep across every reference test file:
``test_integration.py`` exercises MinHashLSH over live Redis and
Cassandra; here both services are replaced by the in-process fakes the
unit suites already use — a shared-state sync redis fake (reconnects see
earlier writes, ``scan_iter`` cleanup works) and the CQL-interpreting
Cassandra session from ``tests/test_cassandra_storage.py`` — with
``DO_TEST_REDIS`` / ``DO_TEST_CASSANDRA`` forced on.

Usage: python tools/run_reference_integration_suite.py [extra pytest args]
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))
from refsuite_common import rewrite  # noqa: E402
REF_TEST = pathlib.Path("/root/reference/test/test_integration.py")

CONFTEST = '''
import os
import sys
import types

sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

# ---------------------------------------------- shared-state sync redis
from tests.fake_redis import FakeRedis  # noqa: E402

_SERVERS = {{}}


class SharedFakeRedis:
    """Every client for the same (host, port) sees one store, and
    scan_iter/delete work for the tests' cleanup sweeps."""

    def __init__(self, host="localhost", port=6379, **kwargs):
        self._r = _SERVERS.setdefault((host, port), FakeRedis())

    def scan_iter(self, match=None):
        pat = match if isinstance(match, bytes) else str(match).encode()
        assert pat.endswith(b"*")
        prefix = pat[:-1]
        for k in list(self._r._lists) + list(self._r._sets):
            if k.startswith(prefix):
                yield k

    def __getattr__(self, name):
        return getattr(self._r, name)


redis_mod = types.ModuleType("redis")
redis_mod.Redis = SharedFakeRedis
sys.modules["redis"] = redis_mod

# ---------------------------------------------- fake cassandra cluster
from tests.test_cassandra_storage import (  # noqa: E402
    FakeCluster,
    FakeMonotonicTs,
    FakeSession,
    fake_execute_concurrent,
)

FakeCluster._session = FakeSession()

cass = types.ModuleType("cassandra")
cluster_mod = types.ModuleType("cassandra.cluster")
cluster_mod.Cluster = FakeCluster
cluster_mod.MonotonicTimestampGenerator = FakeMonotonicTs
concurrent_mod = types.ModuleType("cassandra.concurrent")
concurrent_mod.execute_concurrent = fake_execute_concurrent
cass.cluster = cluster_mod
cass.concurrent = concurrent_mod
sys.modules["cassandra"] = cass
sys.modules["cassandra.cluster"] = cluster_mod
sys.modules["cassandra.concurrent"] = concurrent_mod

os.environ["DO_TEST_REDIS"] = "true"
os.environ["DO_TEST_CASSANDRA"] = "true"
'''



def main() -> int:
    if not REF_TEST.exists():
        print("reference integration tests not found at", REF_TEST)
        return 2
    with tempfile.TemporaryDirectory(prefix="refint_") as tmp:
        tmpdir = pathlib.Path(tmp)
        (tmpdir / "test_integration.py").write_text(rewrite(REF_TEST.read_text()))
        (tmpdir / "conftest.py").write_text(CONFTEST.format(repo=str(REPO)))
        cmd = [
            sys.executable,
            "-m",
            "pytest",
            "-q",
            "-p",
            "no:cacheprovider",
            str(tmpdir / "test_integration.py"),
            *sys.argv[1:],
        ]
        return subprocess.call(cmd, cwd=tmpdir)


if __name__ == "__main__":
    raise SystemExit(main())

"""Run the reference library's own test suite against datasketch_tpu.

The strongest drop-in-parity check we have: copies /root/reference/test
into a temp dir at runtime (nothing is committed), rewrites `datasketch`
imports to `datasketch_tpu` (submodule aliases make them resolve), stubs
mockredis with our in-process fake, and runs pytest. Integration tests
needing real services (test_integration, aio) and CuPy GPU tests are
excluded, as the reference itself gates them behind env flags.

Usage: python tools/run_reference_suite.py [extra pytest args]
Status at round 1: 157/157 pass.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))
from refsuite_common import rewrite  # noqa: E402
REF_TESTS = pathlib.Path("/root/reference/test")

FILES = [
    "utils.py",
    "test_minhash.py",
    "test_lean_minhash.py",
    "test_hyperloglog.py",
    "test_weighted_minhash.py",
    "test_lsh.py",
    "test_lshforest.py",
    "test_lshensemble.py",
    "test_hnsw.py",
    "test_lshbloom.py",
]

CONFTEST = '''
import os
import sys
import types

sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

from tests.fake_redis import FakeRedis  # noqa: E402

mockredis = types.ModuleType("mockredis")
mockredis.mock_redis_client = lambda **kw: FakeRedis()
sys.modules.setdefault("mockredis", mockredis)
redis_mod = types.ModuleType("redis")
redis_mod.Redis = FakeRedis
sys.modules.setdefault("redis", redis_mod)
'''



def main() -> int:
    if not REF_TESTS.exists():
        print("reference tests not found at", REF_TESTS)
        return 2
    with tempfile.TemporaryDirectory(prefix="refsuite_") as tmp:
        tmpdir = pathlib.Path(tmp)
        copied = []
        for name in FILES:
            src = REF_TESTS / name
            if not src.exists():
                continue  # older reference checkouts lack some files
            (tmpdir / name).write_text(rewrite(src.read_text()))
            copied.append(name)
        (tmpdir / "conftest.py").write_text(CONFTEST.format(repo=str(REPO)))
        # only list files that were actually copied: a missing path in
        # argv is a pytest usage error (rc=4, nothing runs at all)
        targets = [str(tmpdir / n) for n in copied if n.startswith("test_")]
        if not targets:
            print("no reference test files found to run")
            return 2
        cmd = [
            sys.executable,
            "-m",
            "pytest",
            "-q",
            "-p",
            "no:cacheprovider",
            *targets,
            *sys.argv[1:],
        ]
        return subprocess.call(cmd, cwd=tmpdir)


if __name__ == "__main__":
    raise SystemExit(main())

"""Run the reference's ASYNC test suite against datasketch_tpu.

Extends the drop-in-parity proof of ``run_reference_suite.py`` to the
asyncio side: copies ``/root/reference/test/aio/test_lsh.py`` into a
temp dir, rewrites ``datasketch`` imports, and runs it with

- in-process fakes for ``redis.asyncio`` / ``motor`` / ``pymongo`` whose
  SERVER STATE is process-shared (reconnects after pickling see the same
  data, exactly like the live services the tests were written against),
- a minimal pytest-asyncio stand-in (the package isn't in this image):
  coroutine tests run under ``asyncio.run``; async-generator fixtures are
  wrapped into sync generators driving their own event loops,
- ``DO_TEST_REDIS`` / ``DO_TEST_MONGO`` forced on so the parametrized
  storage fixtures run instead of skipping.

Usage: python tools/run_reference_aio_suite.py [extra pytest args]
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))
from refsuite_common import rewrite  # noqa: E402
REF_AIO = pathlib.Path("/root/reference/test/aio/test_lsh.py")

CONFTEST = '''
import asyncio
import inspect
import os
import sys
import types

import pytest

sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

# ------------------------------------------------ shared-state redis fake
# Server state lives in a process-global registry keyed by (host, port):
# a client created after unpickling sees the data earlier clients wrote,
# matching the live server the reference tests assume.
from tests.fake_redis import FakeRedis  # noqa: E402

_SERVERS = {{}}


def _server(host, port):
    return _SERVERS.setdefault((host, port), FakeRedis())


class FakeAsyncPipeline:
    def __init__(self, client):
        self._client = client
        self._ops = []

    def __getattr__(self, name):
        async def queue(*args, **kwargs):
            self._ops.append((name, args, kwargs))

        return queue

    async def execute(self):
        ops, self._ops = self._ops, []
        return [
            getattr(self._client._r, n)(*a, **k) for n, a, k in ops
        ]


class FakeAsyncRedis:
    def __init__(self, host="localhost", port=6379, **kwargs):
        self._r = _server(host, port)

    def pipeline(self, *args, **kwargs):
        return FakeAsyncPipeline(self)

    async def aclose(self):
        return None

    async def scan_iter(self, match=None):
        pat = match if isinstance(match, bytes) else str(match).encode()
        assert pat.endswith(b"*")
        prefix = pat[:-1]
        for k in list(self._r._lists) + list(self._r._sets):
            if k.startswith(prefix):
                yield k

    def __getattr__(self, name):
        fn = getattr(self._r, name)

        async def call(*args, **kwargs):
            return fn(*args, **kwargs)

        return call


redis_mod = types.ModuleType("redis")
redis_aio_mod = types.ModuleType("redis.asyncio")
redis_aio_mod.Redis = FakeAsyncRedis
redis_mod.asyncio = redis_aio_mod
redis_mod.Redis = FakeRedis
sys.modules["redis"] = redis_mod
sys.modules["redis.asyncio"] = redis_aio_mod

# ------------------------------------------------ motor / pymongo fakes
from tests import fake_motor  # noqa: E402

fake_motor.FakeMotorClient._dbs = {{}}  # class-level: shared across clients

motor_mod = types.ModuleType("motor")
motor_asyncio_mod = types.ModuleType("motor.motor_asyncio")
motor_asyncio_mod.AsyncIOMotorClient = fake_motor.FakeMotorClient
motor_mod.motor_asyncio = motor_asyncio_mod
sys.modules["motor"] = motor_mod
sys.modules["motor.motor_asyncio"] = motor_asyncio_mod


class FakePyMongoClient:
    def __init__(self, *args, **kwargs):
        pass

    def drop_database(self, name):
        fake_motor.FakeMotorClient._dbs.pop(name, None)


pymongo_mod = types.ModuleType("pymongo")
pymongo_mod.MongoClient = FakePyMongoClient
pymongo_mod.InsertOne = fake_motor.FakeInsertOne
pymongo_mod.UpdateOne = fake_motor.FakeUpdateOne
pymongo_mod.DeleteMany = fake_motor.FakeDeleteMany
pymongo_mod.DeleteOne = fake_motor.FakeDeleteOne
sys.modules["pymongo"] = pymongo_mod

os.environ["DO_TEST_REDIS"] = "true"
os.environ["DO_TEST_MONGO"] = "true"


# ------------------------------------- minimal pytest-asyncio stand-in
def pytest_pyfunc_call(pyfuncitem):
    fn = pyfuncitem.obj
    if inspect.iscoroutinefunction(fn):
        names = set(inspect.signature(fn).parameters)
        kwargs = {{
            k: v for k, v in pyfuncitem.funcargs.items() if k in names
        }}
        asyncio.run(fn(**kwargs))
        return True
    return None


@pytest.hookimpl(hookwrapper=True)
def pytest_fixture_setup(fixturedef, request):
    func = fixturedef.func
    if inspect.isasyncgenfunction(func):
        def wrapper(*args, **kwargs):
            agen = func(*args, **kwargs)
            # hand the fixture's yielded VALUE through (a bare yield
            # would silently give dependent tests None)
            yield asyncio.run(agen.__anext__())
            try:
                asyncio.run(agen.__anext__())
            except StopAsyncIteration:
                pass

        wrapper.__signature__ = inspect.signature(func)
        wrapper.__name__ = getattr(func, "__name__", "wrapped")
        fixturedef.func = wrapper
    elif inspect.iscoroutinefunction(func):
        def wrapper(*args, **kwargs):
            return asyncio.run(func(*args, **kwargs))

        wrapper.__signature__ = inspect.signature(func)
        wrapper.__name__ = getattr(func, "__name__", "wrapped")
        fixturedef.func = wrapper
    yield
'''



def main() -> int:
    if not REF_AIO.exists():
        print("reference aio tests not found at", REF_AIO)
        return 2
    with tempfile.TemporaryDirectory(prefix="refaio_") as tmp:
        tmpdir = pathlib.Path(tmp)
        (tmpdir / "test_aio_lsh.py").write_text(rewrite(REF_AIO.read_text()))
        (tmpdir / "conftest.py").write_text(CONFTEST.format(repo=str(REPO)))
        cmd = [
            sys.executable,
            "-m",
            "pytest",
            "-q",
            "-p",
            "no:cacheprovider",
            str(tmpdir / "test_aio_lsh.py"),
            *sys.argv[1:],
        ]
        return subprocess.call(cmd, cwd=tmpdir)


if __name__ == "__main__":
    raise SystemExit(main())

"""Multi-host (DCN) simulation: two real processes over jax.distributed.

The reference's multi-process story is a shared Redis/Cassandra keyspace
(``/root/reference/datasketch/storage.py:819+``, ``docs/lsh.rst:97-232``);
SURVEY §2.4 maps it to ICI collectives inside a pod plus
``jax.distributed`` across pods. The ICI half is covered by the virtual
8-device mesh everywhere else in this suite; THIS file covers the DCN
half: ``init_distributed`` (parallel/mesh.py) is exercised by two real
subprocesses that form one 8-device global mesh over a localhost
coordinator (4 virtual CPU devices each), run cross-process collectives,
build and query a ShardedMinHashLSH whose documents span both processes,
and hand an index off via save -> load onto a different mesh shape.

The real-pod recipe is documented in docs/parallel.md.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh_and_index_handoff(tmp_path):
    # bound: the two sequential communicate(timeout=240) calls below
    # (pytest-timeout is not installed in this environment)
    port = _free_port()
    env = dict(os.environ)
    # fresh workers must not inherit the parent's pytest CPU-mesh flags
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(port), str(pid), "2",
             str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "collective OK" in out
        assert "global-mesh index OK" in out
        assert "handoff OK" in out
        assert "forest+ensemble OK" in out

"""Device healthcheck: bounded probes, failure accounting."""

import time

from datasketch_tpu.utils import HealthMonitor, device_healthcheck


def test_healthcheck_ok_inprocess():
    res = device_healthcheck(timeout=30.0, isolate=False)
    assert res["ok"] and res["latency_s"] is not None and res["error"] is None


def test_healthcheck_ok_subprocess():
    # child pays interpreter + jax import; CPU devices answer fast
    res = device_healthcheck(timeout=120.0, isolate=True)
    assert res["ok"], res
    assert res["latency_s"] is not None


def test_healthcheck_subprocess_timeout_bound(monkeypatch):
    """A wedged probe child must be killed at the bound — this is the
    path that works even when the hung dispatch HOLDS THE GIL."""
    import datasketch_tpu.utils.health as health

    monkeypatch.setattr(health, "_PROBE_SRC", "import time; time.sleep(60)")
    t0 = time.perf_counter()
    res = device_healthcheck(timeout=1.0, isolate=True)
    assert time.perf_counter() - t0 < 10
    assert not res["ok"] and "exceeded" in res["error"]


def test_healthcheck_subprocess_timeout_with_pipe_holding_grandchild(
    monkeypatch,
):
    """Killing the probe child must not wait on pipe EOF: a runtime helper
    process that inherits the child's stdout would hold it open forever
    (the subprocess.run(capture_output=...) drain hazard)."""
    import datasketch_tpu.utils.health as health

    grandchild_src = (
        "import subprocess, sys, time\n"
        # grandchild inherits stdout/stderr and outlives the child's kill
        "subprocess.Popen([sys.executable, '-c', 'import time; time.sleep(60)'])\n"
        "time.sleep(60)\n"
    )
    monkeypatch.setattr(health, "_PROBE_SRC", grandchild_src)
    t0 = time.perf_counter()
    res = device_healthcheck(timeout=1.0, isolate=True)
    assert time.perf_counter() - t0 < 10
    assert not res["ok"] and "exceeded" in res["error"]


def test_healthcheck_subprocess_crash_reported(monkeypatch):
    import datasketch_tpu.utils.health as health

    monkeypatch.setattr(
        health, "_PROBE_SRC", "import sys; sys.stderr.write('boom'); sys.exit(3)"
    )
    res = device_healthcheck(timeout=30.0, isolate=True)
    assert not res["ok"] and "rc=3" in res["error"] and "boom" in res["error"]


def test_healthcheck_thread_timeout_bound(monkeypatch):
    """The in-process path bounds hangs that release the GIL."""
    import datasketch_tpu.utils.health as health

    real_thread = health.threading.Thread

    class HangingThread(real_thread):
        def run(self):
            time.sleep(60)  # simulate a wedged device probe

    monkeypatch.setattr(health.threading, "Thread", HangingThread)
    t0 = time.perf_counter()
    res = device_healthcheck(timeout=0.2, isolate=False)
    assert time.perf_counter() - t0 < 5
    assert not res["ok"] and "exceeded" in res["error"]


def test_monitor_failure_accounting(monkeypatch):
    import datasketch_tpu.utils.health as health

    outcomes = iter([False, False, False, True])

    def fake_check(timeout, device=None, isolate=True):
        ok = next(outcomes)
        return {"ok": ok, "latency_s": 0.01 if ok else None,
                "error": None if ok else "boom"}

    monkeypatch.setattr(health, "device_healthcheck", fake_check)
    mon = HealthMonitor(max_failures=3)
    mon.check(); mon.check()
    assert not mon.unhealthy and mon.consecutive_failures == 2
    mon.check()
    assert mon.unhealthy
    mon.check()
    assert not mon.unhealthy and mon.consecutive_failures == 0
    st = mon.status()
    assert st["checks"] == 4 and st["median_latency_s"] == 0.01

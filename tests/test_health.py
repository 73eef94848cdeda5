"""Device healthcheck: bounded probes, failure accounting."""

import time

from datasketch_tpu.utils import HealthMonitor, device_healthcheck


def test_healthcheck_ok_on_cpu():
    res = device_healthcheck(timeout=30.0)
    assert res["ok"] and res["latency_s"] is not None and res["error"] is None


def test_healthcheck_timeout_bound(monkeypatch):
    """A hung dispatch must come back within the bound, not block."""
    import datasketch_tpu.utils.health as health

    real_thread = health.threading.Thread

    class HangingThread(real_thread):
        def run(self):
            time.sleep(60)  # simulate a wedged device probe

    monkeypatch.setattr(health.threading, "Thread", HangingThread)
    t0 = time.perf_counter()
    res = device_healthcheck(timeout=0.2)
    assert time.perf_counter() - t0 < 5
    assert not res["ok"] and "exceeded" in res["error"]


def test_monitor_failure_accounting(monkeypatch):
    import datasketch_tpu.utils.health as health

    outcomes = iter([False, False, False, True])

    def fake_check(timeout, device=None):
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

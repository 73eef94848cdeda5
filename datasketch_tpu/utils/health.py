"""Device failure detection for serving deployments.

The reference library has no failure detection (SURVEY.md §5) — its
closest analogue is storage reconnect-on-unpickle. A device-resident
index has a different failure mode: a wedged accelerator (or the tunnel
to a remote-attached one) makes every dispatch HANG rather than raise,
so a serving process silently stops answering. ``device_healthcheck``
turns that hang into a bounded, reportable diagnosis, and
``HealthMonitor`` tracks consecutive failures for load-balancer-style
eviction decisions.

Observed in practice (BASELINE.md round-2 notes): two processes sharing
one remote TPU tunnel can wedge the server such that even
``jnp.asarray([1, 2, 3])`` blocks indefinitely in fresh processes.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time
from typing import Optional

__all__ = ["device_healthcheck", "HealthMonitor"]

# Child probe: measures only the device op (imports excluded), prints one
# JSON line, and os._exit's so a post-probe PJRT teardown can't hang it.
# DATASKETCH_TPU_PROBE_PLATFORM forces the child's backend via
# jax.config (the only override that sticks when a remote-TPU plugin is
# pre-registered by sitecustomize — env JAX_PLATFORMS is not enough);
# tests set it to "cpu" so probes never touch real hardware.
_PROBE_SRC = """
import json, os, time
import jax
_p = os.environ.get("DATASKETCH_TPU_PROBE_PLATFORM")
if _p:
    jax.config.update("jax_platforms", _p)
import jax.numpy as jnp
t0 = time.perf_counter()
x = jnp.asarray([1.0, 2.0, 3.0])
_d = os.environ.get("DATASKETCH_TPU_PROBE_DEVICE_ID")
if _d is not None:
    matches = [d for d in jax.devices() if d.id == int(_d)]
    if not matches:
        print(json.dumps({"ok": False, "latency_s": None,
                          "error": "no device with id %s" % _d}), flush=True)
        os._exit(0)
    x = jax.device_put(x, matches[0])
v = float(x.sum())
out = {"ok": v == 6.0, "latency_s": time.perf_counter() - t0}
if v != 6.0:
    out["error"] = "wrong result: %r" % v
print(json.dumps(out), flush=True)
os._exit(0)
"""


def device_healthcheck(timeout: Optional[float] = None, device=None,
                       isolate: bool = True) -> dict:
    """Probe a device with a trivial dependent op, bounded by `timeout`.

    Default timeout: 120s for ``isolate=True`` (the bound covers the
    child's WHOLE lifetime — interpreter + jax import ~5-10s plus a
    30-90s cold-tunnel first dispatch on a HEALTHY device), 10s for the
    in-process thread probe (the backend is already warm there). A 10s
    subprocess bound would reliably flunk a healthy-but-cold device.

    ``isolate=True`` (default) probes in a SUBPROCESS: a wedged device
    can block inside a C call while holding the GIL (observed on a
    remote-TPU tunnel), in which case no in-process thread or signal can
    fire — killing a child process is the only reliable bound. Costs
    interpreter + jax import (~5-10s) per probe; the reported latency
    covers only the device op itself.

    ``isolate=False`` probes in a daemon thread — near-zero overhead for
    high-frequency monitoring of a device that is currently healthy, but
    only bounds hangs that happen with the GIL released, and interpreter
    exit after a failed probe may then hang in PJRT atexit teardown
    (flush output and use ``os._exit`` to exit for certain).

    CAUTION (remote-attached devices): an ``isolate=True`` probe is a
    SECOND process on the same tunnel. On the axon remote-TPU setup two
    processes dispatching concurrently can wedge the server itself, so
    from a live serving process run subprocess probes only while the
    parent is quiescent (between batches — where a serving loop naturally
    calls its health check), or use ``isolate=False`` for in-flight
    monitoring and reserve the subprocess probe for confirming a
    suspected hang.

    Returns ``{"ok": bool, "latency_s": float | None, "error": str | None}``.
    """
    if timeout is None:
        timeout = 120.0 if isolate else 10.0
    if isolate:
        result = {"ok": False, "latency_s": None, "error": None}
        # Child stdout/stderr go to TEMP FILES, not pipes, and the child
        # gets its own process group: a runtime plugin can spawn helper
        # processes that inherit the pipes, so after a timeout-kill of the
        # direct child a pipe drain (subprocess.run's behavior) blocks on
        # the still-open write end — observed as a probe that outlived its
        # own bound by minutes on a wedged tunnel. killpg + files cannot.
        env = None
        if device is not None:
            # the child probes a SPECIFIC device by id (a Device object
            # cannot cross the process boundary)
            env = dict(os.environ)
            env["DATASKETCH_TPU_PROBE_DEVICE_ID"] = str(device.id)
        with tempfile.TemporaryFile() as out_f, \
                tempfile.TemporaryFile() as err_f:
            try:
                proc = subprocess.Popen(
                    [sys.executable, "-c", _PROBE_SRC],
                    stdout=out_f,
                    stderr=err_f,
                    start_new_session=True,
                    env=env,
                )
            except Exception as exc:  # noqa: BLE001 - report, don't crash
                result["error"] = repr(exc)
                return result
            try:
                rc = proc.wait(timeout=timeout)
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    proc.kill()
                proc.wait()
                result["error"] = (
                    f"device probe exceeded {timeout}s (hung dispatch)"
                )
                return result
            out_f.seek(0)
            stdout = out_f.read().decode("utf-8", "replace").strip()
            err_f.seek(0)
            stderr = err_f.read().decode("utf-8", "replace").strip()
        line = stdout.splitlines()[-1] if stdout else ""
        try:
            result.update(json.loads(line))
        except Exception:
            result["error"] = "probe exited rc=%d: %s" % (rc, stderr[-300:])
        return result
    # The probe thread writes its OWN dict; the returned dict is built
    # after the wait. A late-finishing thread must not mutate the
    # already-returned timeout verdict into a self-contradictory one.
    probe_result: dict = {"ok": False, "latency_s": None, "error": None}
    done = threading.Event()

    def _probe() -> None:
        try:
            import jax
            import jax.numpy as jnp

            t0 = time.perf_counter()
            x = jnp.asarray([1.0, 2.0, 3.0])
            if device is not None:
                x = jax.device_put(x, device)
            # dependent scalar fetch: block_until_ready on tunnel
            # transfers can return before bytes land
            value = float(x.sum())
            if value != 6.0:
                probe_result["error"] = f"wrong result: {value}"
            else:
                probe_result["ok"] = True
                probe_result["latency_s"] = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001 - report, don't crash
            probe_result["error"] = repr(exc)
        finally:
            done.set()

    thread = threading.Thread(target=_probe, daemon=True)
    thread.start()
    if not done.wait(timeout):
        return {
            "ok": False,
            "latency_s": None,
            "error": f"device probe exceeded {timeout}s (hung dispatch)",
        }
    return dict(probe_result)


class HealthMonitor:
    """Consecutive-failure tracker around :func:`device_healthcheck`.

    >>> mon = HealthMonitor(max_failures=3)
    >>> if not mon.check()["ok"] and mon.unhealthy:
    ...     evict_replica()
    """

    def __init__(self, timeout: Optional[float] = None, max_failures: int = 3,
                 device=None, isolate: bool = True) -> None:
        # None -> device_healthcheck's mode-appropriate default (120s for
        # subprocess probes; a 10s default would falsely evict a healthy
        # cold device whose first dispatch takes 30-90s)
        self.timeout = timeout
        self.max_failures = max_failures
        self.device = device
        self.isolate = isolate
        self.consecutive_failures = 0
        self.last_result: Optional[dict] = None
        self.history: list = []  # (timestamp, ok, latency_s)

    def check(self) -> dict:
        result = device_healthcheck(self.timeout, self.device,
                                    isolate=self.isolate)
        self.last_result = result
        self.history.append((time.time(), result["ok"], result["latency_s"]))
        if len(self.history) > 256:
            del self.history[:-256]
        if result["ok"]:
            self.consecutive_failures = 0
        else:
            self.consecutive_failures += 1
        return result

    @property
    def unhealthy(self) -> bool:
        return self.consecutive_failures >= self.max_failures

    def status(self) -> dict:
        ok_lat = [l for _, ok, l in self.history if ok and l is not None]
        return {
            "checks": len(self.history),
            "consecutive_failures": self.consecutive_failures,
            "unhealthy": self.unhealthy,
            "median_latency_s": (
                sorted(ok_lat)[len(ok_lat) // 2] if ok_lat else None
            ),
            "last": self.last_result,
        }

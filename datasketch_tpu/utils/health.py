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

import threading
import time
from typing import Optional

__all__ = ["device_healthcheck", "HealthMonitor"]


def device_healthcheck(timeout: float = 10.0, device=None) -> dict:
    """Probe a device with a trivial dependent op, bounded by `timeout`.

    Runs the probe in a daemon thread: a healthy device answers in
    milliseconds (~30ms through a remote tunnel); a wedged one never
    answers, and the bound converts that into ``ok=False``.

    Returns ``{"ok": bool, "latency_s": float | None, "error": str | None}``.
    Note: a timed-out probe thread cannot be cancelled — it parks on the
    hung dispatch until the process exits (daemon thread, harmless).
    """
    result: dict = {"ok": False, "latency_s": None, "error": None}
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
                result["error"] = f"wrong result: {value}"
            else:
                result["ok"] = True
                result["latency_s"] = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001 - report, don't crash
            result["error"] = repr(exc)
        finally:
            done.set()

    thread = threading.Thread(target=_probe, daemon=True)
    thread.start()
    if not done.wait(timeout):
        result["error"] = f"device probe exceeded {timeout}s (hung dispatch)"
    return result


class HealthMonitor:
    """Consecutive-failure tracker around :func:`device_healthcheck`.

    >>> mon = HealthMonitor(max_failures=3)
    >>> if not mon.check()["ok"] and mon.unhealthy:
    ...     evict_replica()
    """

    def __init__(self, timeout: float = 10.0, max_failures: int = 3,
                 device=None) -> None:
        self.timeout = timeout
        self.max_failures = max_failures
        self.device = device
        self.consecutive_failures = 0
        self.last_result: Optional[dict] = None
        self.history: list = []  # (timestamp, ok, latency_s)

    def check(self) -> dict:
        result = device_healthcheck(self.timeout, self.device)
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

"""Background tunnel watcher: probe until the axon tunnel heals, then
run the full evidence recapture (`tools/tpu_recapture.py`) exactly once.

Writes state to tpu_evidence/watch.log and drops a marker file
tpu_evidence/RECAPTURE_RUNNING while the capture is in flight so a
human/agent knows not to start another TPU process (one-TPU-process
rule, CLAUDE.md). Exits after a successful capture or when
--max-hours elapses.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tpu_evidence")
MARKER = os.path.join(OUT, "RECAPTURE_RUNNING")
DONE = os.path.join(OUT, "RECAPTURE_DONE")


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(os.path.join(OUT, "watch.log"), "a") as f:
        f.write(line + "\n")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    max_hours = 12.0
    for a in sys.argv[1:]:
        if a.startswith("--max-hours="):
            max_hours = float(a.split("=", 1)[1])
    sys.path.insert(0, ROOT)
    from datasketch_tpu.utils.health import device_healthcheck

    t0 = time.time()
    attempt = 0
    while time.time() - t0 < max_hours * 3600:
        attempt += 1
        res = device_healthcheck(timeout=150, isolate=True)
        log(f"probe #{attempt}: {res}")
        if res.get("ok"):
            log("tunnel HEALTHY — starting recapture")
            open(MARKER, "w").write(str(time.time()))
            rc = None
            try:
                # Own session + killpg on timeout: recapture runs its
                # benchmarks in nested subprocesses, and killing only
                # the direct child would orphan a TPU-touching
                # grandchild on the tunnel while the watcher starts
                # another (one-TPU-process rule; same pattern as
                # utils.device_healthcheck).
                proc = subprocess.Popen(
                    [sys.executable, os.path.join(ROOT, "tools", "tpu_recapture.py"),
                     "--skip-probe"],
                    cwd=ROOT, start_new_session=True,
                )
                try:
                    rc = proc.wait(timeout=3 * 3600)
                except subprocess.TimeoutExpired:
                    log("recapture TIMED OUT after 3h — killing process group")
                    import signal

                    try:
                        os.killpg(proc.pid, signal.SIGKILL)
                    except ProcessLookupError:
                        pass
                    try:
                        proc.wait(timeout=60)
                    except subprocess.TimeoutExpired:
                        # a child stuck in uninterruptible I/O on the
                        # wedged tunnel can survive SIGKILL for a while;
                        # log it as such (not as a crash) and move on
                        log("recapture unkillable 60s after killpg "
                            "(uninterruptible I/O?) — abandoning it")
            except Exception as exc:
                log(f"recapture crashed: {exc!r}")
            finally:
                os.remove(MARKER)
            if rc == 0:
                # DONE means SUCCEEDED — readers gate on it, so only a
                # zero exit earns the marker.
                open(DONE, "w").write(str(time.time()))
                log("recapture finished -> tpu_evidence/")
                return
            log(f"recapture failed (rc={rc}); will retry next probe")
        time.sleep(900)
    log("max hours elapsed, tunnel never healed")


if __name__ == "__main__":
    main()

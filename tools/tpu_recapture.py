"""One-command real-TPU evidence recapture, for the moment the tunnel heals.

The axon tunnel has been observed wedged for >24h at a stretch
(BASELINE.md round-2/3 notes); when it comes back, this script captures
every TPU-blocked artifact in priority order, ONE process at a time
(concurrent tunnel users are what wedge it), each step bounded:

1. health probe (subprocess-isolated; aborts the run if unhealthy)
2. ``python bench.py``            -> tpu_evidence/bench.json
3. ``benchmarks/compile_times.py`` -> tpu_evidence/compile_times.md
4. ``benchmarks/scale_benchmark.py 1000000 1024``
5. ``benchmarks/jaccard_topk.py 2000`` + ``jaccard_threshold.py 2000``
6. device-hash end-to-end sigs/s on a pre-tokenized corpus

Usage: python tools/tpu_recapture.py [--skip-probe]
Everything is logged under ``tpu_evidence/`` with wall times; paste the
numbers into BASELINE.md / docs/tpu.md afterwards.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "tpu_evidence")


def run(name: str, argv, timeout: int) -> str:
    """Run one step in a FRESH process (never concurrently), capture to
    a file (a wedged child is killed by timeout; output survives)."""
    path = os.path.join(OUT, name + ".log")
    print(f"--- {name}: {' '.join(argv)} (timeout {timeout}s)", flush=True)
    t0 = time.time()
    with open(path, "w") as f:
        try:
            subprocess.run(
                argv, stdout=f, stderr=subprocess.STDOUT, timeout=timeout,
                cwd=ROOT, check=False,
            )
        except subprocess.TimeoutExpired:
            f.write("\n*** TIMED OUT after %ds\n" % timeout)
    dt = time.time() - t0
    out = open(path).read()
    print(out[-1500:])
    print(f"--- {name} done in {dt:.0f}s -> {path}", flush=True)
    return out


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    py = sys.executable

    if "--skip-probe" not in sys.argv:
        sys.path.insert(0, ROOT)
        from datasketch_tpu.utils.health import device_healthcheck

        res = device_healthcheck(timeout=150, isolate=True)
        print("probe:", res, flush=True)
        if not res["ok"]:
            print("tunnel still wedged — nothing to capture", flush=True)
            return

    # evidence recaptures want every row even on a cold tunnel; the
    # 300s default budget is the driver-run contract, not this one's
    os.environ.setdefault("DATASKETCH_BENCH_BUDGET", "900")
    out = run("bench", [py, "bench.py"], 1200)
    for line in out.splitlines():
        if line.startswith("{"):
            with open(os.path.join(OUT, "bench.json"), "w") as f:
                f.write(line + "\n")
            rec = json.loads(line)
            print("bench device:", rec.get("device"),
                  "sigs/s:", rec.get("value"), flush=True)
    run("compile_times", [py, "benchmarks/compile_times.py"], 1800)
    run("scale_1m",
        [py, "benchmarks/scale_benchmark.py", "1000000", "1024"], 1800)
    run("topk_2k", [py, "benchmarks/jaccard_topk.py", "2000"], 1200)
    # round-5 incremental-insert evidence (BASELINE promised the TPU
    # capture of the CPU-measured 0.14 cost ratio on heal)
    run("hnsw_incremental",
        [py, "benchmarks/hnsw_incremental.py", "20000"], 1800)
    run("threshold_2k",
        [py, "benchmarks/jaccard_threshold.py", "2000"], 1200)
    run(
        "device_hash_rate",
        [py, "-c", (
            "import sys, time, numpy as np; sys.path.insert(0, '.');\n"
            "from datasketch_tpu import MinHash\n"
            "rng = np.random.RandomState(7)\n"
            "docs = [rng.randint(0, 1 << 31, 200).astype(np.uint32)"
            " for _ in range(16384)]\n"
            "MinHash.bulk_signatures(docs[:256], num_perm=128,"
            " hashfunc='device')\n"
            "best = 1e9\n"
            "for _ in range(3):\n"
            "    t0 = time.perf_counter()\n"
            "    MinHash.bulk_signatures(docs, num_perm=128,"
            " hashfunc='device')\n"
            "    best = min(best, time.perf_counter() - t0)\n"
            "print('device-hash sigs/s:', round(len(docs) / best, 1))\n"
        )],
        1200,
    )
    print("ALL CAPTURED ->", OUT, flush=True)


if __name__ == "__main__":
    main()

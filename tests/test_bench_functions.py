"""The driver runs bench.py unattended at round end — pin its helper
functions on the CPU mesh (small shapes) so a broken helper can never
take down the only perf artifact of a round."""

from __future__ import annotations

import importlib.util
import os
import sys


def _load_bench():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_module", os.path.join(root, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, root)
    spec.loader.exec_module(mod)
    return mod


def test_bench_helpers_smoke():
    bench = _load_bench()
    scale = bench.bench_lsh_scale(n_docs=2048, n_queries=32, k=5)
    assert scale["queries_per_sec"] > 0
    assert 0.0 <= scale["recall_at_10"] <= 1.0
    assert scale["build_docs_per_sec"] > 0

    util = bench.bench_kernel_utilization("cpu-fallback")
    assert util["achieved_uint32_gops"] > 0
    assert "vpu_utilization" not in util  # roofline is TPU-only

    lsh = bench.bench_lsh_topk(n_sets=300, n_queries=10, k=5)
    assert lsh["queries_per_sec"] > 0
    assert 0.0 <= lsh["recall_at_10"] <= 1.0

    bbit = bench.bench_bbit_scan(n_docs=2048, n_queries=32, k=5)
    assert bbit["queries_per_sec"] > 0
    assert 0.0 <= bbit["recall_at_10"] <= 1.0
    assert bbit["compression_x"] == 32.0

    corpus = bench.make_corpus(64)
    assert bench.bench_ours(corpus) > 0

    rows = bench.bench_fast_rows(32, chars_per_doc=128, passes=1,
                                 iters=1)
    for key in ("xxh32", "device_ids", "device_ids_u16", "text_sha1",
                "text_device"):
        assert rows[key + "_docs_per_sec"] > 0, key

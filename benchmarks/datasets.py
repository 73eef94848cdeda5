"""Real-dataset loader for the set-similarity-search benchmark corpora.

The reference harness pulls ekzhu/set-similarity-search-benchmark files
(``/root/reference/benchmark/indexes/jaccard/utils.py:28-61``): one set per
line, ``<size>\\t<comma-separated integer tokens>``, first line(s) a header.
This environment has no network egress, so the loader reads a LOCAL copy —
point ``DATASKETCH_BENCH_DATA`` (or pass a path) at e.g.
``FLICKR-london2y-both.inp`` / ``canada_us_uk_opendata.inp`` (``.gz``
handled transparently). Benchmarks fall back to the synthetic generator in
:mod:`benchmarks.utils` when no dataset is configured.
"""

from __future__ import annotations

import gzip
import os
import random

import numpy as np

ENV_VAR = "DATASKETCH_BENCH_DATA"


def dataset_path() -> str | None:
    """The configured real-dataset file, or None (synthetic fallback)."""
    path = os.environ.get(ENV_VAR)
    return path if path and os.path.exists(path) else None


def read_sets(path: str, sample_ratio: float = 1.0, skip: int = 1,
              max_sets: int | None = None):
    """Parse a set-similarity-search-benchmark ``.inp``/``.inp.gz`` file.

    Returns (sets, keys): sets are sorted unique int64 arrays (the same
    representation :mod:`benchmarks.utils` produces), keys are the source
    line numbers (reference protocol).
    """
    opener = gzip.open if path.endswith(".gz") else open
    sets, keys = [], []
    rng = random.Random(41)  # reference seeds random(41) for sampling
    with opener(path, "rt") as f:
        for i, line in enumerate(f):
            if i < skip:
                continue
            if sample_ratio < 1.0 and rng.random() > sample_ratio:
                continue
            parts = line.strip().split("\t")
            if len(parts) < 2 or not parts[1]:
                continue  # blank/trailing/malformed line: skip, don't abort
            s = np.unique(np.array(parts[1].split(","), dtype=np.int64))
            sets.append(s)  # np.unique output is already sorted
            keys.append(i)
            if max_sets is not None and len(sets) >= max_sets:
                break
    return sets, keys


def load_benchmark_sets(n_queries: int = 50, sample_ratio: float = 1.0,
                        max_sets: int | None = None):
    """Drop-in replacement for ``benchmarks.utils.generate_sets`` backed by
    the configured real dataset; queries are sampled from the corpus (the
    reference harness queries with corpus members)."""
    path = dataset_path()
    if path is None:
        raise RuntimeError(
            "set %s to a set-similarity-search-benchmark .inp file" % ENV_VAR
        )
    sets, keys = read_sets(path, sample_ratio=sample_ratio, max_sets=max_sets)
    rng = random.Random(41)
    q_idx = rng.sample(range(len(sets)), min(n_queries, len(sets)))
    query_sets = [sets[i] for i in q_idx]
    return sets, keys, query_sets, q_idx

"""Serving-scale index benchmark: build + batched queries at 10^6 docs.

BASELINE.md config #3: MinHashLSH threshold=0.5 build + batched queries on
1M synthetic doc signatures, one v5e chip. Signatures are synthesized
directly (planted near-duplicate pairs) so the measurement isolates the
index, not tokenization.

Usage: python benchmarks/scale_benchmark.py [n_docs] [n_queries]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from benchmarks import utils  # noqa: E402,F401  (jit cache)


def synth_signatures(n: int, num_perm: int, dup_rate: float = 0.2, seed: int = 9):
    """Random signatures; dup_rate of them are mutated copies of earlier rows."""
    rng = np.random.RandomState(seed)
    sigs = rng.randint(0, 1 << 32, size=(n, num_perm), dtype=np.uint64).astype(
        np.uint32
    )
    n_dup = int(n * dup_rate)
    src = rng.randint(0, n - n_dup, size=n_dup)
    dst = np.arange(n - n_dup, n)
    keep = rng.rand(n_dup, num_perm) < rng.uniform(0.6, 0.95, size=(n_dup, 1))
    sigs[dst] = np.where(keep, sigs[src], sigs[dst])
    return sigs, src, dst


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    num_perm = 128

    import jax.numpy as jnp

    from datasketch_tpu.models.lsh import _optimal_param
    from datasketch_tpu.ops import lsh_ops

    sigs, src, dst = synth_signatures(n_docs, num_perm)
    b, r = _optimal_param(0.5, num_perm, 0.5, 0.5)
    print(f"n={n_docs} num_perm={num_perm} bands=({b},{r})")

    # ---- upload (tunnel-bound) then build (device) -------------------------
    from datasketch_tpu.ops.transfer import device_upload

    def sync(x):
        np.asarray(x[:1, :1])  # force completion (block_until_ready can
        # return before remote transfers actually land)

    t0 = time.perf_counter()
    sigs_dev = device_upload(sigs)
    sync(sigs_dev)
    t_up = time.perf_counter() - t0
    print(f"upload: {t_up:.3f}s  ({sigs.nbytes / t_up / 2**20:,.0f} MB/s)")

    t0 = time.perf_counter()
    fps = lsh_ops.band_fingerprints(sigs_dev, b, r)
    sorted_fp, sorted_ids = lsh_ops.build_tables(fps)
    sync(sorted_fp)
    t_build = time.perf_counter() - t0
    print(f"build: {t_build:.3f}s  ({n_docs / t_build:,.0f} docs/s)")

    # ---- queries: planted duplicates must be found -------------------------
    q_idx = dst[:n_queries]
    q_dev = sigs_dev[jnp.asarray(q_idx)]

    def run():
        top_ids, top_sc, trunc = lsh_ops.topk_fused(
            sorted_fp, sorted_ids, sigs_dev, q_dev, b, r, 64, 10
        )
        return np.asarray(top_ids), np.asarray(top_sc), int(trunc)

    run()  # warm
    t0 = time.perf_counter()
    top_ids, top_sc, trunc = run()
    t_query = time.perf_counter() - t0
    qps = len(q_idx) / t_query
    # recall of the planted near-duplicate source
    hit = np.mean([
        s in row for s, row in zip(src[:n_queries], top_ids)
    ])
    print(
        f"query: {1e6 * t_query / len(q_idx):.1f}us/q  ({qps:,.0f} q/s)  "
        f"planted-dup recall@10={hit:.3f}  truncated={trunc}"
    )


if __name__ == "__main__":
    main()

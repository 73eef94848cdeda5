"""Serving-path compile-time table: shape -> seconds, Mosaic vs XLA.

The remote-TPU tunnel compiles some XLA fusions pathologically (a fused
elementwise+reduce over [B, T, P] took 2s at T=256 but 5-9 MINUTES at
T=512 — CLAUDE.md); the serving hot paths therefore run as Mosaic
(Pallas) kernels, which compile in ~1s regardless of shape. This script
measures first-dispatch (compile) time for each serving shape and prints
a markdown table for docs/tpu.md. Run on the real TPU:

    python benchmarks/compile_times.py [--xla]

``--xla`` also times the XLA fallback forms (slow through the tunnel —
budget accordingly).
"""

from __future__ import annotations

import sys
import time

import numpy as np

import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _timed(fn, *args, **kw):
    import jax

    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def main() -> None:
    import jax

    from datasketch_tpu.ops import lsh_ops, minhash_ops, pallas_kernels as pk

    time_xla = "--xla" in sys.argv
    platform = jax.devices()[0].platform
    # off-TPU smoke runs use the Pallas interpreter (Mosaic timings are
    # only meaningful on the real device)
    interp = platform != "tpu"
    rng = np.random.RandomState(0)
    rows = []

    # signature kernel shapes: (B, T) x P=128
    for b, t in [(128, 256), (1024, 512), (8192, 1024)]:
        hashes = rng.randint(0, 1 << 32, size=(b, t), dtype=np.uint64).astype(
            np.uint32
        )
        lengths = np.full(b, t, np.int32)
        limbs = minhash_ops.perm_limbs(1, 128)
        dt = _timed(pk.sign_batch_pallas, hashes, lengths, *limbs,
                    interpret=interp)
        rows.append((f"signatures [B={b}, T={t}, P=128]", "Mosaic", dt))
        if time_xla:
            dt = _timed(minhash_ops._sign_batch, hashes,
                        np.asarray(lengths), *limbs)
            rows.append((f"signatures [B={b}, T={t}, P=128]", "XLA", dt))

    # score-matrix (exact-scan serving) shapes: (Q, tile)
    for q, t in [(56, 8192), (800, 8192)]:
        qs = rng.randint(0, 1 << 32, size=(q, 128), dtype=np.uint64).astype(
            np.uint32
        )
        db = rng.randint(0, 1 << 32, size=(t, 128), dtype=np.uint64).astype(
            np.uint32
        )
        q_pad = (-q) % pk.SCORE_BQ
        qs_p = np.pad(qs, ((0, q_pad), (0, 0)))
        dt = _timed(pk.score_matrix_pallas, qs_p, db, interpret=interp)
        rows.append((f"scan scores [Q={q}, tile={t}, P=128]", "Mosaic", dt))

    # full serving entry points (scan + fused band top-k + threshold)
    for q, n in [(56, 16384), (800, 131072)]:
        db = rng.randint(0, 1 << 32, size=(n, 128), dtype=np.uint64).astype(
            np.uint32
        )
        qs = db[:q]
        dt = _timed(lsh_ops.topk_scan, db, qs, 10)
        rows.append((f"topk_scan [Q={q}, N={n}]", "Mosaic+XLA", dt))
        dt = _timed(
            lsh_ops.topk_scan, db, qs, 1024, count_ge=np.float32(0.5)
        )
        rows.append((f"threshold scan [Q={q}, N={n}]", "Mosaic+XLA", dt))
        fps = lsh_ops.band_fingerprints(db, 16, 8)
        sfp, sid = lsh_ops.build_tables(fps)
        dt = _timed(
            lsh_ops.topk_fused, sfp, sid, db, qs, 16, 8, 128, 10
        )
        rows.append((f"topk_fused [Q={q}, N={n}, b=16]", "Mosaic+XLA", dt))
        dt = _timed(
            lsh_ops.query_fused, sfp, sid, db, qs, 16, 8, 128,
            np.float32(0.5), 1024,
        )
        rows.append((f"query_fused [Q={q}, N={n}, b=16]", "Mosaic+XLA", dt))

    # b-bit packed scan (TpuBBitIndex serving)
    from datasketch_tpu.ops import bbit_ops

    for q, n in [(256, 131072)]:
        sigs = rng.randint(0, 1 << 32, size=(n, 128), dtype=np.uint64).astype(
            np.uint32
        )
        db_p = bbit_ops.pack_bbit_host(sigs, 1)
        qp = db_p[:q]
        dt = _timed(
            bbit_ops.bbit_topk_scan, db_p, qp, 10, 1, 128,
            n_valid=np.int32(n),
        )
        rows.append((f"bbit scan [Q={q}, N={n}, b=1]", "Mosaic+XLA", dt))

    print(f"\nplatform: {platform}\n")
    print("| serving shape | path | first-dispatch (compile) s |")
    print("|---|---|---|")
    for name, path, dt in rows:
        print(f"| {name} | {path} | {dt:.1f} |")
    worst = max(dt for _, _, dt in rows)
    print(f"\nworst shape: {worst:.1f}s")


if __name__ == "__main__":
    main()

"""Render benchmark figures (parity with the reference docs' PNGs).

Reads the SQLite results of jaccard_topk runs and the sketch sweeps, and
writes PNGs into docs/figures/. Matplotlib only — no seaborn.

Usage: python benchmarks/plot_results.py [topk_results.db]
"""

from __future__ import annotations

import json
import os
import sqlite3
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_topk(db_path: str, out: str) -> None:
    conn = sqlite3.connect(db_path)
    rows = conn.execute(
        "SELECT name, mean_query_time, mean_recall FROM runs "
        "WHERE name != 'exact' ORDER BY key"
    ).fetchall()
    exact = conn.execute(
        "SELECT mean_query_time FROM runs WHERE name='exact' ORDER BY key DESC"
    ).fetchone()
    seen = {}
    for name, qt, rec in rows:
        seen[name] = (qt, rec)  # latest run per index wins

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for name, (qt, rec) in sorted(seen.items()):
        ax.scatter(qt * 1000, rec, s=70, zorder=3)
        ax.annotate(name, (qt * 1000, rec), textcoords="offset points",
                    xytext=(8, -4), fontsize=9)
    if exact:
        ax.axvline(exact[0] * 1000, ls="--", lw=1, color="gray")
        ax.annotate("exact scan", (exact[0] * 1000, 0.5), rotation=90,
                    fontsize=8, color="gray", textcoords="offset points",
                    xytext=(-12, 0))
    ax.set_xscale("log")
    ax.set_xlabel("mean query time (ms, log scale)")
    ax.set_ylabel("recall@10 vs exact")
    ax.set_title("Top-k Jaccard search: recall vs latency (one v5e chip)")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print("wrote", out)




def plot_sketch_accuracy(out: str) -> None:
    """MinHash Jaccard error vs num_perm (reference minhash_benchmark.png
    analogue), measured live on small synthetic pairs."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from datasketch_tpu import MinHash

    rng = np.random.RandomState(7)
    num_perms = [16, 32, 64, 128, 256, 512]
    errs = []
    for p in num_perms:
        e = []
        for t in range(30):
            size = 400
            overlap = rng.uniform(0.2, 0.9)
            common = [b"c%d-%d" % (t, i) for i in range(int(size * overlap))]
            a = common + [b"a%d-%d" % (t, i) for i in range(size - len(common))]
            b = common + [b"b%d-%d" % (t, i) for i in range(size - len(common))]
            true_j = len(common) / (2 * size - len(common))
            sa, sb = MinHash.bulk_signatures([a, b], num_perm=p)
            e.append(abs(float((sa == sb).mean()) - true_j))
        errs.append(np.mean(e))
    fig, ax = plt.subplots(figsize=(6.5, 4))
    ax.plot(num_perms, errs, "o-", label="measured |error|")
    ax.plot(num_perms, [1 / np.sqrt(p) for p in num_perms], "--",
            label=r"theory $1/\sqrt{num\_perm}$")
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xlabel("num_perm")
    ax.set_ylabel("mean |Jaccard error|")
    ax.set_title("MinHash estimation error vs num_perm")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out, dpi=130)
    print("wrote", out)


if __name__ == "__main__":
    import os

    os.makedirs("docs/figures", exist_ok=True)
    db = sys.argv[1] if len(sys.argv) > 1 else "/tmp/final_topk.db"
    if os.path.exists(db):
        plot_topk(db, "docs/figures/topk_recall_latency.png")
    plot_sketch_accuracy("docs/figures/minhash_error_vs_num_perm.png")

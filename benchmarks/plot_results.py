"""Render benchmark figures (parity with the reference docs' PNGs).

Reads the SQLite results of jaccard_topk runs and the sketch sweeps, and
writes PNGs into docs/figures/. Matplotlib only — no seaborn.

Usage: python benchmarks/plot_results.py [topk_results.db]
"""

from __future__ import annotations

import json
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


if __name__ == "__main__":
    import os

    os.makedirs("docs/figures", exist_ok=True)
    db = sys.argv[1] if len(sys.argv) > 1 else "/tmp/final_topk.db"
    plot_topk(db, "docs/figures/topk_recall_latency.png")

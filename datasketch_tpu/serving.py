"""Degraded-mode serving: host failover for device-resident indexes.

The reference library has no failure handling (SURVEY.md §5); a
device-resident index adds a failure mode it never had — a wedged
accelerator (or remote tunnel) HANGS dispatches rather than raising, so
a serving replica silently stops answering. :class:`FailoverIndex`
pairs a :class:`~datasketch_tpu.models.tpu_lsh.TpuMinHashLSH` (or a
mesh-sharded :class:`~datasketch_tpu.parallel.sharded_lsh.
ShardedMinHashLSH`) with a
:class:`~datasketch_tpu.utils.health.HealthMonitor` and a host-side
snapshot of the signature matrix:

- while the monitor reports healthy, queries go to the device path
  (banded probe / streaming scan, ~ms per batch);
- once the monitor trips (or a device dispatch raises), queries are
  answered from the snapshot by an exact host scan — slower, but exact
  over the stored sketches, and immune to the device.

The monitor must run OUT-OF-BAND (its subprocess probes are killable;
see ``utils/health.py``): a dispatch that has already been sent to a
wedged device cannot be cancelled from this process, so the wrapper's
job is to stop *new* queries from touching the device once it is known
bad, not to rescue in-flight ones.

Failback is explicit: after the device recovers (monitor healthy
again), call :meth:`FailoverIndex.resume_device` — automatic failback
would re-wedge the process on a flapping tunnel.
"""

from __future__ import annotations

from typing import Hashable, Optional

import numpy as np

from datasketch_tpu.utils.health import HealthMonitor

__all__ = ["FailoverIndex", "host_topk_scan"]


def _host_scores(sigs: np.ndarray, q_row: np.ndarray,
                 alive: Optional[np.ndarray]) -> np.ndarray:
    """Estimated Jaccard of one query row vs every stored signature
    (matching-slot fraction); tombstoned rows score -1."""
    scores = (sigs == q_row[None, :]).mean(axis=1)
    if alive is not None:
        scores = np.where(alive, scores, -1.0)
    return scores


def host_topk_scan(
    sigs: np.ndarray,
    q_sigs: np.ndarray,
    k: int,
    alive: Optional[np.ndarray] = None,
):
    """Exact top-k over a host signature matrix.

    Jaccard is estimated as the per-row fraction of matching signature
    slots (the MinHash estimator). Returns ``(ids int64[Q, k], scores
    float64[Q, k])`` with ``-1`` ids padding short rows.

    One query row at a time keeps the working set at ``N x P`` bools —
    a [Q, N, P] broadcast would be gigabytes at serving scale.
    """
    n = sigs.shape[0]
    q = q_sigs.shape[0]
    ids_out = np.full((q, k), -1, dtype=np.int64)
    sc_out = np.zeros((q, k), dtype=np.float64)
    if n == 0:
        return ids_out, sc_out
    for qi in range(q):
        scores = _host_scores(sigs, q_sigs[qi], alive)
        kk = min(k, n)
        part = np.argpartition(-scores, kk - 1)[:kk]
        order = part[np.argsort(-scores[part], kind="stable")]
        valid = scores[order] >= 0.0
        m = int(valid.sum())
        ids_out[qi, :m] = order[valid]
        sc_out[qi, :m] = scores[order][valid]
    return ids_out, sc_out


class FailoverIndex:
    """Health-routed facade over a device index with a host snapshot.

    >>> index = TpuMinHashLSH(threshold=0.5, num_perm=128)
    >>> index.index(keys, minhashes)
    >>> fo = FailoverIndex(index)           # takes the snapshot now
    >>> fo.check()                          # out-of-band health probe
    >>> fo.top_k(queries, k=10)             # device, or host if tripped

    Args:
        index: a ``TpuMinHashLSH`` (anything with ``top_k``,
            ``query_batch``, ``host_snapshot``).
        monitor: optional pre-configured ``HealthMonitor``; by default a
            subprocess-isolated one with 3-strike eviction.
        snapshot: take the host snapshot immediately (requires a healthy
            device if the signatures only live in HBM). Pass False and
            call :meth:`refresh_snapshot` yourself to control timing.
    """

    def __init__(self, index, monitor: Optional[HealthMonitor] = None,
                 snapshot: bool = True) -> None:
        self._index = index
        self.monitor = monitor if monitor is not None else HealthMonitor()
        self._snapshot: Optional[dict] = None
        self._forced_host = False
        self.last_path: Optional[str] = None
        if snapshot:
            self.refresh_snapshot()

    # ------------------------------------------------------------- snapshot

    def refresh_snapshot(self) -> None:
        """Re-pull the host snapshot from the index (call after mutations,
        while the device is healthy)."""
        self._snapshot = self._index.host_snapshot()

    # ------------------------------------------------------------- health

    def check(self) -> dict:
        """Run one out-of-band health probe (see ``HealthMonitor``)."""
        return self.monitor.check()

    @property
    def serving_from_host(self) -> bool:
        return self._forced_host or self.monitor.unhealthy

    def resume_device(self) -> None:
        """Explicit failback to the device path after recovery."""
        self._forced_host = False
        self.monitor.consecutive_failures = 0

    def _note_device_failure(self, exc: Exception) -> None:
        import time

        self.monitor.consecutive_failures += 1
        self.monitor.last_result = {
            "ok": False, "latency_s": None, "error": repr(exc),
        }
        # keep status()'s history consistent with the counters — an
        # operator reading checks=0 next to consecutive_failures=3 would
        # see self-contradictory monitor state
        self.monitor.history.append((time.time(), False, None))
        self._forced_host = True

    @staticmethod
    def _is_caller_error(exc: Exception) -> bool:
        """Input-validation errors mean a BAD QUERY, not a bad device:
        failing over on them would flip a healthy replica into degraded
        host serving (and then likely fail the host path too)."""
        return isinstance(exc, (ValueError, TypeError, KeyError))

    def _require_snapshot(self) -> dict:
        if self._snapshot is None:
            raise RuntimeError(
                "no host snapshot available — call refresh_snapshot() "
                "while the device is healthy"
            )
        return self._snapshot

    # ------------------------------------------------------------- queries

    def top_k(self, minhashes, k: int, **kwargs) -> list:
        """Per-query ``[(key, score), ...]`` rows, like the device index.

        Extra kwargs pass through to the device index; the host fallback
        honors ``return_scores`` (result SHAPE must not change
        mid-failover) and ignores device-only tuning knobs like
        ``method`` — the host scan is exact regardless.
        """
        if not self.serving_from_host:
            try:
                self.last_path = "device"
                return self._index.top_k(minhashes, k, **kwargs)
            except Exception as exc:  # noqa: BLE001 — fail over, not crash
                if self._is_caller_error(exc):
                    raise
                self._note_device_failure(exc)
        self.last_path = "host"
        return_scores = kwargs.get("return_scores", True)
        snap = self._require_snapshot()
        from datasketch_tpu.models.tpu_lsh import _as_signature_matrix

        q_sigs = _as_signature_matrix(minhashes)
        ids, scores = host_topk_scan(
            snap["sigs"], q_sigs, k, alive=snap.get("alive")
        )
        keys = snap["keys"]
        if not return_scores:
            return [
                [keys[int(p)] for p in row_ids if p >= 0] for row_ids in ids
            ]
        return [
            [(keys[int(p)], float(s)) for p, s in zip(row_ids, row_sc) if p >= 0]
            for row_ids, row_sc in zip(ids, scores)
        ]

    def query_batch(self, minhashes, threshold: Optional[float] = None,
                    return_scores: bool = False, **kwargs) -> list:
        """Threshold query; host path scans exactly at the cutoff."""
        if not self.serving_from_host:
            try:
                self.last_path = "device"
                return self._index.query_batch(
                    minhashes, threshold=threshold,
                    return_scores=return_scores, **kwargs
                )
            except Exception as exc:  # noqa: BLE001 — fail over, not crash
                if self._is_caller_error(exc):
                    raise
                self._note_device_failure(exc)
        self.last_path = "host"
        snap = self._require_snapshot()
        from datasketch_tpu.models.tpu_lsh import _as_signature_matrix

        cutoff = self._index.threshold if threshold is None else threshold
        q_sigs = _as_signature_matrix(minhashes)
        sigs, keys = snap["sigs"], snap["keys"]
        alive = snap.get("alive")
        out = []
        for qi in range(q_sigs.shape[0]):
            if sigs.shape[0] == 0:
                out.append([])
                continue
            scores = _host_scores(sigs, q_sigs[qi], alive)
            hits = np.nonzero(scores >= cutoff)[0]
            order = hits[np.argsort(-scores[hits], kind="stable")]
            if return_scores:
                out.append([(keys[int(p)], float(scores[p])) for p in order])
            else:
                out.append([keys[int(p)] for p in order])
        return out

    def query(self, minhash, threshold: Optional[float] = None) -> list:
        return self.query_batch([minhash], threshold=threshold)[0]

    # ------------------------------------------------------------- misc

    def __contains__(self, key: Hashable) -> bool:
        return key in self._index

    def __len__(self) -> int:
        return len(self._index)

    def status(self) -> dict:
        snap = self._snapshot
        return {
            "serving_from_host": self.serving_from_host,
            "last_path": self.last_path,
            "snapshot_rows": None if snap is None else int(snap["sigs"].shape[0]),
            "monitor": self.monitor.status(),
        }

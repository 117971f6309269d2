"""Structured metrics logging (jsonl) + the reference's throughput metric.

The reference prints observables to stdout only (SURVEY.md §5).  Here every
iteration appends one JSON line — machine-readable history for benchmarking
and resumable monitoring — while the CLI still prints the reference-format
line including its "hours per 100 iters" speed metric
(``src/FermionHO2D.py:74-76``).
"""

from __future__ import annotations

import json
import time


class MetricsLogger:
    def __init__(self, path: str | None = None):
        self.path = path
        self._fh = open(path, "a") if path else None
        self._last_t = None

    def log(self, step: int, metrics: dict) -> dict:
        """Record metrics (converting jax scalars), return the plain dict."""
        now = time.time()
        rec = {"step": int(step)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        if self._last_t is not None:
            dt = now - self._last_t
            rec["iter_seconds"] = dt
            # The reference's throughput metric (src/FermionHO2D.py:74).
            rec["hours_per_100_iters"] = dt * 100 / 3600
        self._last_t = now
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

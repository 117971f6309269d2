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

    def log_many(self, first_step: int, metrics, t_start: float) -> list:
        """Record a stacked-metrics chunk from a multi-iteration program.

        ``metrics`` leaves have shape ``(chunk,)`` (see train.make_multi_step);
        the single host fetch here forces device completion, so the measured
        wall time divided by the chunk length is the honest per-iteration
        speed (the reference's "hours per 100 iters" metric).
        """
        import numpy as np

        host = {k: np.asarray(v) for k, v in metrics.items()}
        now = time.time()
        n = max((v.shape[0] for v in host.values() if v.ndim), default=None)
        if n is None:
            raise ValueError(
                "log_many expects stacked (chunk,) metric leaves from a "
                "multi-iteration program; got only scalars — use log()")
        dt = (now - t_start) / n
        recs = []
        for i in range(n):
            rec = {"step": int(first_step + i)}
            for k, v in host.items():
                rec[k] = float(v[i]) if v.ndim else float(v)
            rec["iter_seconds"] = dt
            rec["hours_per_100_iters"] = dt * 100 / 3600
            recs.append(rec)
            if self._fh:
                self._fh.write(json.dumps(rec) + "\n")
        if self._fh:
            self._fh.flush()
        self._last_t = now
        return recs

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

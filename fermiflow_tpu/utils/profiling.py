"""Profiling hooks (aux-subsystem parity, SURVEY.md §5).

The reference instruments with ad-hoc ``time.time()`` prints scattered through
the hot path (``src/FermionHO2D.py:74-76``, ``src/VMC.py:98-102,134-138``,
``src/utils.py:54-64``).  Here: a context manager around ``jax.profiler``
producing TensorBoard-loadable traces, plus a phase timer that is honest on
remote TPU platforms (forces a value fetch — ``block_until_ready`` does not
reliably block through a tunnel).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

__all__ = ["trace", "PhaseTimer"]


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase timing with forced device synchronization."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                for leaf in jax.tree_util.tree_leaves(sync_on):
                    np.asarray(leaf)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / self.counts[name], 2),
            }
            for name in self.totals
        }

"""Profiling & timing utilities.

The reference's only instrumentation is wall-clock timestamps around the
ranking stages (reference: mars/MARS.py:29-31,40,59,102 and
main_MARS.py:76-89 → ranking_time.csv).  Here:

  - ``stage_timer``: named wall-clock spans with forced device sync (on the
    remote-attached TPU, ``block_until_ready`` alone can return early, so
    the timer pulls one scalar).
  - ``trace``: a jax.profiler trace context writing TensorBoard-compatible
    traces, enabled by MARS_TPU_PROFILE_DIR or explicitly.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import numpy as np


def force_sync(x) -> None:
    """Guarantee device completion (pulls one scalar to host)."""
    leaf = jax.tree_util.tree_leaves(x)
    if leaf:
        np.asarray(jax.device_get(leaf[0].ravel()[0] if hasattr(leaf[0], "ravel") else leaf[0]))


class StageTimers:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, sync_result=None):
        t0 = time.time()
        yield
        if sync_result is not None:
            force_sync(sync_result)
        self.totals[name] += time.time() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def report(self) -> str:
        return "  ".join(f"{k}={v * 1000:.1f}ms" for k, v in sorted(self.summary().items()))


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace if a directory is configured, else no-op."""
    log_dir = log_dir or os.environ.get("MARS_TPU_PROFILE_DIR")
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

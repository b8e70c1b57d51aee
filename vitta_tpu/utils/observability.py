"""Tracing / profiling / metrics.

The reference's observability is wall-clock meters + a TensorBoard
writer (SURVEY.md §5; utils_.py:92-110, corpus/main_eval.py:85).  Here:

* :class:`MetricsWriter` — JSONL scalar stream (one line per step:
  ``{"step": n, "tag": ..., "value": ...}``), with an optional
  tensorboardX mirror when that package exists;
* :func:`profile` — context manager around ``jax.profiler`` traces
  (view in TensorBoard/XProf or Perfetto);
* :class:`StepTimer` — device-synchronized step timing.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import jax


class MetricsWriter:
    def __init__(self, result_dir: str, name: str = "metrics"):
        os.makedirs(result_dir, exist_ok=True)
        self.path = os.path.join(result_dir, f"{name}.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # optional
            self._tb = SummaryWriter(os.path.join(result_dir, "tb"))
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(json.dumps(
            {"step": int(step), "tag": tag, "value": float(value),
             "ts": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def flush(self) -> None:
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        self._f.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile(profile_dir: str, enabled: bool = True):
    """``with profile("/tmp/trace"):`` captures a jax.profiler trace."""
    if not enabled or not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing with an optional device sync on read."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()

    def elapsed_ms(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        return (time.perf_counter() - self._t0) * 1000.0

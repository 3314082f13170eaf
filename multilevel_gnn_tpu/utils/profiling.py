"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference only prints wall-clock totals (train.py:140,210-212).  Here:
jax.profiler trace capture, block_until_ready-bracketed step timing, an
edges/s/chip counter (the BASELINE north-star metric), a structured jsonl
metric stream (§5.5), and a NaN-check debug mode (§5.2).
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debug():
    """jax_debug_nans — the functional analog of the reference's
    pdb-on-NaN breakpoints (multilevel_gnn.py:147-148)."""
    jax.config.update("jax_debug_nans", True)


class StepTimer:
    """block_until_ready-bracketed step timer with an edges/s counter."""

    def __init__(self, edges_per_step: int = 0, batch_per_step: int = 1):
        self.edges_per_step = edges_per_step
        self.batch_per_step = batch_per_step
        self.times = []

    @contextlib.contextmanager
    def step(self, result_to_block=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        if "result" in out:
            jax.block_until_ready(out["result"])
        elif result_to_block is not None:
            jax.block_until_ready(result_to_block)
        self.times.append(time.perf_counter() - t0)

    @property
    def mean_s(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def edges_per_s(self) -> float:
        if not self.times or not self.edges_per_step:
            return 0.0
        return self.edges_per_step * self.batch_per_step / self.mean_s


class AverageMeter:
    """Running average (reference utils/metrics.py:8-24)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = 0.0
        self.avg = 0.0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class MetricStream:
    """Append-only jsonl metric log (structured replacement for the
    reference's logging.info dicts, train.py:169-176)."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "a")

    def log(self, **metrics):
        metrics.setdefault("ts", time.time())
        self._f.write(json.dumps(metrics) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()

"""Observability: scalar logging, per-step timing, profiler traces.

Reference behavior (SURVEY.md §5.1/§5.5): stdout loss lines with ETA
(``train_gshelltet_deepfashion.py:483-491``), TensorBoard scalars
(``GMeshDiffusion/lib/diffusion/trainer.py:34-35,151-153``), metrics.txt.

TPU-native additions: ``jax.profiler`` trace capture around training windows
(the counterpart of CUDA-event timing, SURVEY.md §5.1) and a dependency-free
CSV scalar writer (TensorBoard event writing is used when available).
"""
from __future__ import annotations

import contextlib
import csv
import os
import time
from typing import Optional

import jax


class ScalarLogger:
    """CSV scalar logger with optional TensorBoard mirroring."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.csv_path = os.path.join(log_dir, "scalars.csv")
        self._csv = open(self.csv_path, "a", newline="")
        self._writer = csv.writer(self._csv)
        if os.path.getsize(self.csv_path) == 0:
            self._writer.writerow(["step", "tag", "value", "wall_time"])
        self._tb = None
        if use_tensorboard:
            try:
                from flax.metrics import tensorboard

                self._tb = tensorboard.SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int):
        self._writer.writerow([step, tag, float(value), time.time()])
        if self._tb is not None:
            self._tb.scalar(tag, float(value), step)

    def flush(self):
        self._csv.flush()
        if self._tb is not None:
            self._tb.flush()


class StepTimer:
    """Wall-clock per-iteration timing with ETA (ref :483-491)."""

    def __init__(self, total_steps: int, window: int = 10):
        self.total = total_steps
        self.window = window
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *_):
        self.times.append(time.time() - self._t0)

    def summary(self, step: int) -> str:
        recent = self.times[-self.window:]
        avg = sum(recent) / max(len(recent), 1)
        rem = (self.total - step) * avg
        return f"time={avg*1000:.1f} ms, rem={rem/60:.1f} min"


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture a jax profiler trace (view with TensorBoard / Perfetto)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

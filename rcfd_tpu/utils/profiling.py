"""Profiling / step-timing utilities.

The reference has no tracing at all (SURVEY §5.1 — only wall-clock ETA
logs). Here: a per-step timer with percentile summaries and an optional
jax.profiler trace context for capturing device timelines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


class StepTimer:
    """Rolling wall-clock step timer."""

    def __init__(self, window: int = 200):
        self.window = window
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            'mean_s': float(arr.mean()),
            'p50_s': float(np.percentile(arr, 50)),
            'p95_s': float(np.percentile(arr, 95)),
            'steps_per_s': float(1.0 / arr.mean()),
        }


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def find_latest_checkpoint(checkpoint_dirpath: str) -> Optional[str]:
    """Resolve the newest model-{step}.pth/.npz in a checkpoint directory
    (enables `--restore_path latest` auto-resume, which the reference
    lacks)."""
    import os
    import re
    if not os.path.isdir(checkpoint_dirpath):
        return None
    best_step, best_path = -1, None
    for fname in os.listdir(checkpoint_dirpath):
        m = re.match(r'model-(\d+)\.(pth|npz)$', fname)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best_path = os.path.join(checkpoint_dirpath, fname)
    return best_path


class TraceWindow:
    """Env-driven jax.profiler capture window for the train loops:
    RCFD_PROFILE_DIR=/path [RCFD_PROFILE_STEPS=a-b, default 10-12]
    captures the device timeline for steps [a, b]. View with
    tensorboard --logdir <dir> (profile plugin) or xprof."""

    def __init__(self):
        import os
        self.dir = os.environ.get('RCFD_PROFILE_DIR')
        steps = os.environ.get('RCFD_PROFILE_STEPS', '10-12')
        try:
            a, b = steps.split('-')
            self.start_step, self.stop_step = int(a), int(b)
        except ValueError:
            self.start_step, self.stop_step = 10, 12
        self._active = False

    def after_step(self, step: int):
        if self.dir is None:
            return
        import jax
        if not self._active and step >= self.start_step:
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif self._active and step >= self.stop_step:
            jax.profiler.stop_trace()
            self._active = False
            self.dir = None  # one window per run

    def close(self):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False

"""TensorBoard summaries (optional). Mirrors the reference's use of
SummaryWriter(event_path +/- '-train'/'-val') (src/radarnet_main.py:287-288)
but degrades to a no-op when tensorboard is unavailable."""

from __future__ import annotations

import numpy as np


class SummaryWriter:
    def __init__(self, log_dir: str, enabled: bool = True):
        """enabled=False makes a no-op writer (e.g. non-lead hosts under
        multi-host training write no duplicate event files)."""
        self._writer = None
        if not enabled:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter
            self._writer = TBWriter(log_dir)
        except Exception:
            self._writer = None

    def add_scalar(self, tag, value, global_step=None):
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), global_step=global_step)

    def add_histogram(self, tag, values, global_step=None):
        if self._writer is not None:
            self._writer.add_histogram(
                tag, np.asarray(values).ravel(), global_step=global_step)

    def add_image(self, tag, image_hwc, global_step=None):
        if self._writer is not None:
            self._writer.add_image(
                tag, np.asarray(image_hwc), global_step=global_step,
                dataformats='HWC')

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

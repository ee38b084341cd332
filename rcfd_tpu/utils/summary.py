"""TensorBoard summaries (optional). Mirrors the reference's use of
SummaryWriter(event_path +/- '-train'/'-val') (src/radarnet_main.py:287-288)
but degrades to a no-op when tensorboard is unavailable — with a loud
warning (once per process), so a torch-free deployment (utils/torch_pickle
exists to support one) does not silently lose all observability."""

from __future__ import annotations

import numpy as np

_WARNED = [False]


def _warn_disabled(reason: str):
    if _WARNED[0]:
        return
    _WARNED[0] = True
    from .log_utils import log
    log('WARNING: TensorBoard summaries DISABLED ({}) — scalar/histogram/'
        'image events will not be written. Install torch+tensorboard to '
        'enable.'.format(reason))


class SummaryWriter:
    def __init__(self, log_dir: str, enabled: bool = True):
        """enabled=False makes a no-op writer (e.g. non-lead hosts under
        multi-host training write no duplicate event files — intentional,
        no warning)."""
        self._writer = None
        if not enabled:
            return
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter
            self._writer = TBWriter(log_dir)
        except Exception as e:
            self._writer = None
            _warn_disabled('{}: {}'.format(type(e).__name__, e))

    @property
    def enabled(self) -> bool:
        """Whether events are actually written (surfaced in the drivers'
        startup settings block, like the reference's settings log)."""
        return self._writer is not None

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

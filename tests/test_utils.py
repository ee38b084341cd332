"""Utility tests: auto-resume resolution, data split generator, colorize,
logging."""

import os
import pickle
import subprocess
import sys

import pytest
import numpy as np

from rcfd_tpu.utils.log_utils import colorize, log
from rcfd_tpu.utils.profiling import StepTimer, find_latest_checkpoint

pytestmark = pytest.mark.smoke

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_find_latest_checkpoint(tmp_path):
    d = str(tmp_path)
    assert find_latest_checkpoint(d) is None
    for step in [5000, 10000, 7500]:
        open(os.path.join(d, f'model-{step}.pth'), 'w').close()
    open(os.path.join(d, 'results.txt'), 'w').close()
    assert find_latest_checkpoint(d).endswith('model-10000.pth')


def test_step_timer():
    t = StepTimer(window=4)
    for _ in range(6):
        with t.step():
            pass
    s = t.summary()
    assert len(t.times) == 4
    assert s['steps_per_s'] > 0


def test_log_writes_file(tmp_path):
    path = str(tmp_path / 'sub' / 'results.txt')
    log('hello', path, to_console=False)
    log('world', path, to_console=False)
    assert open(path).read() == 'hello\nworld\n'


def test_colorize_shapes(rng):
    x = rng.random((2, 8, 10, 1), dtype=np.float32)
    out = colorize(x, 'viridis')
    assert out.shape == (2, 8, 10, 3)
    assert out.min() >= 0 and out.max() <= 1


def test_make_data_split(tmp_path):
    out = str(tmp_path / 'split')
    subprocess.run(
        [sys.executable, os.path.join(REPO, 'setup', 'make_data_split.py'),
         '--output_dirpath', out, '--n_scenes', '20', '--n_train', '15'],
        check=True, capture_output=True)
    with open(os.path.join(out, 'train_ids.pkl'), 'rb') as f:
        train = pickle.load(f)
    with open(os.path.join(out, 'val_ids.pkl'), 'rb') as f:
        val = pickle.load(f)
    assert len(train) == 15 and len(val) == 5
    assert not set(train) & set(val)
    assert set(train) | set(val) == set(range(20))


def test_summary_writer_warns_once_when_tb_unavailable(tmp_path, capsys,
                                                       monkeypatch):
    """A torch-free deployment must not silently lose TB observability:
    the degrade-to-no-op writer logs ONE loud warning per process and
    exposes .enabled for the drivers' settings banner."""
    import sys as _sys

    from rcfd_tpu.utils import summary

    # force the tensorboard import to fail
    monkeypatch.setitem(_sys.modules, 'torch.utils.tensorboard', None)
    monkeypatch.setattr(summary, '_WARNED', [False])

    w1 = summary.SummaryWriter(str(tmp_path / 'ev1'))
    w2 = summary.SummaryWriter(str(tmp_path / 'ev2'))
    assert not w1.enabled and not w2.enabled
    out = capsys.readouterr().out
    assert out.count('TensorBoard summaries DISABLED') == 1
    # no-op API still safe
    w1.add_scalar('a', 1.0, 0)
    w1.add_histogram('b', np.zeros(4), 0)
    w1.flush()

    # enabled=False (non-lead host) is intentional: no warning
    monkeypatch.setattr(summary, '_WARNED', [False])
    w3 = summary.SummaryWriter(str(tmp_path / 'ev3'), enabled=False)
    assert not w3.enabled
    assert 'DISABLED' not in capsys.readouterr().out

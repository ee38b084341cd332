"""tools/bridgebench.py: the stage-1.5 bridge throughput harness must run
both feeder modes on tiny shapes and produce identical PNG outputs
(the double-buffered iter_scatter_outputs path vs the synchronous
pre-round-5 loop), emitting one parseable JSON row."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow  # subprocess + full bridge pass per mode


def test_bridgebench_check_only_smoke():
    env = {**os.environ, 'JAX_PLATFORMS': 'cpu'}
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'bridgebench.py'),
         '--height', '64', '--width', '96', '--patch', '64', '32',
         '--n_frames', '6', '--n_points', '8', '--eval_batch_size', '4',
         '--dtype', 'float32', '--check_only'],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert result.returncode == 0, result.stderr[-3000:]
    row = json.loads(result.stdout.strip().splitlines()[-1])
    assert row['harness'] == 'bridgebench' and row['check_only']
    # check_only also runs the codec mode (uint16 device-quantized D2H)
    # and asserts its PNG files are byte-identical inside the harness
    for mode in ('prefetch', 'sync', 'codec'):
        assert row['results'][mode]['frames_per_s'] > 0


def test_bridgebench_rejects_bad_args():
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'bridgebench.py'),
         '--n_frames', '0'],
        capture_output=True, text=True, timeout=120, cwd=REPO)
    assert result.returncode != 0

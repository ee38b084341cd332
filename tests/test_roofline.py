"""tools/roofline.py: the HBM-bandwidth roofline harness (VERDICT r4 #2)
must produce a parseable analytic accounting for both serving graphs in
--dry mode (abstract trace only: no compile, no device)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow  # subprocess + model build per graph


@pytest.mark.parametrize('graph,batch,min_gb', [
    ('fusionnet_b32', '2', 2.0),
    ('pipeline_k64', '1', 5.0),
])
def test_roofline_dry_smoke(graph, batch, min_gb):
    env = {**os.environ, 'JAX_PLATFORMS': 'cpu'}
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'roofline.py'),
         '--graph', graph, '--batch', batch, '--dry'],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert result.returncode == 0, result.stderr[-3000:]
    row = json.loads(result.stdout.strip().splitlines()[-1])
    assert row['graph'] == graph and row['dry']
    assert row['n_ops'] > 50          # every conv/pool/resize intercepted
    # the accounting must scale with the model: GBs, not KBs
    assert row['analytic_bytes'] > min_gb * 1e9
    assert row['analytic_flops'] > 1e11
    # lane padding can only add traffic
    assert row['padded_bytes'] >= row['analytic_bytes']

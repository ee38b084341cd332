"""Smoke test for the real-data parity runbook (tools/parity_protocol.py):
the harness must run end-to-end on a synthetic fixture with random
weights, and — since both stacks restore the SAME checkpoint — report
near-zero metric deltas (PARITY PASS)."""

import os
import sys

import numpy as np
import pytest

import jax

from fixtures import make_fusionnet_fixture

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, 'tools'))

pytestmark = pytest.mark.slow  # drives both full stacks

TINY = dict(
    input_channels_image=3, input_channels_depth=2,
    encoder_type='fusionnet18_batch_norm',
    n_filters_encoder_image=[8, 12, 16, 16, 16],
    n_filters_encoder_depth=[4, 6, 8, 8, 8],
    fusion_type='weight_and_project',
    decoder_type='multiscale_batch_norm',
    n_resolution_decoder=1,
    n_filters_decoder=[16, 12, 8, 8, 8],
    min_predict_depth=1.0, max_predict_depth=100.0)


def test_parity_protocol_smoke(tmp_path):
    from rcfd_tpu.models import FusionNetModel

    import parity_protocol

    manifests = make_fusionnet_fixture(str(tmp_path / 'data'), n_samples=2,
                                       height=32, width=48)
    model = FusionNetModel(**TINY)
    params, state = model.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / 'model-7.pth')
    model.save_checkpoint(ckpt, params, state, step=7)

    argv = [
        '--fusionnet_checkpoint', ckpt,
        '--image_path', manifests['image'],
        '--depth_path', manifests['depth'],
        '--response_path', manifests['response'],
        '--ground_truth_path', manifests['ground_truth'],
        '--encoder_type', 'fusionnet18', 'batch_norm',
        '--n_filters_encoder_image', '8', '12', '16', '16', '16',
        '--n_filters_encoder_depth', '4', '6', '8', '8', '8',
        '--fusion_type', 'weight_and_project',
        '--decoder_type', 'multiscale', 'batch_norm',
        '--n_filters_decoder', '16', '12', '8', '8', '8',
        '--max_evaluate_depth', '80',
        '--output_dirpath', str(tmp_path / 'out'),
    ]
    ref, ours, verdict = parity_protocol.main(argv)

    assert ours is not None and np.isfinite(ours['mae'])
    report = (tmp_path / 'out' / 'parity_report.md').read_text()
    assert 'MAE' in report
    if ref is not None:
        # same weights, same frames -> same metrics (conv-algorithm noise
        # only); this is the end-to-end accuracy-parity assertion
        assert verdict == 'PARITY PASS', report
        for k in ['mae', 'rmse', 'imae', 'irmse']:
            assert abs(ref[k] - ours[k]) <= max(1e-2, 1e-3 * abs(ref[k])), \
                (k, ref[k], ours[k])


@pytest.mark.slow
def test_parity_protocol_two_stage_synthetic(tmp_path):
    """The two-stage chain mode (VERDICT r4 #3): reference RadarNet ->
    real PNG bridge -> reference FusionNet, vs our CLI chain, vs the
    fused TwoStagePipeline — all three through the tool's own synthetic
    entry point, PASS required on stage 2 and the fused column."""
    import parity_protocol

    ref, ours, overall = parity_protocol.main([
        '--synthetic', '--two_stage',
        '--output_dirpath', str(tmp_path / 'out'),
        '--eval_batch_size', '2',
    ])
    assert ours is not None
    for section in ('stage2', 'fused'):
        assert np.isfinite(ours[section]['mae'])
    report = (tmp_path / 'out' / 'parity_report.md').read_text()
    assert 'Stage 1' in report and 'Fused pipeline' in report
    if ref is not None:
        assert overall == 'PARITY PASS', report
        for k in ['mae', 'rmse', 'imae', 'irmse']:
            # same weights through the same PNG-quantized bridge
            assert abs(ref['stage2'][k] - ours['stage2'][k]) <= \
                max(1e-1, 1e-3 * abs(ref['stage2'][k])), (k, report)


@pytest.mark.slow
def test_parity_protocol_synthetic_cli(tmp_path):
    """The CLI's own entry point (--synthetic) must exercise the full
    report path end-to-end — fixture generation, checkpoint round trip,
    both evals, the side-by-side report — so the real-data run is a
    data-swap away (VERDICT r3 next #8)."""
    import subprocess
    import sys

    out = str(tmp_path / 'out')
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'parity_protocol.py'),
         '--synthetic', '--output_dirpath', out],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, 'JAX_PLATFORMS': 'cpu'})
    assert result.returncode == 0, result.stderr[-3000:]
    report = open(os.path.join(out, 'parity_report.md')).read()
    assert 'MAE' in report
    assert 'PARITY PASS' in result.stdout or 'running our stack only' \
        in result.stdout, result.stdout[-2000:]

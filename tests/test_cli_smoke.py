"""CLI end-to-end smoke: run_fusionnet.py / run_radarnet.py / run_pipeline
argument plumbing through real subprocesses with tiny checkpoints."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from fixtures import make_fusionnet_fixture, make_radarnet_fixture

pytestmark = pytest.mark.slow  # CLI/train-loop scale

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_FUSION = dict(
    input_channels_image=3, input_channels_depth=2,
    encoder_type='fusionnet18_batch_norm',
    n_filters_encoder_image=[8, 12, 16, 16, 16],
    n_filters_encoder_depth=[4, 6, 8, 8, 8],
    fusion_type='weight_and_project',
    decoder_type='multiscale_batch_norm',
    n_resolution_decoder=1,
    n_filters_decoder=[16, 12, 8, 8, 8],
    min_predict_depth=1.0, max_predict_depth=100.0)


def _env():
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PALLAS_AXON_POOL_IPS', None)  # skip axon registration
    return env


def test_run_fusionnet_cli(tmp_path):
    from rcfd_tpu.models import FusionNetModel
    manifests = make_fusionnet_fixture(str(tmp_path / 'data'), n_samples=2,
                                       height=32, width=48)
    model = FusionNetModel(**TINY_FUSION)
    params, state = model.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / 'model-1.npz')
    model.save_checkpoint(ckpt, params, state, step=1)

    out_dir = str(tmp_path / 'out')
    cmd = [
        sys.executable, os.path.join(REPO, 'run_fusionnet.py'),
        '--restore_path', ckpt,
        '--image_path', manifests['image'],
        '--depth_path', manifests['depth'],
        '--response_path', manifests['response'],
        '--ground_truth_path', manifests['ground_truth'],
        '--input_channels_image', '3',
        '--input_channels_depth', '2',
        '--normalized_image_range', '0', '1',
        '--encoder_type', 'fusionnet18', 'batch_norm',
        '--n_filters_encoder_image', '8', '12', '16', '16', '16',
        '--n_filters_encoder_depth', '4', '6', '8', '8', '8',
        '--fusion_type', 'weight_and_project',
        '--decoder_type', 'multiscale', 'batch_norm',
        '--n_filters_decoder', '16', '12', '8', '8', '8',
        '--n_resolutions_decoder', '1',
        '--min_predict_depth', '1.0',
        '--max_predict_depth', '100.0',
        '--output_dirpath', out_dir,
        '--save_outputs',
        '--min_evaluate_depth', '0.0',
        '--max_evaluate_depth', '80.0',
    ]
    result = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                            timeout=500)
    assert result.returncode == 0, result.stderr[-3000:]
    assert os.path.exists(os.path.join(out_dir, 'output_depth_fusion',
                                       '0000000000.png'))
    assert os.path.exists(os.path.join(out_dir, 'results.txt'))


def test_run_radarnet_cli(tmp_path):
    from rcfd_tpu.models import RadarNetModel
    manifests = make_radarnet_fixture(str(tmp_path / 'data'), n_samples=2,
                                      height=64, width=96)
    model = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(64, 32),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_neurons_encoder_depth=[8, 12, 16, 16, 16],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[16, 12, 8, 8, 8])
    params, state = model.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / 'model-1.npz')
    model.save_checkpoint(ckpt, params, state, step=1)

    out_dir = str(tmp_path / 'out')
    cmd = [
        sys.executable, os.path.join(REPO, 'run_radarnet.py'),
        '--restore_path', ckpt,
        '--image_path', manifests['image'],
        '--radar_path', manifests['radar'],
        '--ground_truth_path', manifests['ground_truth'],
        '--patch_size', '64', '32',
        '--normalized_image_range', '0', '1',
        '--encoder_type', 'radarnetv1', 'batch_norm',
        '--n_filters_encoder_image', '8', '12', '16', '16', '16',
        '--n_neurons_encoder_depth', '8', '12', '16', '16', '16',
        '--decoder_type', 'multiscale', 'batch_norm',
        '--n_filters_decoder', '16', '12', '8', '8', '8',
        '--output_dirpath', out_dir,
        '--save_outputs',
        '--max_points_inference', '16',
    ]
    result = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                            timeout=500)
    assert result.returncode == 0, result.stderr[-3000:]
    assert os.path.exists(os.path.join(out_dir, 'output_depth_radar',
                                       '0000000000.png'))
    assert os.path.exists(os.path.join(out_dir, 'output_response_radar',
                                       '0000000000.png'))


def test_run_pipeline_cli(tmp_path):
    from rcfd_tpu.models import FusionNetModel, RadarNetModel
    manifests = make_radarnet_fixture(str(tmp_path / 'data'), n_samples=2,
                                      height=64, width=96)

    radarnet = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(64, 32),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_neurons_encoder_depth=[8, 12, 16, 16, 16],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[16, 12, 8, 8, 8])
    rp, rs = radarnet.init(jax.random.PRNGKey(0))
    rn_ckpt = str(tmp_path / 'radarnet-1.npz')
    radarnet.save_checkpoint(rn_ckpt, rp, rs, step=1)

    fusionnet = FusionNetModel(**TINY_FUSION)
    fp, fs = fusionnet.init(jax.random.PRNGKey(1))
    fn_ckpt = str(tmp_path / 'fusionnet-1.npz')
    fusionnet.save_checkpoint(fn_ckpt, fp, fs, step=1)

    out_dir = str(tmp_path / 'out')
    cmd = [
        sys.executable, os.path.join(REPO, 'run_pipeline.py'),
        '--radarnet_restore_path', rn_ckpt,
        '--fusionnet_restore_path', fn_ckpt,
        '--image_path', manifests['image'],
        '--radar_path', manifests['radar'],
        '--ground_truth_path', manifests['ground_truth'],
        '--patch_size', '64', '32',
        '--radarnet_encoder_type', 'radarnetv1', 'batch_norm',
        '--radarnet_n_filters_encoder_image', '8', '12', '16', '16', '16',
        '--radarnet_n_neurons_encoder_depth', '8', '12', '16', '16', '16',
        '--radarnet_n_filters_decoder', '16', '12', '8', '8', '8',
        '--fusionnet_encoder_type', 'fusionnet18', 'batch_norm',
        '--fusionnet_n_filters_encoder_image', '8', '12', '16', '16', '16',
        '--fusionnet_n_filters_encoder_depth', '4', '6', '8', '8', '8',
        '--fusion_type', 'weight_and_project',
        '--fusionnet_n_filters_decoder', '16', '12', '8', '8', '8',
        '--output_dirpath', out_dir,
        '--save_outputs',
        '--max_points_inference', '8',
    ]
    result = subprocess.run(cmd, env=_env(), capture_output=True, text=True,
                            timeout=500)
    assert result.returncode == 0, result.stderr[-3000:]
    assert os.path.exists(os.path.join(out_dir, 'output_depth_fusion',
                                       '0000000000.png'))
    assert os.path.exists(os.path.join(out_dir, 'results.txt'))


def test_run_fusionnet_cli_batched_eval_matches(tmp_path):
    """eval_batch_size > 1 must produce identical metrics and outputs."""
    from rcfd_tpu import fusionnet_main
    from rcfd_tpu.models import FusionNetModel
    manifests = make_fusionnet_fixture(str(tmp_path / 'data'), n_samples=3,
                                       height=32, width=48)
    model = FusionNetModel(**TINY_FUSION)
    params, state = model.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / 'model-1.npz')
    model.save_checkpoint(ckpt, params, state, step=1)

    net = dict(TINY_FUSION)
    net['n_resolutions_decoder'] = net.pop('n_resolution_decoder')
    common = dict(
        restore_path=ckpt,
        image_path=manifests['image'],
        depth_path=manifests['depth'],
        response_path=manifests['response'],
        ground_truth_path=manifests['ground_truth'],
        weight_initializer='kaiming_uniform', activation_func='leaky_relu',
        normalized_image_range=[0, 1],
        save_outputs=False, keep_input_filenames=False, verbose=False,
        min_evaluate_depth=0.0, max_evaluate_depth=80.0, **net)
    # library-level to avoid two more subprocess compiles
    r1 = fusionnet_main.run(output_dirpath=str(tmp_path / 'o1'),
                            eval_batch_size=1, **common)
    r2 = fusionnet_main.run(output_dirpath=str(tmp_path / 'o2'),
                            eval_batch_size=2, **common)
    for k in r1:
        np.testing.assert_allclose(r1[k], r2[k], rtol=1e-6)


def test_run_pipeline_cli_data_parallel(tmp_path):
    """--data_parallel shards the batch over the virtual CPU mesh."""
    from rcfd_tpu.models import FusionNetModel, RadarNetModel
    manifests = make_radarnet_fixture(str(tmp_path / 'data'), n_samples=4,
                                      height=64, width=96)

    radarnet = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(64, 32),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_neurons_encoder_depth=[8, 12, 16, 16, 16],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[16, 12, 8, 8, 8])
    rp, rs = radarnet.init(jax.random.PRNGKey(0))
    rn_ckpt = str(tmp_path / 'radarnet-1.npz')
    radarnet.save_checkpoint(rn_ckpt, rp, rs, step=1)

    fusionnet = FusionNetModel(**TINY_FUSION)
    fp, fs = fusionnet.init(jax.random.PRNGKey(1))
    fn_ckpt = str(tmp_path / 'fusionnet-1.npz')
    fusionnet.save_checkpoint(fn_ckpt, fp, fs, step=1)

    out_dir = str(tmp_path / 'out')
    cmd = [
        sys.executable, os.path.join(REPO, 'run_pipeline.py'),
        '--radarnet_restore_path', rn_ckpt,
        '--fusionnet_restore_path', fn_ckpt,
        '--image_path', manifests['image'],
        '--radar_path', manifests['radar'],
        '--ground_truth_path', manifests['ground_truth'],
        '--patch_size', '64', '32',
        '--radarnet_encoder_type', 'radarnetv1', 'batch_norm',
        '--radarnet_n_filters_encoder_image', '8', '12', '16', '16', '16',
        '--radarnet_n_neurons_encoder_depth', '8', '12', '16', '16', '16',
        '--radarnet_n_filters_decoder', '16', '12', '8', '8', '8',
        '--fusionnet_encoder_type', 'fusionnet18', 'batch_norm',
        '--fusionnet_n_filters_encoder_image', '8', '12', '16', '16', '16',
        '--fusionnet_n_filters_encoder_depth', '4', '6', '8', '8', '8',
        '--fusion_type', 'weight_and_project',
        '--fusionnet_n_filters_decoder', '16', '12', '8', '8', '8',
        '--output_dirpath', out_dir,
        '--save_outputs',
        '--max_points_inference', '8',
        '--batch_size', '4',
        '--data_parallel',
    ]
    env = _env()
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '') +
                        ' --xla_force_host_platform_device_count=4')
    result = subprocess.run(cmd, env=env, capture_output=True, text=True,
                            timeout=500)
    assert result.returncode == 0, result.stderr[-3000:]
    for i in range(4):
        assert os.path.exists(os.path.join(
            out_dir, 'output_depth_fusion', f'{i:010d}.png'))
    txt = open(os.path.join(out_dir, 'results.txt')).read()
    assert 'Data-parallel serving over 4 device(s)' in txt

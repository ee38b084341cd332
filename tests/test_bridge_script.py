"""Stage-1.5 bridge (setup/setup_dataset_nuscenes_radarnet.py) end to end
with a tiny checkpoint: writes depth_predicted/response_predicted PNGs via
the radar_points -> depth_predicted path substitution and emits manifests."""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from PIL import Image

from rcfd_tpu.data import io as data_utils
from rcfd_tpu.models import RadarNetModel

pytestmark = pytest.mark.slow  # CLI/train-loop scale

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_fixture(root, n=2, h=64, w=96, n_points=5):
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, 'image'), exist_ok=True)
    os.makedirs(os.path.join(root, 'radar_points', 'scene_0'), exist_ok=True)
    os.makedirs(os.path.join(root, 'ground_truth', 'scene_0'), exist_ok=True)
    image_paths, radar_paths, gt_paths = [], [], []
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        p = os.path.join(root, 'image', f'{i:04d}.png')
        Image.fromarray(img).save(p)
        image_paths.append(p)
        radar = np.stack([
            rng.integers(0, w, n_points).astype(np.float32),
            rng.integers(0, h, n_points).astype(np.float32),
            rng.random(n_points, dtype=np.float32) * 60 + 1], axis=1)
        p = os.path.join(root, 'radar_points', 'scene_0', f'{i:04d}.npy')
        np.save(p, radar)
        radar_paths.append(p)
        gt = np.zeros((h, w), np.float32)
        gt[rng.integers(0, h, 50), rng.integers(0, w, 50)] = \
            rng.random(50) * 60 + 1
        p = os.path.join(root, 'ground_truth', 'scene_0', f'{i:04d}.png')
        data_utils.save_depth(gt, p)
        gt_paths.append(p)
    img_manifest = os.path.join(root, 'images.txt')
    radar_manifest = os.path.join(root, 'radar.txt')
    gt_manifest = os.path.join(root, 'gt.txt')
    data_utils.write_paths(img_manifest, image_paths)
    data_utils.write_paths(radar_manifest, radar_paths)
    data_utils.write_paths(gt_manifest, gt_paths)
    return img_manifest, radar_manifest, radar_paths, gt_manifest


def test_bridge_script_end_to_end(tmp_path):
    img_m, radar_m, radar_paths, gt_m = _make_fixture(str(tmp_path / 'data'))

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

    out_dir = str(tmp_path / 'derived')
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PALLAS_AXON_POOL_IPS', None)
    cmd = [
        sys.executable,
        os.path.join(REPO, 'setup', 'setup_dataset_nuscenes_radarnet.py'),
        '--restore_path', ckpt,
        '--val_image_path', img_m,
        '--val_radar_path', radar_m,
        '--output_dirpath', out_dir,
        '--patch_size', '64', '32',
        '--encoder_type', 'radarnetv1', 'batch_norm',
        '--n_filters_encoder_image', '8', '12', '16', '16', '16',
        '--n_neurons_encoder_depth', '8', '12', '16', '16', '16',
        '--decoder_type', 'multiscale', 'batch_norm',
        '--n_filters_decoder', '16', '12', '8', '8', '8',
        '--max_points_inference', '8',
        '--val_ground_truth_path', gt_m,
        '--run_evaluation',
    ]
    result = subprocess.run(cmd, env=env, capture_output=True, text=True,
                            timeout=500)
    assert result.returncode == 0, result.stderr[-3000:]
    # the optional eval prints intersection metrics (reference :352-415)
    assert 'Evaluation results' in result.stdout
    assert 'n_isect' in result.stdout

    # outputs derived via the radar_points -> depth_predicted substitution
    for p in radar_paths:
        depth_png = p.replace('radar_points', 'depth_predicted')\
            .replace('.npy', '.png')
        response_png = p.replace('radar_points', 'response_predicted')\
            .replace('.npy', '.png')
        assert os.path.exists(depth_png), depth_png
        assert os.path.exists(response_png), response_png
        d = data_utils.load_depth(depth_png)
        assert d.shape == (64, 96)

    manifest = os.path.join(out_dir, 'validation', 'nuscenes',
                            'nuscenes_val_depth_predicted.txt')
    assert os.path.exists(manifest)
    assert len(data_utils.read_paths(manifest)) == 2
    assert os.path.exists(manifest.replace('.txt', '-subset.txt'))


def test_bridge_script_codec_d2h_identical_artifacts(tmp_path):
    """Production passes (no --run_evaluation) take the codec-grid D2H
    path (uint16 on device, setup_dataset_nuscenes_radarnet.py); their
    PNG artifacts must be byte-identical to the eval pass's float32
    path."""
    import hashlib

    img_m, radar_m, radar_paths, gt_m = _make_fixture(str(tmp_path / 'data'))

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

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('PALLAS_AXON_POOL_IPS', None)
    base_cmd = [
        sys.executable,
        os.path.join(REPO, 'setup', 'setup_dataset_nuscenes_radarnet.py'),
        '--restore_path', ckpt,
        '--val_image_path', img_m,
        '--val_radar_path', radar_m,
        '--patch_size', '64', '32',
        '--encoder_type', 'radarnetv1', 'batch_norm',
        '--n_filters_encoder_image', '8', '12', '16', '16', '16',
        '--n_neurons_encoder_depth', '8', '12', '16', '16', '16',
        '--decoder_type', 'multiscale', 'batch_norm',
        '--n_filters_decoder', '16', '12', '8', '8', '8',
        '--max_points_inference', '8',
    ]

    def run_and_hash(out_dir, extra):
        result = subprocess.run(
            base_cmd + ['--output_dirpath', out_dir] + extra,
            env=env, capture_output=True, text=True, timeout=500)
        assert result.returncode == 0, result.stderr[-3000:]
        hashes = {}
        for p in radar_paths:
            for stream in ('depth_predicted', 'response_predicted'):
                png = p.replace('radar_points', stream)\
                    .replace('.npy', '.png')
                with open(png, 'rb') as f:
                    hashes[(stream, os.path.basename(png))] = \
                        hashlib.sha1(f.read()).hexdigest()
        return hashes

    # production pass first (codec D2H), then the f32 eval pass
    # overwrites the same artifact paths — hash between runs
    h_codec = run_and_hash(str(tmp_path / 'out1'), [])
    h_f32 = run_and_hash(
        str(tmp_path / 'out2'),
        ['--val_ground_truth_path', gt_m, '--run_evaluation'])
    assert h_codec == h_f32

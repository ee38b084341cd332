"""Legacy v0 pipeline end to end: pickle manifests -> train (3-class
labels, point-centered crops, v0 network) -> checkpoint with the legacy
.pth keys -> save_stage_1 (quasi-dense PNGs + pickled manifests) ->
eval_stage_1. Mirrors reference src/main.py / save_stage_1_depth.py /
eval_stage_1_depth.py at tiny scale."""

import os

import numpy as np
import pytest

import jax

from rcfd_tpu import legacy_main
from rcfd_tpu.data import io as data_utils
from rcfd_tpu.data.legacy_datasets import (load_pickle_paths,
                                           save_pickle_paths)

pytestmark = pytest.mark.slow  # CLI/train-loop scale

H, W = 64, 96
PATCH = (64, 32)


def _make_fixture(root, n=3, n_points=4):
    from PIL import Image
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, 'images'), exist_ok=True)
    os.makedirs(os.path.join(root, 'gt'), exist_ok=True)
    os.makedirs(os.path.join(root, 'radar'), exist_ok=True)
    gt_paths, radar_paths = [], []
    for i in range(n):
        name = f'sample_{i:03d}'
        img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, 'images', name + '.png'))
        gt = np.zeros((H, W), np.float32)
        ys = rng.integers(0, H, 60)
        xs = rng.integers(0, W, 60)
        gt[ys, xs] = rng.random(60) * 60 + 1
        gt_p = os.path.join(root, 'gt', name + '.png')
        data_utils.save_depth(gt, gt_p)
        gt_paths.append(gt_p)
        radar = np.stack([
            rng.integers(0, W, n_points).astype(np.float32),
            rng.integers(0, H, n_points).astype(np.float32),
            rng.random(n_points, dtype=np.float32) * 60 + 1], axis=1)
        radar_p = os.path.join(root, 'radar', name + '.npy')
        np.save(radar_p, radar)
        radar_paths.append(radar_p)
    manifests = {}
    for tag, paths in [('gt', gt_paths), ('radar', radar_paths)]:
        p = os.path.join(root, tag + '.pkl')
        save_pickle_paths(p, paths)
        manifests[tag] = p
    return manifests, os.path.join(root, 'images')


def test_legacy_pipeline_end_to_end(tmp_path):
    root = str(tmp_path)
    manifests, image_dir = _make_fixture(root)
    ckpt_dir = os.path.join(root, 'ckpt')

    best = legacy_main.train(
        path_to_pickle_file_gt_train_paths=manifests['gt'],
        path_to_pickle_file_radar_train_numpys=manifests['radar'],
        path_to_pickle_file_gt_val_paths=manifests['gt'],
        path_to_pickle_file_radar_val_numpys=manifests['radar'],
        data_path='', image_path=image_dir, epsilon=0.4,
        batch_size=3, patch_size=list(PATCH),
        normalized_image_range=[0, 1],
        learning_rates=[1e-4], learning_schedule=[2],
        augmentation_probabilities=[1.0], augmentation_schedule=[-1],
        augmentation_random_brightness=[0.8, 1.2],
        augmentation_random_noise_type='none',
        augmentation_random_noise_spread=-1,
        augmentation_random_flip_type=['horizontal'],
        w_cross_entropy=1.0, w_smoothness=1e-3,
        w_weight_decay=0.0, kernel_size_smoothness=[7, 7],
        set_invalid_to_negative=False, w_positive_class=2.0,
        checkpoint_dirpath=ckpt_dir, num_step_per_summary=1,
        num_step_per_checkpoint=2, start_step_validation=1,
        max_points_inference=8, num_workers=1)
    assert 'mae_intersection' in best

    ckpts = [f for f in os.listdir(ckpt_dir) if f.startswith('model-')]
    assert ckpts, os.listdir(ckpt_dir)
    ckpt_path = os.path.join(ckpt_dir, sorted(ckpts)[-1])

    # legacy checkpoint keys (reference src/main.py:819-842)
    if ckpt_path.endswith('.pth'):
        from rcfd_tpu.utils.checkpoint import load_torch_checkpoint
        raw = load_torch_checkpoint(ckpt_path)
        assert set(raw) >= {'train_step', 'model_state_dict',
                            'optimizer_state_dict'}

    out_dir = os.path.join(root, 'stage1_out')
    out_pkl = os.path.join(root, 'out_paths.pkl')
    resp_pkl = os.path.join(root, 'resp_paths.pkl')
    depth_paths, response_paths = legacy_main.save_stage_1(
        restore_path=ckpt_path,
        path_to_pickle_file_gt_paths=manifests['gt'],
        path_to_pickle_file_radar_numpy_paths=manifests['radar'],
        image_dirpath=image_dir, output_dirpath=out_dir,
        patch_size=PATCH, max_points_inference=8,
        file_to_save_radar_output_paths=out_pkl,
        file_to_save_radar_response_paths=resp_pkl)
    assert len(depth_paths) == 3
    for p in depth_paths + response_paths:
        assert os.path.exists(p)
    assert load_pickle_paths(out_pkl) == depth_paths
    d = data_utils.load_depth(depth_paths[0])
    assert d.shape == (H, W)

    results = legacy_main.eval_stage_1(
        path_to_pickle_file_output_paths=out_pkl,
        path_to_pickle_file_gt_paths=manifests['gt'])
    assert set(results) == {'mae', 'rmse', 'imae', 'irmse'}

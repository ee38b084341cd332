"""Stage-0 scene walker (setup/setup_dataset_nuscenes.process_scene) over
the fake 2-frame DB: verifies every artifact stream and path list."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'setup'))

from test_nuscenes_adapter import (EXTRA_FRAME1, FakeNusc, POINTS_FRAME0,
                                   POINTS_FRAME1)

from rcfd_tpu.data import io as data_utils
from rcfd_tpu.geometry import nuscenes_adapter as adapter

import setup_dataset_nuscenes as setup_script


class FakeNuscWithScene(FakeNusc):
    def __init__(self):
        super().__init__()
        self.scene = [{'token': 'scene0', 'first_sample_token': 's0',
                       'name': 'scene-0000'}]
        # radar sample_data records (colocated with the lidar for the fake)
        for i, ego in [(0, 'ego0'), (1, 'ego1')]:
            self._tables['sample_data'][f'r{i}'] = {
                'token': f'r{i}', 'calibrated_sensor_token': 'cs_lidar',
                'ego_pose_token': ego, 'filename': f'radar{i}.pcd',
                'timestamp': i * 500000, 'next': '', 'prev': ''}


@pytest.fixture
def patched(monkeypatch, tmp_path):
    nusc = FakeNuscWithScene()
    monkeypatch.setattr(setup_script, '_build_nusc', lambda d, v: nusc)

    def fake_load(nusc_, sensor_token, sensor='lidar'):
        # radar and lidar share the synthetic clouds for this test
        if sensor_token in ('l0', 'r0'):
            return POINTS_FRAME0.copy()
        return np.concatenate([POINTS_FRAME1, EXTRA_FRAME1], axis=0)

    monkeypatch.setattr(adapter, 'load_point_cloud', fake_load)
    monkeypatch.setattr(adapter, 'mover_boxes_image_frame',
                        lambda n, c: np.zeros((0, 4), np.int64))
    # the fake scene has only a handful of points; skip Qhull (needs a
    # non-degenerate triangulation) with a passthrough
    monkeypatch.setattr(data_utils, 'interpolate_depth',
                        lambda dm, vm, log_space=False: dm)
    # sample['data'] carries a RADAR_FRONT token for the fake
    return nusc, str(tmp_path)


def test_process_scene_artifacts(patched):
    nusc, out_dir = patched
    scene_id, paths = setup_script.process_scene(
        (0, '/nonexistent', 'v1.0-fake', out_dir, 1, 1, False, None))
    assert scene_id == 0
    # two keyframes per stream
    for name in ['image', 'lidar', 'radar_points',
                 'radar_points_reprojected', 'ground_truth',
                 'ground_truth_interp']:
        assert len(paths[name]) == 2, name

    # single-scan lidar depth PNG has exactly the 3 frame-0 points
    lidar0 = data_utils.load_depth(paths['lidar'][0])
    assert (lidar0 > 0).sum() == len(POINTS_FRAME0)

    # merged GT accumulates the neighbor frame (4 points, quantized x256)
    gt0 = data_utils.load_depth(paths['ground_truth'][0])
    assert (gt0 > 0).sum() == 4

    # Stream semantics must match the reference
    # (setup/setup_dataset_nuscenes.py:1025-1037,1083-1084):
    # radar_points/ holds the SINGLE-FRAME projection (what RadarNet
    # trains/infers on), radar_points_reprojected/ the ±N accumulation.
    radar0 = np.load(paths['radar_points'][0])
    assert radar0.shape[1] == 3
    assert radar0.shape[0] == len(POINTS_FRAME0)  # frame-0 returns only
    merged0 = np.load(paths['radar_points_reprojected'][0])
    assert merged0.shape[1] == 3
    assert merged0.shape[0] == 4  # ±1-frame merge accumulates a neighbor
    # accumulation must add points over the single-frame stream
    assert merged0.shape[0] > radar0.shape[0]


def test_official_data_split_ships_in_tree():
    """The official 700/150 scene-id split (the experiment contract the
    reference ships in data_split/) must resolve from the setup scripts'
    default --data_split_dirpath."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    split_dir = os.path.join(repo_root, 'data_split')
    train_ids, val_ids = setup_script.get_train_val_split_ids(split_dir)
    assert len(train_ids) == 700
    assert len(val_ids) == 150
    ids = list(train_ids) + list(val_ids)
    assert not set(train_ids) & set(val_ids)
    assert min(ids) >= 0 and max(ids) <= 849
    assert all(isinstance(i, int) for i in ids)


def test_process_scene_paths_only(patched):
    nusc, out_dir = patched
    _, paths = setup_script.process_scene(
        (0, '/nonexistent', 'v1.0-fake', out_dir, 1, 1, True, None))
    assert len(paths['image']) == 2
    # nothing computed
    assert not os.path.exists(paths['lidar'][0])


def test_legacy_data_gen_over_fake_db(patched, monkeypatch):
    """setup/data_gen.py process_scene over the fake 2-frame DB: GT depth
    PNGs, per-point 3-class label PNGs, radar npy, Data_Struct records
    (reference setup/data_gen_train.py:1035-1267)."""
    import data_gen

    nusc, out_dir = patched
    monkeypatch.setattr(data_gen, '_build_nusc', lambda d, v: nusc)
    # make registration succeed: lidar/radar share synthetic clouds, so
    # every radar point registers to itself at distance 0
    records = data_gen.process_scene(
        (0, '/nonexistent', 'v1.0-fake', out_dir, 'train', 1, 2, 0.4, 0.6))
    assert records, 'no samples produced'
    for (scene_id, sample_id), items in records.items():
        assert scene_id == 0
        item = items[0]
        assert os.path.exists(item.ground_truth_depth_path)
        radar = np.load(item.radar_points_path)
        assert radar.ndim == 2 and radar.shape[1] == 3
        # one 3-class label PNG per registered radar point
        from PIL import Image
        for p in range(radar.shape[0]):
            lab_path = item.ground_truth_label_path.format(p)
            assert os.path.exists(lab_path), lab_path
            lab = np.asarray(Image.open(lab_path))
            assert set(np.unique(lab)) <= {0, 1, 2}
            assert (lab == 1).sum() >= 1  # the matched points
            assert (lab == 2).sum() > 0   # invalid background

"""save_depth_radar.py: the single-pickle Data_Struct manifest contract
(reference src/save_depth_radar.py:7-14, bash/train_nuscenes.sh).

The reference entry point is bit-rotted (mismatched kwargs against
main.train, see save_depth_radar.py's module docstring); these tests pin
the manifest-unpacking behavior our working port provides instead.
"""

import os
import pickle
import sys
from typing import NamedTuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from save_depth_radar import unpack_data_struct_manifest


class DataStruct(NamedTuple):
    scene_id: int
    sample_idx: int
    image_path: str
    radar_points_path: str
    ground_truth_label_path: str
    ground_truth_depth_path: str


def test_unpack_named_tuple_dict(tmp_path):
    """setup/data_gen.py's output format: dict idx -> NamedTuple."""
    manifest = {
        i: DataStruct(0, i, f'img_{i}.jpg', f'radar_{i}.npy',
                      f'label_{i}.png', f'depth_{i}.png')
        for i in range(3)
    }
    p = str(tmp_path / 'm.pkl')
    with open(p, 'wb') as f:
        pickle.dump(manifest, f)
    gt, radar = unpack_data_struct_manifest(p)
    assert gt == ['label_0.png', 'label_1.png', 'label_2.png']
    assert radar == ['radar_0.npy', 'radar_1.npy', 'radar_2.npy']


def test_unpack_data_gen_one_element_lists(tmp_path):
    """The actual data_gen output shape: every dict value is a ONE-ELEMENT
    LIST holding the record (reference setup/data_gen_train.py:1211-1212).
    Train records are 6-field with the radar entry as a path."""
    manifest = {
        (0, i): [(0, i, f'img_{i}.jpg', f'radar_{i}.npy',
                  f'label_{i}.png', f'depth_{i}.png')]
        for i in range(3)
    }
    p = str(tmp_path / 'm.pkl')
    with open(p, 'wb') as f:
        pickle.dump(manifest, f)
    gt, radar = unpack_data_struct_manifest(p)
    assert gt == ['label_0.png', 'label_1.png', 'label_2.png']
    assert radar == ['radar_0.npy', 'radar_1.npy', 'radar_2.npy']


def test_unpack_val_ndarray_radar_materializes(tmp_path):
    """val/test manifests (7-field Data_Struct, data_gen_val.py:42-49)
    store input_points as an in-memory ndarray: it must be saved to a
    .npy file so the path-based legacy dataset can consume it."""
    pts = [np.arange(6, dtype=np.float32).reshape(2, 3) + i
           for i in range(2)]
    manifest = {
        (0, i): [(0, i, f'img_{i}.jpg', np.zeros((4, 2)), pts[i],
                  f'label_{i}.png', f'depth_{i}.png')]
        for i in range(2)
    }
    p = str(tmp_path / 'm.pkl')
    with open(p, 'wb') as f:
        pickle.dump(manifest, f)
    out = tmp_path / 'mat'
    out.mkdir()
    gt, radar = unpack_data_struct_manifest(p, materialize_dirpath=str(out))
    assert gt == ['label_0.png', 'label_1.png']
    for i, rp in enumerate(radar):
        assert rp.endswith('.npy') and os.path.exists(rp)
        np.testing.assert_array_equal(np.load(rp), pts[i])
    # without a materialize dir the array case must fail loudly
    import pytest
    with pytest.raises(ValueError):
        unpack_data_struct_manifest(p)


def test_unpack_reference_field_order(tmp_path):
    """Plain tuples in the reference's 7-field Data_Struct order
    (src/save_depth_radar.py:7-14): label path at index 5, input points
    at index 4."""
    manifest = [
        (0, i, f'img_{i}.jpg', np.zeros((2, 3)), f'radar_{i}.npy',
         f'label_{i}.png', f'depth_{i}.png')
        for i in range(2)
    ]
    p = str(tmp_path / 'm.pkl')
    with open(p, 'wb') as f:
        pickle.dump(manifest, f)
    gt, radar = unpack_data_struct_manifest(p)
    assert gt == ['label_0.png', 'label_1.png']
    assert radar == ['radar_0.npy', 'radar_1.npy']

def test_unpack_two_manifests_share_dir_without_collision(tmp_path):
    """__main__ materializes train AND val into ONE tmpdir; distinct
    prefixes must keep the index-keyed .npy files from overwriting each
    other (round-4 review finding)."""
    def make(pickle_name, base):
        pts = [np.full((2, 3), base + i, dtype=np.float32)
               for i in range(2)]
        manifest = {
            (0, i): [(0, i, f'img_{i}.jpg', np.zeros((4, 2)), pts[i],
                      f'label_{base}_{i}.png', f'depth_{i}.png')]
            for i in range(2)
        }
        p = str(tmp_path / pickle_name)
        with open(p, 'wb') as f:
            pickle.dump(manifest, f)
        return p, pts

    train_p, train_pts = make('train.pkl', 100)
    val_p, val_pts = make('val.pkl', 200)
    out = tmp_path / 'mat'
    out.mkdir()
    _, radar_train = unpack_data_struct_manifest(
        train_p, materialize_dirpath=str(out), materialize_prefix='train_')
    _, radar_val = unpack_data_struct_manifest(
        val_p, materialize_dirpath=str(out), materialize_prefix='val_')
    assert set(radar_train).isdisjoint(radar_val)
    for i, rp in enumerate(radar_train):
        np.testing.assert_array_equal(np.load(rp), train_pts[i])
    for i, rp in enumerate(radar_val):
        np.testing.assert_array_equal(np.load(rp), val_pts[i])

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

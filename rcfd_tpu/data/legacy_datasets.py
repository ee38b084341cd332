"""Legacy v0 pickle-manifest datasets (reference src/dataset.py).

The v0 pipeline's experiment contract is a set of PICKLED path lists
(written by setup/data_gen_*.py) instead of newline .txt manifests, with
images resolved by replacing the ground-truth basename's extension inside
a flat nuScenes CAM_FRONT directory (reference src/dataset.py:34-45).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Sequence

import numpy as np

from . import io as data_utils
from .datasets import pad_points


def load_pickle_paths(path: str):
    """Read a pickled path list (the v0 manifest format)."""
    with open(path, 'rb') as f:
        return pickle.load(f)


def save_pickle_paths(path: str, paths: Sequence[str]):
    with open(path, 'wb') as f:
        pickle.dump(list(paths), f)


def _image_path_for(gt_path: str, image_dirpath: str) -> str:
    """gt .../TOKEN.png -> image_dir/TOKEN.jpg (src/dataset.py:37-45);
    falls back to .png when the .jpg does not exist (synthetic fixtures)."""
    name = os.path.splitext(os.path.basename(gt_path))[0]
    jpg = os.path.join(image_dirpath, name + '.jpg')
    if os.path.exists(jpg):
        return jpg
    return os.path.join(image_dirpath, name + '.png')


class BinaryClassificationDataset:
    """Training: full image + ONE randomly sampled radar point + full GT
    (reference src/dataset.py:54-146). The point-centered crop happens in
    the jitted transform (models/legacy_v0.crop_image_to_shape_on_point),
    mirroring the reference's Transforms(crop_image_to_shape_on_point=...)."""

    def __init__(self, ground_truth_paths, radar_points_paths,
                 image_dirpath: str, data_dirpath: str = ''):
        assert len(ground_truth_paths) == len(radar_points_paths)
        self.n_sample = len(ground_truth_paths)
        self.ground_truth_paths = ground_truth_paths
        self.radar_points_paths = radar_points_paths
        self.image_dirpath = image_dirpath
        self.data_dirpath = data_dirpath

    def __len__(self):
        return self.n_sample

    def get(self, index: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        gt_path = os.path.join(self.data_dirpath,
                               self.ground_truth_paths[index])
        radar_path = os.path.join(self.data_dirpath,
                                  self.radar_points_paths[index])
        image = data_utils.load_image(
            _image_path_for(gt_path, self.image_dirpath),
            normalize=False, data_format='HWC')
        radar_points = np.load(radar_path).astype(np.float32)
        if radar_points.ndim == 1:
            radar_points = radar_points[None]
        point = radar_points[int(rng.integers(0, radar_points.shape[0]))]
        ground_truth = data_utils.load_depth(gt_path, data_format='HWC')
        return (image.astype(np.float32), point.astype(np.float32),
                ground_truth.astype(np.float32))


class BinaryClassificationDatasetVal:
    """Validation: full image + ALL radar points (padded) + GT
    (reference src/dataset.py:147-219)."""

    def __init__(self, ground_truth_paths, radar_points_paths,
                 image_dirpath: str, data_dirpath: str = '',
                 max_points: int = 128):
        assert len(ground_truth_paths) == len(radar_points_paths)
        self.n_sample = len(ground_truth_paths)
        self.ground_truth_paths = ground_truth_paths
        self.radar_points_paths = radar_points_paths
        self.image_dirpath = image_dirpath
        self.data_dirpath = data_dirpath
        self.max_points = max_points

    def __len__(self):
        return self.n_sample

    def get(self, index: int, rng=None):
        gt_path = os.path.join(self.data_dirpath,
                               self.ground_truth_paths[index])
        radar_path = os.path.join(self.data_dirpath,
                                  self.radar_points_paths[index])
        image = data_utils.load_image(
            _image_path_for(gt_path, self.image_dirpath),
            normalize=False, data_format='HWC')
        radar_points = np.load(radar_path).astype(np.float32)
        if radar_points.ndim == 1:
            radar_points = radar_points[None]
        points, valid = pad_points(radar_points, self.max_points)
        ground_truth = data_utils.load_depth(gt_path, data_format='HWC')
        return (image.astype(np.float32), points, valid,
                ground_truth.astype(np.float32))


class SaveStage1OutputDataset(BinaryClassificationDatasetVal):
    """Stage-1 output writer's inference dataset: same tuple as Val plus
    the frame's camera image name (reference src/dataset.py:10-51)."""

    def get(self, index: int, rng=None):
        out = super().get(index, rng)
        gt_path = os.path.join(self.data_dirpath,
                               self.ground_truth_paths[index])
        name = os.path.splitext(os.path.basename(gt_path))[0]
        return out + (name,)

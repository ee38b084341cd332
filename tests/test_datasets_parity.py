"""Dataset parity vs the reference dataset classes on identical files.

Inference datasets are deterministic (no RNG), so outputs must match the
reference exactly up to the NCHW->NHWC layout change. Training datasets
differ only in RNG plumbing (explicit Generator vs global np.random) —
their deterministic sub-behaviors (padding, box construction, crop
geometry) are covered by structural assertions.
"""

import numpy as np
import pytest

from fixtures import make_fusionnet_fixture, make_radarnet_fixture

from rcfd_tpu.data import io as data_utils
from rcfd_tpu.data import transport
from rcfd_tpu.data.datasets import (FusionNetInferenceDataset,
                                    RadarNetInferenceDataset,
                                    RadarNetTrainingDataset)

from reference_import import import_reference


def test_fusionnet_inference_dataset_parity(tmp_path):
    ref_datasets = import_reference('datasets')
    manifests = make_fusionnet_fixture(str(tmp_path), n_samples=3,
                                       height=32, width=48)
    paths = {k: data_utils.read_paths(v) for k, v in manifests.items()}

    ref_ds = ref_datasets.FusionNetInferenceDataset(
        image_paths=paths['image'], depth_paths=paths['depth'],
        response_paths=paths['response'],
        ground_truth_paths=paths['ground_truth'])
    ours = FusionNetInferenceDataset(
        image_paths=paths['image'], depth_paths=paths['depth'],
        response_paths=paths['response'],
        ground_truth_paths=paths['ground_truth'])

    for idx in range(3):
        ref_items = ref_ds[idx]
        # default integer transport: decode_np recovers the exact floats
        our_items = transport.decode_np(ours.get(idx))
        assert len(ref_items) == len(our_items) == 4
        for r, o in zip(ref_items, our_items):
            # reference is CHW; ours is HWC
            np.testing.assert_array_equal(np.transpose(o, (2, 0, 1)), r)


@pytest.mark.smoke
def test_radarnet_inference_dataset_parity(tmp_path):
    ref_datasets = import_reference('datasets')
    manifests = make_radarnet_fixture(str(tmp_path), n_samples=2,
                                      height=32, width=48, n_points=7)
    paths = {k: data_utils.read_paths(v) for k, v in manifests.items()}

    ref_ds = ref_datasets.RadarNetInferenceDataset(
        image_paths=paths['image'], radar_paths=paths['radar'],
        ground_truth_paths=paths['ground_truth'])
    ours = RadarNetInferenceDataset(
        image_paths=paths['image'], radar_paths=paths['radar'],
        ground_truth_paths=paths['ground_truth'], max_points=16)

    for idx in range(2):
        ref_image, ref_points, ref_gt = ref_ds[idx]
        image, points, valid, gt = transport.decode_np(ours.get(idx))
        np.testing.assert_array_equal(np.transpose(image, (2, 0, 1)),
                                      ref_image)
        np.testing.assert_array_equal(np.transpose(gt, (2, 0, 1)), ref_gt)
        n = ref_points.shape[0]
        assert valid[:n].all() and not valid[n:].any()
        np.testing.assert_array_equal(points[:n], ref_points)
        assert (points[n:] == 0).all()


def test_radarnet_training_dataset_structure(tmp_path):
    """Deterministic sub-behaviors of the training dataset: edge padding,
    full-height fixed-width boxes, bottom-rows crop geometry."""
    manifests = make_radarnet_fixture(str(tmp_path), n_samples=1,
                                      height=40, width=64, n_points=9)
    paths = {k: data_utils.read_paths(v) for k, v in manifests.items()}
    patch = (32, 16)
    pad = patch[1] // 2
    ds = RadarNetTrainingDataset(
        image_paths=paths['image'], radar_paths=paths['radar'],
        ground_truth_paths=paths['ground_truth'], patch_size=patch,
        total_points_sampled=4, sample_probability_of_lidar=0.0)
    rng = np.random.default_rng(0)
    image, points, boxes, gt_crops = ds.get(0, rng)

    assert image.shape == (patch[0], 64 + 2 * pad, 3)
    assert points.shape == (4, 3)
    assert boxes.shape == (4, 4)
    assert gt_crops.shape == (4, patch[0], patch[1], 1)
    # boxes are [x - pad, 0, x + pad, patch_h] around the shifted x
    np.testing.assert_array_equal(boxes[:, 0], points[:, 0] - pad)
    np.testing.assert_array_equal(boxes[:, 2], points[:, 0] + pad)
    np.testing.assert_array_equal(boxes[:, 1], 0)
    np.testing.assert_array_equal(boxes[:, 3], patch[0])
    # edge padding: first pad columns replicate the original column 0
    raw = data_utils.load_image(paths['image'][0])[40 - patch[0]:]
    np.testing.assert_array_equal(image[:, 0], raw[:, 0])
    np.testing.assert_array_equal(image[:, pad - 1], raw[:, 0])
    np.testing.assert_array_equal(image[:, pad:pad + 64], raw)


def test_pad_points_warns_on_truncation(rng):
    import warnings
    from rcfd_tpu.data.datasets import pad_points
    pts = rng.random((10, 3)).astype(np.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        out, valid = pad_points(pts, 4)
        assert any('truncating' in str(x.message) for x in w)
    assert valid.sum() == 4


def test_inference_dataset_auto_sizes_max_points(tmp_path, rng):
    from PIL import Image
    from rcfd_tpu.data.datasets import (RadarNetInferenceDataset,
                                        max_points_in_files)
    img_path = str(tmp_path / 'f.png')
    Image.fromarray(rng.integers(0, 255, (8, 8, 3)).astype('uint8')).save(
        img_path)
    radar_paths = []
    for i, n in enumerate([3, 17, 9]):
        p = str(tmp_path / f'r{i}.npy')
        np.save(p, rng.random((n, 3)).astype(np.float32))
        radar_paths.append(p)
    assert max_points_in_files(radar_paths) == 17
    ds = RadarNetInferenceDataset([img_path] * 3, radar_paths,
                                  max_points=None)
    assert ds.max_points == 24  # 17 rounded up to a multiple of 8
    _, points, valid = ds.get(1)
    assert points.shape == (24, 3)
    assert valid.sum() == 17


@pytest.mark.smoke
def test_auto_size_is_the_default_no_truncation(tmp_path, rng):
    """An over-128-point frame round-trips untruncated under the CLI
    defaults (the reference processes every point,
    src/radarnet_main.py:958-990); the static cap is opt-in only."""
    import warnings
    from PIL import Image
    from rcfd_tpu.data.datasets import RadarNetInferenceDataset

    # every inference-surface CLI now defaults to auto-size (<= 0);
    # load by explicit path — reference_import puts /root/reference/src
    # on sys.path, which shadows same-named scripts
    import importlib.util
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def load(name, relpath):
        spec = importlib.util.spec_from_file_location(
            'ours_' + name, os.path.join(repo, relpath))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    for relpath in ('run_radarnet.py', 'run_pipeline.py',
                    'train_radarnet.py'):
        mod = load(relpath[:-3], relpath)
        assert mod.parser.get_default('max_points_inference') <= 0, relpath
    bridge = load('bridge', 'setup/setup_dataset_nuscenes_radarnet.py')
    assert bridge.build_parser().get_default('max_points_inference') <= 0

    img_path = str(tmp_path / 'f.png')
    Image.fromarray(rng.integers(0, 255, (8, 8, 3)).astype('uint8')).save(
        img_path)
    radar_path = str(tmp_path / 'big.npy')
    pts = rng.random((200, 3)).astype(np.float32)
    np.save(radar_path, pts)

    ds = RadarNetInferenceDataset([img_path], [radar_path], max_points=None)
    with warnings.catch_warnings():
        warnings.simplefilter('error', RuntimeWarning)  # truncation warns
        _, points, valid = ds.get(0)
    assert valid.sum() == 200
    np.testing.assert_array_equal(points[:200], pts)


def test_radarnet_get_batch_matches_per_sample(tmp_path, rng, monkeypatch):
    """RadarNet training batched decode must reproduce per-sample batches
    exactly (PNG-backed images), incl. the identical RNG streams."""
    from rcfd_tpu.data.datasets import RadarNetTrainingDataset
    m = make_radarnet_fixture(str(tmp_path), n_samples=4, height=48,
                              width=64, n_points=6)
    ds = RadarNetTrainingDataset(
        image_paths=data_utils.read_paths(m['image']),
        radar_paths=data_utils.read_paths(m['radar']),
        ground_truth_paths=data_utils.read_paths(m['ground_truth']),
        patch_size=(32, 16), total_points_sampled=2,
        sample_probability_of_lidar=0.5)
    indices = [1, 3, 0]

    def rngs():
        return [np.random.default_rng((3, 1, p)) for p in range(3)]

    per_sample = [ds.get(i, r) for i, r in zip(indices, rngs())]
    expect = tuple(np.stack([s[j] for s in per_sample], axis=0)
                   for j in range(4))
    monkeypatch.setenv('RCFD_NATIVE_IO', '1')
    got = ds.get_batch(indices, rngs())
    for a, b in zip(got, expect):
        np.testing.assert_array_equal(a, b)

"""Decode-once raw cache (rcfd_tpu/data/raw_cache.py): bit-identical
loads, the x256-of-a-response-PNG multiplier quirk across one cached
decode, mtime invalidation, and the epoch-2 speedup that justifies it."""

import os
import time

import numpy as np
import pytest

from rcfd_tpu.data import io as data_utils
from rcfd_tpu.data import raw_cache


@pytest.fixture
def cache(tmp_path):
    d = str(tmp_path / 'cache')
    raw_cache.set_raw_cache(d)
    yield d
    raw_cache.set_raw_cache(None)


@pytest.mark.smoke
def test_cached_loads_bit_identical(tmp_path, cache, rng):
    from PIL import Image

    img = (rng.random((24, 32, 3)) * 255).astype(np.uint8)
    ipath = str(tmp_path / 'img.png')
    Image.fromarray(img).save(ipath)
    depth = rng.random((24, 32), dtype=np.float32) * 90
    dpath = str(tmp_path / 'depth.png')
    data_utils.save_depth(depth, dpath)
    resp = rng.random((24, 32), dtype=np.float32)
    rpath = str(tmp_path / 'resp.png')
    data_utils.save_response(resp, rpath)

    # reference values with the cache OFF
    raw_cache.set_raw_cache(None)
    ref_img = data_utils.load_image(ipath)
    ref_depth = data_utils.load_depth(dpath)
    ref_resp_as_depth = data_utils.load_depth(rpath)  # the x64 quirk read
    ref_resp = data_utils.load_response(rpath)

    raw_cache.set_raw_cache(cache)
    for _ in range(2):  # first pass decodes+writes, second hits the cache
        np.testing.assert_array_equal(data_utils.load_image(ipath), ref_img)
        np.testing.assert_array_equal(data_utils.load_depth(dpath),
                                      ref_depth)
        # same FILE read under both multipliers: one cached decode,
        # two rescales
        np.testing.assert_array_equal(data_utils.load_depth(rpath),
                                      ref_resp_as_depth)
        np.testing.assert_array_equal(data_utils.load_response(rpath),
                                      ref_resp)
    assert len(os.listdir(cache)) == 3  # one entry per FILE, not per read


@pytest.mark.smoke
def test_cache_invalidates_on_rewrite(tmp_path, cache, rng):
    dpath = str(tmp_path / 'd.png')
    data_utils.save_depth(rng.random((8, 8), dtype=np.float32) * 50, dpath)
    first = data_utils.load_depth(dpath)
    assert data_utils.load_depth(dpath) is not None
    new = rng.random((8, 8), dtype=np.float32) * 50
    time.sleep(0.01)  # ensure mtime_ns moves
    data_utils.save_depth(new, dpath)
    reloaded = data_utils.load_depth(dpath)
    assert not np.array_equal(reloaded, first)
    np.testing.assert_allclose(reloaded, np.floor(new * 256) / 256,
                               atol=1e-6)


def test_cache_speeds_up_second_epoch(tmp_path, cache, rng):
    from PIL import Image

    paths = []
    for i in range(6):
        img = (rng.random((300, 400, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / f'{i}.png')
        Image.fromarray(img).save(p)
        paths.append(p)

    t0 = time.perf_counter()
    for p in paths:
        data_utils.load_image(p)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    for p in paths:
        data_utils.load_image(p)
    warm = time.perf_counter() - t0
    assert warm < cold, (warm, cold)


@pytest.mark.smoke
def test_training_dataset_raw_window_matches_plain(tmp_path, cache, rng):
    """The raw-window fast path (crop the mmap'd raw, convert the window)
    must produce bit-identical samples to the plain decode path, crop
    randomness included."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_fusionnet_fixture

    from rcfd_tpu.data.datasets import FusionNetTrainingDataset

    manifests = make_fusionnet_fixture(str(tmp_path / 'd'), n_samples=3,
                                       height=40, width=56)
    ds = FusionNetTrainingDataset(
        image_paths=data_utils.read_paths(manifests['image']),
        depth_paths=data_utils.read_paths(manifests['depth']),
        response_paths=data_utils.read_paths(manifests['response']),
        ground_truth_paths=data_utils.read_paths(manifests['ground_truth']),
        lidar_map_paths=data_utils.read_paths(manifests['lidar']),
        shape=(24, 32), random_crop_type=['horizontal', 'vertical'])

    for i in range(3):
        raw_cache.set_raw_cache(None)
        ref = ds.get(i, np.random.default_rng((7, i)))
        raw_cache.set_raw_cache(cache)
        for _ in range(2):  # cold (decode+write) and warm (mmap) passes
            out = ds.get(i, np.random.default_rng((7, i)))
            assert len(out) == len(ref)
            for a, b in zip(out, ref):
                # integer transport is on by default: both paths yield the
                # same raw dtypes; equality covers values AND dtype
                assert a.dtype == b.dtype and a.shape == b.shape
                np.testing.assert_array_equal(a, b)

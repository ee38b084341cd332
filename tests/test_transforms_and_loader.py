"""Device-side augmentation semantics + loader determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.data.datasets import FusionNetTrainingDataset, random_crop
from rcfd_tpu.data.loader import DataLoader
from rcfd_tpu.data.transforms import Transforms


def _images(rng, n=4, h=16, w=20):
    return jnp.asarray(rng.integers(0, 255, (n, h, w, 3)).astype(np.float32))


def test_normalization_only_when_p_zero(rng):
    t = Transforms(normalized_image_range=[0, 1],
                   random_brightness=[0.5, 1.5],
                   random_flip_type=['horizontal'])
    images = _images(rng)
    (out,) = t.transform(jax.random.PRNGKey(0), [images],
                         random_transform_probability=0.0)
    np.testing.assert_allclose(np.asarray(out),
                               np.floor(np.asarray(images)) / 255.0)


def test_brightness_factor_semantics(rng):
    """With p=1 and factor range pinned, gated samples get floor(f*img)."""
    t = Transforms(normalized_image_range=[0, 255],
                   random_brightness=[0.5, 0.5])
    images = _images(rng)
    (out,) = t.transform(jax.random.PRNGKey(3), [images],
                         random_transform_probability=1.0)
    out = np.asarray(out)
    base = np.floor(np.asarray(images))
    expected_adjusted = np.floor(0.5 * base)
    # each sample is either untouched or exactly floor(0.5 * x)
    for b in range(out.shape[0]):
        ok_same = np.array_equal(out[b], base[b])
        ok_adj = np.array_equal(out[b], expected_adjusted[b])
        assert ok_same or ok_adj


def test_horizontal_flip_consistency(rng):
    """Flipped samples must flip images, labels and fix up boxes jointly."""
    t = Transforms(normalized_image_range=[0, 255],
                   random_flip_type=['horizontal'])
    n, h, w = 8, 12, 16
    images = _images(rng, n, h, w)
    labels = jnp.asarray(rng.random((n, 2, 6, 8, 1)).astype(np.float32))
    boxes = jnp.asarray(
        np.stack([np.tile([2.0, 0.0, 6.0, 12.0], (2, 1))] * n, axis=0))

    (imgs,), (labs,), (bxs,) = t.transform(
        jax.random.PRNGKey(1), [images], labels_arr=[labels],
        bounding_boxes_arr=[boxes], random_transform_probability=1.0)
    imgs, labs, bxs = np.asarray(imgs), np.asarray(labs), np.asarray(bxs)
    base = np.floor(np.asarray(images))

    flipped_any = False
    for b in range(n):
        if np.array_equal(imgs[b], base[b]):
            np.testing.assert_array_equal(bxs[b], np.asarray(boxes)[b])
        else:
            flipped_any = True
            np.testing.assert_array_equal(imgs[b], base[b][:, ::-1])
            np.testing.assert_array_equal(
                labs[b], np.asarray(labels)[b][..., ::-1, :])
            # x1' = W - x2, x2' = W - x1
            np.testing.assert_array_equal(bxs[b][:, 0], w - 6.0)
            np.testing.assert_array_equal(bxs[b][:, 2], w - 2.0)
    assert flipped_any


def test_random_crop_bottom_left():
    x = np.arange(6 * 8 * 1, dtype=np.float32).reshape(6, 8, 1)
    [out] = random_crop([x], shape=(3, 4), crop_type=('bottom', 'left'),
                        rng=np.random.default_rng(0))
    np.testing.assert_array_equal(out, x[3:, :4])


def test_loader_deterministic_across_worker_counts(tmp_path, rng):
    from fixtures import make_fusionnet_fixture
    from rcfd_tpu.data import io as data_utils

    manifests = make_fusionnet_fixture(str(tmp_path), n_samples=6, height=24,
                                       width=32)
    def build(num_workers):
        ds = FusionNetTrainingDataset(
            image_paths=data_utils.read_paths(manifests['image']),
            depth_paths=data_utils.read_paths(manifests['depth']),
            response_paths=data_utils.read_paths(manifests['response']),
            ground_truth_paths=data_utils.read_paths(manifests['ground_truth']),
            lidar_map_paths=data_utils.read_paths(manifests['lidar']),
            shape=(16, 16), random_crop_type=('horizontal', 'vertical'))
        return DataLoader(ds, batch_size=2, shuffle=True,
                          num_workers=num_workers, seed=7)

    batches1 = [tuple(np.copy(t) for t in b) for b in build(1)]
    batches4 = [tuple(np.copy(t) for t in b) for b in build(4)]
    assert len(batches1) == len(batches4) == 3
    for b1, b4 in zip(batches1, batches4):
        for t1, t4 in zip(b1, b4):
            np.testing.assert_array_equal(t1, t4)


def test_device_prefetch_preserves_order():
    import jax.numpy as jnp
    from rcfd_tpu.data.loader import device_prefetch

    batches = [(np.full((2, 3), i, np.float32),) for i in range(5)]
    out = list(device_prefetch(iter(batches), buffer_size=2))
    assert len(out) == 5
    for i, (t,) in enumerate(out):
        assert float(jnp.max(t)) == i


def test_get_batch_native_matches_per_sample(tmp_path, rng, monkeypatch):
    """The native batched decode path (get_batch) must produce exactly the
    per-sample PIL path's batches for PNG-backed fixtures, including the
    identical random crops, and the RCFD_NATIVE_IO=0 fallback must too."""
    from fixtures import make_fusionnet_fixture
    from rcfd_tpu.data import io as data_utils

    manifests = make_fusionnet_fixture(str(tmp_path), n_samples=4, height=24,
                                       width=32)
    ds = FusionNetTrainingDataset(
        image_paths=data_utils.read_paths(manifests['image']),
        depth_paths=data_utils.read_paths(manifests['depth']),
        response_paths=data_utils.read_paths(manifests['response']),
        ground_truth_paths=data_utils.read_paths(manifests['ground_truth']),
        lidar_map_paths=data_utils.read_paths(manifests['lidar']),
        shape=(16, 16), random_crop_type=('horizontal', 'vertical'))

    indices = [2, 0, 3]

    def rngs():
        return [np.random.default_rng((7, 1, p)) for p in range(3)]

    per_sample = [ds.get(i, r) for i, r in zip(indices, rngs())]
    expect = tuple(np.stack([s[j] for s in per_sample], axis=0)
                   for j in range(5))

    monkeypatch.setenv('RCFD_NATIVE_IO', '1')
    got = ds.get_batch(indices, rngs())
    for a, b in zip(got, expect):
        np.testing.assert_array_equal(a, b)

    monkeypatch.setenv('RCFD_NATIVE_IO', '0')
    got_fb = ds.get_batch(indices, rngs())
    for a, b in zip(got_fb, expect):
        np.testing.assert_array_equal(a, b)

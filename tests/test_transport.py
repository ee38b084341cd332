"""Integer-dtype input transport (round 5): uint8 images + uint16
depth-family streams shipped to the device, cast+scale inside the jitted
graphs. Every converted path must be BIT-IDENTICAL to the float32
transport it replaces — these tests pin that.

Exactness argument under test: uint8->f32 is a pure cast; every uint16 is
exactly representable in f32 and /256 is a power-of-two scale, so
device-side astype(f32)/256 equals the host-side load_depth conversion.
"""

import os

import numpy as np
import pytest

from fixtures import make_fusionnet_fixture, make_radarnet_fixture
from rcfd_tpu.data import io as data_utils
from rcfd_tpu.data import transport
from rcfd_tpu.data.datasets import (FusionNetInferenceDataset,
                                    FusionNetTrainingDataset,
                                    RadarNetInferenceDataset,
                                    RadarNetTrainingDataset)


def _assert_tree_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        x, y = np.asarray(x), np.asarray(y)
        assert x.dtype == y.dtype, (x.dtype, y.dtype)
        np.testing.assert_array_equal(x, y)


@pytest.mark.smoke
def test_decode_rules():
    u8 = np.arange(256, dtype=np.uint8).reshape(16, 16)
    u16 = np.array([0, 1, 255, 256, 257, 65535], dtype=np.uint16)
    u32 = np.array([0, 70000, 2 ** 24], dtype=np.uint32)
    f32 = np.array([1.5, -2.0], dtype=np.float32)
    mask = np.array([True, False])

    out = transport.decode_np((u8, u16, u32, f32, mask))
    assert out[0].dtype == np.float32
    np.testing.assert_array_equal(out[0], u8.astype(np.float32))
    np.testing.assert_array_equal(
        out[1], u16.astype(np.float32) / np.float32(256.0))
    np.testing.assert_array_equal(
        out[2], u32.astype(np.float32) / np.float32(256.0))
    # floats and bools pass through untouched
    assert out[3] is f32 and out[4] is mask

    # the jnp decode computes the same values
    dev = transport.decode((u8, u16, u32, f32, mask))
    for h, d in zip(out[:3], dev[:3]):
        np.testing.assert_array_equal(h, np.asarray(d))


@pytest.mark.smoke
def test_decode_matches_load_depth_all_u16_values(tmp_path):
    """decode(u16)/256 must equal load_depth for EVERY uint16 value."""
    raw = np.arange(65536, dtype=np.uint16).reshape(256, 256)
    from PIL import Image
    p = str(tmp_path / 'all.png')
    Image.fromarray(raw.astype(np.int32), mode='I').save(p)
    ref = data_utils.load_depth(p)
    u16 = data_utils.load_depth_u16(p)
    assert u16.dtype == np.uint16
    np.testing.assert_array_equal(transport.decode_np(u16), ref)


@pytest.mark.smoke
def test_encode_png_int_clamps_and_widens():
    assert transport.encode_png_int(
        np.array([-5, 0, 7], np.int64)).dtype == np.uint16
    np.testing.assert_array_equal(
        transport.encode_png_int(np.array([-5, 0, 7], np.int64)),
        np.array([0, 0, 7], np.uint16))
    wide = transport.encode_png_int(np.array([0, 70000], np.int64))
    assert wide.dtype == np.uint32


def _fusion_datasets(root, **kw):
    m = make_fusionnet_fixture(root, n_samples=3)
    args = dict(
        image_paths=data_utils.read_paths(m['image']),
        depth_paths=data_utils.read_paths(m['depth']),
        response_paths=data_utils.read_paths(m['response']),
        ground_truth_paths=data_utils.read_paths(m['ground_truth']),
        lidar_map_paths=data_utils.read_paths(m['lidar']), **kw)
    return (FusionNetTrainingDataset(transport=True, **args),
            FusionNetTrainingDataset(transport=False, **args))


@pytest.mark.smoke
def test_fusionnet_training_dataset_transport_exact(tmp_path):
    ds_int, ds_f32 = _fusion_datasets(
        str(tmp_path), shape=(32, 48),
        random_crop_type=['horizontal', 'vertical'])
    for i in range(3):
        s_int = ds_int.get(i, np.random.default_rng((1, i)))
        s_f32 = ds_f32.get(i, np.random.default_rng((1, i)))
        assert s_int[0].dtype == np.uint8
        assert all(t.dtype == np.uint16 for t in s_int[1:])
        _assert_tree_equal(transport.decode_np(s_int), s_f32)


@pytest.mark.smoke
def test_fusionnet_training_dataset_transport_exact_raw_cache(tmp_path):
    from rcfd_tpu.data.raw_cache import set_raw_cache
    ds_int, ds_f32 = _fusion_datasets(
        str(tmp_path / 'data'), shape=(32, 48),
        random_crop_type=['horizontal'])
    ref = [ds_f32.get(i, np.random.default_rng((1, i))) for i in range(3)]
    try:
        set_raw_cache(str(tmp_path / 'cache'))
        for i in range(3):
            # twice: populate the cache, then read back through the mmap
            for _ in range(2):
                s_int = ds_int.get(i, np.random.default_rng((1, i)))
                assert s_int[0].dtype == np.uint8
                _assert_tree_equal(transport.decode_np(s_int), ref[i])
    finally:
        set_raw_cache(None)


def test_fusionnet_inference_dataset_transport_exact(tmp_path):
    m = make_fusionnet_fixture(str(tmp_path), n_samples=2)
    args = dict(image_paths=data_utils.read_paths(m['image']),
                depth_paths=data_utils.read_paths(m['depth']),
                response_paths=data_utils.read_paths(m['response']),
                ground_truth_paths=data_utils.read_paths(m['ground_truth']))
    ds_int = FusionNetInferenceDataset(transport=True, **args)
    ds_f32 = FusionNetInferenceDataset(transport=False, **args)
    for i in range(2):
        s_int = ds_int.get(i)
        assert s_int[0].dtype == np.uint8
        assert s_int[1].dtype == np.uint16
        _assert_tree_equal(transport.decode_np(s_int), ds_f32.get(i))


def test_radarnet_training_dataset_transport_exact(tmp_path):
    m = make_radarnet_fixture(str(tmp_path), n_samples=3)
    args = dict(image_paths=data_utils.read_paths(m['image']),
                radar_paths=data_utils.read_paths(m['radar']),
                ground_truth_paths=data_utils.read_paths(m['ground_truth']),
                patch_size=(32, 16), total_points_sampled=4)
    # p=1.0 forces the fake-lidar-point branch (the raw>256 threshold and
    # the /256 z rescale must reproduce the float path exactly);
    # p=0.0 covers the plain radar branch
    for p_lidar in (0.0, 1.0):
        ds_int = RadarNetTrainingDataset(
            transport=True, sample_probability_of_lidar=p_lidar, **args)
        ds_f32 = RadarNetTrainingDataset(
            transport=False, sample_probability_of_lidar=p_lidar, **args)
        for i in range(3):
            s_int = ds_int.get(i, np.random.default_rng((2, i)))
            s_f32 = ds_f32.get(i, np.random.default_rng((2, i)))
            assert s_int[0].dtype == np.uint8
            assert s_int[3].dtype == np.uint16
            _assert_tree_equal(transport.decode_np(s_int), s_f32)


def test_radarnet_inference_dataset_transport_exact(tmp_path):
    m = make_radarnet_fixture(str(tmp_path), n_samples=2)
    args = dict(image_paths=data_utils.read_paths(m['image']),
                radar_paths=data_utils.read_paths(m['radar']),
                ground_truth_paths=data_utils.read_paths(m['ground_truth']),
                max_points=16)
    ds_int = RadarNetInferenceDataset(transport=True, **args)
    ds_f32 = RadarNetInferenceDataset(transport=False, **args)
    for i in range(2):
        s_int = ds_int.get(i)
        assert s_int[0].dtype == np.uint8
        assert s_int[3].dtype == np.uint16
        _assert_tree_equal(transport.decode_np(s_int), ds_f32.get(i))


def test_env_gate(tmp_path, monkeypatch):
    m = make_radarnet_fixture(str(tmp_path), n_samples=1)
    args = dict(image_paths=data_utils.read_paths(m['image']),
                radar_paths=data_utils.read_paths(m['radar']))
    monkeypatch.delenv('RCFD_INT_TRANSPORT', raising=False)
    assert RadarNetInferenceDataset(**args).transport is True  # default ON
    for off in ('0', 'false', 'off', 'no', 'OFF'):
        monkeypatch.setenv('RCFD_INT_TRANSPORT', off)
        assert RadarNetInferenceDataset(**args).transport is False
    monkeypatch.setenv('RCFD_INT_TRANSPORT', '1')
    assert RadarNetInferenceDataset(**args).transport is True
    # explicit argument beats the env
    monkeypatch.setenv('RCFD_INT_TRANSPORT', '0')
    assert RadarNetInferenceDataset(transport=True, **args).transport is True


@pytest.mark.smoke
def test_fusionnet_train_step_transport_exact(tmp_path):
    """One jitted train step fed the integer batch must produce bitwise
    the same loss/params as the float32 batch (CPU backend: identical
    graphs after the exact decode)."""
    import jax
    import jax.numpy as jnp
    from rcfd_tpu.data.loader import DataLoader
    from rcfd_tpu.data.transforms import Transforms
    from rcfd_tpu.fusionnet_main import _make_train_step
    from rcfd_tpu.models import FusionNetModel
    from rcfd_tpu.parallel.optim import init_adam

    ds_int, ds_f32 = _fusion_datasets(
        str(tmp_path), shape=(32, 48), random_crop_type=['horizontal'])
    batches = {}
    for name, ds in [('int', ds_int), ('f32', ds_f32)]:
        loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                            seed=0)
        loader.set_epoch(1)
        batches[name] = next(iter(loader))
    assert batches['int'][0].dtype == np.uint8

    model = FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[4, 8, 8, 8, 8],
        n_filters_encoder_depth=[4, 4, 4, 4, 4],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm', n_resolution_decoder=1,
        n_filters_decoder=[8, 8, 8, 8, 8],
        min_predict_depth=1.0, max_predict_depth=100.0)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    opt_state = init_adam(params)
    transforms = Transforms(normalized_image_range=[0, 1],
                            random_brightness=[0.8, 1.2],
                            random_flip_type=['horizontal'])
    step = jax.jit(_make_train_step(
        model, transforms, loss_func='l1', w_smoothness=0.1,
        w_lidar_loss=1.0, w_weight_decay=0.0,
        loss_smoothness_kernel_size=-1, outlier_kernel_size=3,
        outlier_threshold=1.5, dilation_kernel_size=-1))

    key = jax.random.PRNGKey(7)
    outs = {}
    for name in ('int', 'f32'):
        outs[name] = step(params, state, opt_state, batches[name], key,
                          jnp.float32(1e-4), jnp.float32(1.0))
    p_int, _, _, info_int = outs['int']
    p_f32, _, _, info_f32 = outs['f32']
    assert float(info_int['loss']) == float(info_f32['loss'])
    for a, b in zip(jax.tree_util.tree_leaves(p_int),
                    jax.tree_util.tree_leaves(p_f32)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.smoke
def test_radarnet_forward_transport_exact(tmp_path):
    """Scatter inference fed uint8 frames must equal the float path."""
    import jax
    from rcfd_tpu.data.transforms import Transforms
    from rcfd_tpu.models import RadarNetModel
    from rcfd_tpu.radarnet_main import make_forward_fn_batched

    m = make_radarnet_fixture(str(tmp_path), n_samples=2, height=64,
                              width=96)
    args = dict(image_paths=data_utils.read_paths(m['image']),
                radar_paths=data_utils.read_paths(m['radar']),
                max_points=16)
    ds_int = RadarNetInferenceDataset(transport=True, **args)
    ds_f32 = RadarNetInferenceDataset(transport=False, **args)

    model = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(32, 32),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[4, 8, 8, 8, 8],
        n_neurons_encoder_depth=[4, 8, 8, 8, 8],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[8, 8, 8, 8, 8])
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    fwd = make_forward_fn_batched(
        model, Transforms(normalized_image_range=[0, 1]), 64, 96)

    def run(ds):
        s0, s1 = ds.get(0), ds.get(1)
        images = np.stack([s0[0], s1[0]])
        points = np.stack([s0[1], s1[1]])
        valid = np.stack([s0[2], s1[2]])
        d, r = fwd(params, state, images, points, valid)
        return np.asarray(d), np.asarray(r)

    d_int, r_int = run(ds_int)
    d_f32, r_f32 = run(ds_f32)
    np.testing.assert_array_equal(d_int, d_f32)
    np.testing.assert_array_equal(r_int, r_f32)


def test_iter_device_batches_overlap_and_tail(tmp_path):
    """The double-buffered bulk feeder yields every index once, pads the
    tail batch internally, and surfaces producer errors."""
    from rcfd_tpu.data.loader import iter_device_batches

    m = make_radarnet_fixture(str(tmp_path), n_samples=5)
    ds = RadarNetInferenceDataset(
        image_paths=data_utils.read_paths(m['image']),
        radar_paths=data_utils.read_paths(m['radar']), max_points=16)
    seen = []
    for idxs, samples, device in iter_device_batches(ds, 2, fields=(0, 1, 2)):
        assert len(samples) == len(idxs)
        assert device[0].shape[0] == 2  # padded static batch
        seen.extend(idxs)
    assert seen == list(range(5))

    class Boom:
        def __len__(self):
            return 3

        def get(self, i):
            raise IOError('disk gone')

    with pytest.raises(IOError):
        list(iter_device_batches(Boom(), 2, fields=()))

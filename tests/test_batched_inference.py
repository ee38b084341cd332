"""Frame-batched bulk-inference surfaces must be bit-identical to the
per-frame path (reference loops frame-at-a-time,
src/radarnet_main.py:958; our batched dispatch may not change results).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu import radarnet_main
from rcfd_tpu.data.transforms import Transforms
from rcfd_tpu.models import RadarNetModel

H, W = 64, 96
PATCH = (64, 32)

RN_KWARGS = dict(
    input_channels_image=3,
    input_channels_depth=3,
    input_patch_size_image=PATCH,
    encoder_type='radarnetv1_batch_norm',
    n_filters_encoder_image=[8, 12, 16, 16, 16],
    n_neurons_encoder_depth=[8, 12, 16, 16, 16],
    decoder_type='multiscale_batch_norm',
    n_filters_decoder=[16, 12, 8, 8, 8])


@pytest.fixture(scope='module')
def model_and_fns():
    model = RadarNetModel(**RN_KWARGS)
    params, state = model.init(jax.random.PRNGKey(0))
    transforms = Transforms(normalized_image_range=[0, 1])
    fwd1 = radarnet_main.make_forward_fn(model, transforms, H, W)
    fwdb = radarnet_main.make_forward_fn_batched(model, transforms, H, W)
    return model, params, state, fwd1, fwdb


def _frames(rng, b, k=6):
    images = (rng.random((b, H, W, 3)).astype(np.float32) * 255)
    points = np.stack([
        rng.integers(0, W, (b, k)).astype(np.float32),
        rng.integers(0, H, (b, k)).astype(np.float32),
        rng.random((b, k)).astype(np.float32) * 70 + 1], axis=2)
    valid = rng.random((b, k)) > 0.2
    valid[:, 0] = True
    return images, points, valid


def test_batched_forward_matches_per_frame(model_and_fns, rng):
    _, params, state, fwd1, fwdb = model_and_fns
    images, points, valid = _frames(rng, b=3)

    depth_b, resp_b = fwdb(params, state, jnp.asarray(images),
                           jnp.asarray(points), jnp.asarray(valid))
    for i in range(3):
        depth_1, resp_1 = fwd1(params, state, jnp.asarray(images[i])[None],
                               jnp.asarray(points[i]), jnp.asarray(valid[i]))
        np.testing.assert_array_equal(np.asarray(depth_b)[i],
                                      np.asarray(depth_1))
        np.testing.assert_allclose(np.asarray(resp_b)[i],
                                   np.asarray(resp_1), rtol=0, atol=1e-6)


def test_codec_encode_byte_identical_pngs(model_and_fns, rng, tmp_path):
    """make_forward_fn_batched(codec_encode=True) emits uint16 codec-grid
    maps on device; saved through save_*_encoded they must be
    byte-identical to the float32 path's save_depth/save_response files
    (the stage-1.5 bridge's halved-D2H production mode)."""
    from rcfd_tpu.data import io as data_utils

    model, params, state, _, fwdb = model_and_fns
    fwdc = radarnet_main.make_forward_fn_batched(
        model, Transforms(normalized_image_range=[0, 1]), H, W,
        codec_encode=True)
    images, points, valid = _frames(rng, b=3)
    args = (jnp.asarray(images), jnp.asarray(points), jnp.asarray(valid))

    depth_f, resp_f = (np.asarray(a) for a in fwdb(params, state, *args))
    depth_u, resp_u = (np.asarray(a) for a in fwdc(params, state, *args))
    assert depth_u.dtype == np.uint16 and resp_u.dtype == np.uint16

    for i in range(3):
        pf = str(tmp_path / f'f{i}.png')
        pu = str(tmp_path / f'u{i}.png')
        data_utils.save_depth(depth_f[i], pf)
        data_utils.save_depth_encoded(depth_u[i], pu)
        with open(pf, 'rb') as a, open(pu, 'rb') as b:
            assert a.read() == b.read()
        data_utils.save_response(resp_f[i], pf)
        data_utils.save_response_encoded(resp_u[i], pu)
        with open(pf, 'rb') as a, open(pu, 'rb') as b:
            assert a.read() == b.read()


def test_iter_scatter_outputs_tail_padding(model_and_fns, rng, tmp_path):
    """5 frames at eval_batch_size=2: the padded tail batch must yield
    exactly 5 outputs, each equal to the batch-1 result."""
    from PIL import Image

    from rcfd_tpu.data import io as data_utils
    from rcfd_tpu.data.datasets import RadarNetInferenceDataset

    _, params, state, fwd1, fwdb = model_and_fns
    images, points, valid = _frames(rng, b=5)

    image_paths, radar_paths = [], []
    for i in range(5):
        p = str(tmp_path / f'i{i}.png')
        Image.fromarray(images[i].astype(np.uint8)).save(p)
        image_paths.append(p)
        rp = str(tmp_path / f'r{i}.npy')
        np.save(rp, points[i])
        radar_paths.append(rp)

    dataset = RadarNetInferenceDataset(image_paths, radar_paths,
                                       max_points=points.shape[1])
    seen = []
    for idx, sample, depth_np, resp_np in radarnet_main.iter_scatter_outputs(
            fwdb, params, state, dataset, eval_batch_size=2):
        seen.append(idx)
        image, pts, vld = sample[:3]
        depth_1, _ = fwd1(params, state, jnp.asarray(image)[None],
                          jnp.asarray(pts), jnp.asarray(vld))
        np.testing.assert_array_equal(depth_np, np.asarray(depth_1))
    assert seen == [0, 1, 2, 3, 4]


def test_fusionnet_iter_forward_outputs(rng, tmp_path):
    """FusionNet batched validation driver: per-frame outputs identical
    to batch 1, tail padded."""
    from rcfd_tpu import fusionnet_main
    from rcfd_tpu.data.datasets import FusionNetInferenceDataset
    from fixtures import make_fusionnet_fixture
    from rcfd_tpu.data import io as data_utils
    from rcfd_tpu.models import FusionNetModel

    manifests = make_fusionnet_fixture(str(tmp_path / 'd'), n_samples=3,
                                       height=32, width=48)
    model = FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_filters_encoder_depth=[4, 6, 8, 8, 8],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=1,
        n_filters_decoder=[16, 12, 8, 8, 8],
        min_predict_depth=1.0, max_predict_depth=100.0)
    params, state = model.init(jax.random.PRNGKey(0))
    transforms = Transforms(normalized_image_range=[0, 1])
    fwd = fusionnet_main.make_forward_fn(model, transforms)

    dataset = FusionNetInferenceDataset(
        image_paths=data_utils.read_paths(manifests['image']),
        depth_paths=data_utils.read_paths(manifests['depth']),
        response_paths=data_utils.read_paths(manifests['response']),
        ground_truth_paths=data_utils.read_paths(manifests['ground_truth']))

    seen = []
    for idx, sample, out in fusionnet_main.iter_forward_outputs(
            fwd, params, state, dataset, eval_batch_size=2):
        seen.append(idx)
        image, depth, response = sample[:3]
        out1 = np.asarray(fwd(
            params, state, jnp.asarray(image)[None],
            jnp.asarray(depth)[None], jnp.asarray(response)[None]))
        np.testing.assert_allclose(out, out1[0, :, :, 0], rtol=0, atol=1e-6)
    assert seen == [0, 1, 2]

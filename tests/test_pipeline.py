"""Fused two-stage pipeline must match the file-based composition
(RadarNet run -> PNG round trip -> FusionNet run) bit-for-bit at the
bridge and within float tolerance at the output."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.data import io as data_utils
from rcfd_tpu.models import FusionNetModel, RadarNetModel
from rcfd_tpu.pipeline import RESPONSE_DECODE_SCALE, TwoStagePipeline

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

FN_KWARGS = dict(
    input_channels_image=3,
    input_channels_depth=2,
    encoder_type='fusionnet18_batch_norm',
    n_filters_encoder_image=[8, 12, 16, 16, 16],
    n_filters_encoder_depth=[4, 6, 8, 8, 8],
    fusion_type='weight_and_project',
    decoder_type='multiscale_batch_norm',
    n_resolution_decoder=1,
    n_filters_decoder=[16, 12, 8, 8, 8],
    min_predict_depth=1.0,
    max_predict_depth=100.0)


def test_fused_pipeline_matches_file_based_composition(tmp_path):
    rng = np.random.default_rng(0)
    radarnet = RadarNetModel(**RN_KWARGS)
    fusionnet = FusionNetModel(**FN_KWARGS)
    rn_vars = radarnet.init(jax.random.PRNGKey(0))
    fn_vars = fusionnet.init(jax.random.PRNGKey(1))

    pipeline = TwoStagePipeline(
        radarnet, fusionnet, rn_vars, fn_vars, H, W,
        normalized_image_range=(0, 1), quantize_bridge=True)

    image = (rng.random((H, W, 3), dtype=np.float32) * 255)
    n_points = 6
    points = np.stack([
        rng.integers(0, W, n_points).astype(np.float32),
        rng.integers(0, H, n_points).astype(np.float32),
        rng.random(n_points, dtype=np.float32) * 70 + 1], axis=1)
    valid = np.ones(n_points, bool)

    dense, quasi, response = pipeline(
        jnp.asarray(image)[None], jnp.asarray(points), jnp.asarray(valid))

    # ---- file-based composition -------------------------------------------
    from rcfd_tpu import radarnet_main
    from rcfd_tpu.data.transforms import Transforms

    transforms = Transforms(normalized_image_range=[0, 1])
    forward_rn = radarnet_main.make_forward_fn(radarnet, transforms, H, W)
    depth_map, response_map = forward_rn(
        rn_vars[0], rn_vars[1], jnp.asarray(image)[None],
        jnp.asarray(points), jnp.asarray(valid))

    depth_png = str(tmp_path / 'depth.png')
    response_png = str(tmp_path / 'response.png')
    data_utils.save_depth(np.asarray(depth_map), depth_png)
    data_utils.save_response(np.asarray(response_map), response_png)

    # FusionNet reads BOTH streams back with load_depth (x256) — the
    # reference quirk (src/datasets.py:412-415)
    depth_loaded = data_utils.load_depth(depth_png, data_format='HWC')
    response_loaded = data_utils.load_depth(response_png, data_format='HWC')

    np.testing.assert_allclose(np.asarray(quasi), depth_loaded[..., 0],
                               atol=1 / 256.0 + 1e-6)
    np.testing.assert_allclose(
        np.asarray(response) * RESPONSE_DECODE_SCALE,
        response_loaded[..., 0], atol=1 / 256.0 + 1e-6)

    input_depth = np.concatenate([depth_loaded, response_loaded], axis=-1)
    out_file, _ = fusionnet.apply(
        fn_vars[0], fn_vars[1], jnp.asarray(image)[None] / 255.0,
        jnp.asarray(input_depth)[None], training=False)

    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(out_file)[0, :, :, 0],
        rtol=1e-4, atol=1e-4)


def test_from_raw_radar_matches_preprojected(tmp_path):
    """The fused raw-radar path (on-device pose projection) must equal
    running the pipeline on pre-projected image-plane points."""
    rng = np.random.default_rng(1)
    radarnet = RadarNetModel(**RN_KWARGS)
    fusionnet = FusionNetModel(**FN_KWARGS)
    rn_vars = radarnet.init(jax.random.PRNGKey(2))
    fn_vars = fusionnet.init(jax.random.PRNGKey(3))
    pipeline = TwoStagePipeline(
        radarnet, fusionnet, rn_vars, fn_vars, H, W)

    image = (rng.random((H, W, 3), dtype=np.float32) * 255)
    k_mat = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]],
                     np.float32)
    ident = np.eye(4, dtype=np.float32)
    n = 6
    points_cam = np.stack([
        rng.uniform(-0.5, 0.5, n), rng.uniform(-0.3, 0.3, n),
        rng.uniform(5, 60, n)], axis=1).astype(np.float32)

    dense_raw, quasi_raw, _ = pipeline.from_raw_radar(
        jnp.asarray(image)[None], jnp.asarray(points_cam),
        jnp.ones(n, bool), jnp.asarray(ident), jnp.asarray(k_mat))

    # project on the host exactly the same way
    proj = points_cam @ k_mat.T
    xy = proj[:, :2] / proj[:, 2:3]
    pts_img = np.stack([np.round(xy[:, 0]), np.round(xy[:, 1]),
                        points_cam[:, 2]], axis=1).astype(np.float32)
    z = points_cam[:, 2]
    mask = (z > 1.0) & (xy[:, 0] > 1) & (xy[:, 0] < W - 1) & \
        (xy[:, 1] > 1) & (xy[:, 1] < H - 1)

    dense_pre, quasi_pre, _ = pipeline(
        jnp.asarray(image)[None],
        jnp.asarray(np.where(mask[:, None], pts_img, 0.0)),
        jnp.asarray(mask))

    np.testing.assert_allclose(np.asarray(quasi_raw), np.asarray(quasi_pre),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dense_raw), np.asarray(dense_pre),
                               rtol=1e-4, atol=1e-4)


def test_forward_batched_matches_per_frame():
    """The batched serving path must produce identical per-frame results."""
    rng = np.random.default_rng(3)
    radarnet = RadarNetModel(**RN_KWARGS)
    fusionnet = FusionNetModel(**FN_KWARGS)
    pipeline = TwoStagePipeline(
        radarnet, fusionnet, radarnet.init(jax.random.PRNGKey(0)),
        fusionnet.init(jax.random.PRNGKey(1)), H, W)

    b, k = 3, 5
    images = (rng.random((b, H, W, 3), dtype=np.float32) * 255)
    points = np.stack([
        rng.integers(0, W, (b, k)).astype(np.float32),
        rng.integers(0, H, (b, k)).astype(np.float32),
        rng.random((b, k), dtype=np.float32) * 70 + 1], axis=-1)
    valid = np.ones((b, k), bool)
    valid[1, 3:] = False  # ragged frame

    dense_b, quasi_b, resp_b = pipeline.forward_batched(
        jnp.asarray(images), jnp.asarray(points), jnp.asarray(valid))

    for i in range(b):
        dense, quasi, resp = pipeline(
            jnp.asarray(images[i])[None], jnp.asarray(points[i]),
            jnp.asarray(valid[i]))
        np.testing.assert_array_equal(np.asarray(quasi_b[i]),
                                      np.asarray(quasi))
        np.testing.assert_array_equal(np.asarray(resp_b[i]),
                                      np.asarray(resp))
        np.testing.assert_allclose(np.asarray(dense_b[i]), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)


def test_apply_chunked_matches_apply():
    """Chunked per-point decode must equal the monolithic forward."""
    import numpy as np
    rng = np.random.default_rng(4)
    radarnet = RadarNetModel(**RN_KWARGS)
    params, state = radarnet.init(jax.random.PRNGKey(0))
    b, k = 2, 4
    pad = PATCH[1] // 2
    image = jnp.asarray(
        rng.random((b, H, W + 2 * pad, 3), dtype=np.float32))
    points = jnp.asarray(np.stack([
        rng.integers(pad, W + pad, (b, k)).astype(np.float32),
        rng.integers(0, H, (b, k)).astype(np.float32),
        rng.random((b, k), dtype=np.float32) * 60 + 1], axis=-1))
    x1 = points[..., 0] - pad

    ref, _ = radarnet.apply(params, state, image,
                            points.reshape(b * k, 3), x1,
                            box_height=H, training=False)
    ref = np.asarray(ref).reshape(b, k, *ref.shape[1:])
    for n_chunks in (1, 2, 4):
        out, _ = radarnet.apply_chunked(params, state, image, points, x1,
                                        n_chunks=n_chunks, box_height=H,
                                        training=False)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6,
                                   atol=1e-6, err_msg=f'chunks={n_chunks}')


def test_forward_batched_chunked_matches_unchunked(monkeypatch):
    """The pipeline's chunked decode path must reproduce the unchunked
    batched results exactly."""
    import numpy as np
    rng = np.random.default_rng(6)
    radarnet = RadarNetModel(**RN_KWARGS)
    fusionnet = FusionNetModel(**FN_KWARGS)
    pipeline = TwoStagePipeline(
        radarnet, fusionnet, radarnet.init(jax.random.PRNGKey(0)),
        fusionnet.init(jax.random.PRNGKey(1)), H, W)
    b, k = 2, 4
    images = (rng.random((b, H, W, 3), dtype=np.float32) * 255)
    points = np.stack([
        rng.integers(0, W, (b, k)).astype(np.float32),
        rng.integers(0, H, (b, k)).astype(np.float32),
        rng.random((b, k), dtype=np.float32) * 70 + 1], axis=-1)
    valid = np.ones((b, k), bool)

    monkeypatch.setenv('RCFD_DECODE_CHUNKS', '1')
    ref = pipeline.forward_batched(jnp.asarray(images), jnp.asarray(points),
                                   jnp.asarray(valid))
    del pipeline._forward_b  # force retrace with the new chunking
    monkeypatch.setenv('RCFD_DECODE_CHUNKS', '2')
    out = pipeline.forward_batched(jnp.asarray(images), jnp.asarray(points),
                                   jnp.asarray(valid))
    for a, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)


def test_forward_sharded_matches_batched():
    """Data-parallel serving (shard_map over the virtual 8-device CPU
    mesh) must give per-frame results identical to forward_batched."""
    from rcfd_tpu.parallel.mesh import get_mesh

    rng = np.random.default_rng(5)
    radarnet = RadarNetModel(**RN_KWARGS)
    fusionnet = FusionNetModel(**FN_KWARGS)
    pipeline = TwoStagePipeline(
        radarnet, fusionnet, radarnet.init(jax.random.PRNGKey(0)),
        fusionnet.init(jax.random.PRNGKey(1)), H, W,
        normalized_image_range=(0, 1), quantize_bridge=True)

    b, k = 8, 4
    images = jnp.asarray(rng.random((b, H, W, 3), np.float32) * 255)
    points = jnp.asarray(np.stack([
        rng.integers(0, W, (b, k)).astype(np.float32),
        rng.integers(0, H, (b, k)).astype(np.float32),
        rng.random((b, k), np.float32) * 70 + 1], axis=-1))
    valid = jnp.ones((b, k), bool)

    ref = pipeline.forward_batched(images, points, valid)
    mesh = get_mesh(8)
    out = pipeline.forward_sharded(images, points, valid, mesh=mesh)
    for a, r in zip(out, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=1e-5, atol=1e-5)


def test_default_env_scopes_and_restores(monkeypatch):
    """_default_env sets a trace-time default only when the user has not
    chosen, and never leaks past the context."""
    from rcfd_tpu.pipeline import _default_env

    monkeypatch.delenv('RCFD_FAST_MAX_WIDTH', raising=False)
    with _default_env('RCFD_FAST_MAX_WIDTH', '1600'):
        assert os.environ['RCFD_FAST_MAX_WIDTH'] == '1600'
    assert 'RCFD_FAST_MAX_WIDTH' not in os.environ

    monkeypatch.setenv('RCFD_FAST_MAX_WIDTH', '256')
    with _default_env('RCFD_FAST_MAX_WIDTH', '1600'):
        assert os.environ['RCFD_FAST_MAX_WIDTH'] == '256'
    assert os.environ['RCFD_FAST_MAX_WIDTH'] == '256'


@pytest.mark.smoke
def test_pallas_scatter_opt_in_matches_default(monkeypatch):
    """The serving graph defaults to the XLA scatter (round-3); the
    Pallas opt-in (interpret on CPU is not available, so compare the
    env-off path against an explicit env=0 — both must route XLA and
    agree bit-exactly with each other and with per-frame __call__)."""
    rng = np.random.default_rng(11)
    radarnet = RadarNetModel(**RN_KWARGS)
    fusionnet = FusionNetModel(**FN_KWARGS)
    pipeline = TwoStagePipeline(
        radarnet, fusionnet,
        radarnet.init(jax.random.PRNGKey(0)),
        fusionnet.init(jax.random.PRNGKey(1)), H, W)
    b, k = 2, 3
    images = jnp.asarray(rng.random((b, H, W, 3), np.float32) * 255)
    points = jnp.asarray(np.stack([
        rng.integers(0, W, (b, k)).astype(np.float32),
        rng.integers(0, H, (b, k)).astype(np.float32),
        rng.random((b, k), np.float32) * 50 + 1], axis=-1))
    valid = jnp.ones((b, k), bool)

    monkeypatch.delenv('RCFD_PALLAS_SCATTER', raising=False)
    dense_a, quasi_a, resp_a = pipeline.forward_batched(
        images, points, valid)
    monkeypatch.setenv('RCFD_PALLAS_SCATTER', '0')
    fwd = jax.jit(pipeline._build_forward_batched())
    dense_b, quasi_b, resp_b = fwd(
        pipeline.radarnet_params, pipeline.radarnet_state,
        pipeline.fusionnet_params, pipeline.fusionnet_state,
        images, points, valid)
    np.testing.assert_array_equal(np.asarray(quasi_a), np.asarray(quasi_b))
    np.testing.assert_array_equal(np.asarray(resp_a), np.asarray(resp_b))
    np.testing.assert_array_equal(np.asarray(dense_a), np.asarray(dense_b))

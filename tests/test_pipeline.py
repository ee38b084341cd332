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


@pytest.mark.parametrize('factor', [2, 4])
def test_forward_batched_packed_images_match(factor):
    """The space-to-depth packed serving path (host edge-pad + pack,
    packed RadarNet stem dispatch, packed FusionNet stage 1, in-graph
    scatter-map pack) must match the unpacked batched path."""
    from rcfd_tpu.nn.perf import PerfConfig
    rng = np.random.default_rng(9)
    radarnet = RadarNetModel(
        **RN_KWARGS, perf=PerfConfig(s2d_input=True, s2d_factor=factor))
    fusionnet = FusionNetModel(**FN_KWARGS)
    rn_vars = radarnet.init(jax.random.PRNGKey(0))
    fn_vars = fusionnet.init(jax.random.PRNGKey(1))
    pipe_packed = TwoStagePipeline(radarnet, fusionnet, rn_vars, fn_vars,
                                   H, W)
    assert pipe_packed._s2d_pack == factor
    rn_off = RadarNetModel(**RN_KWARGS, perf=PerfConfig(s2d_input=False))
    pipe_plain = TwoStagePipeline(rn_off, fusionnet, rn_vars, fn_vars,
                                  H, W)
    assert pipe_plain._s2d_pack == 0

    b, k = 2, 5
    images = (rng.random((b, H, W, 3), dtype=np.float32) * 255)
    points = np.stack([
        rng.integers(0, W, (b, k)).astype(np.float32),
        rng.integers(0, H, (b, k)).astype(np.float32),
        rng.random((b, k), dtype=np.float32) * 70 + 1], axis=-1)
    valid = np.ones((b, k), bool)
    valid[0, 4:] = False

    dense_p, quasi_p, resp_p = pipe_packed.forward_batched(
        images, points, valid)
    dense, quasi, resp = pipe_plain.forward_batched(
        images, points, valid)
    # the packed stems are exact up to f32 reassociation; the bridge's
    # floor quantization can turn that into at most ONE codec step at
    # boundary values (observed: 1 response pixel in 12288 at 2^-14)
    np.testing.assert_allclose(np.asarray(quasi_p), np.asarray(quasi),
                               rtol=0, atol=1.0 / 256.0)
    np.testing.assert_allclose(np.asarray(resp_p), np.asarray(resp),
                               rtol=0, atol=2.0 ** -14)
    np.testing.assert_allclose(np.asarray(dense_p), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


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


def test_forward_batched_chunked_matches_unchunked():
    """The pipeline's chunked decode path must reproduce the unchunked
    batched results exactly. Chunking is a constructor-level PerfConfig
    choice (decode_chunks) — two pipelines over the SAME weights."""
    import numpy as np

    from rcfd_tpu.nn.perf import PerfConfig

    rng = np.random.default_rng(6)
    rn_vars = RadarNetModel(**RN_KWARGS).init(jax.random.PRNGKey(0))
    fn_vars = FusionNetModel(**FN_KWARGS).init(jax.random.PRNGKey(1))
    b, k = 2, 4
    images = jnp.asarray(rng.random((b, H, W, 3), dtype=np.float32) * 255)
    points = jnp.asarray(np.stack([
        rng.integers(0, W, (b, k)).astype(np.float32),
        rng.integers(0, H, (b, k)).astype(np.float32),
        rng.random((b, k), dtype=np.float32) * 70 + 1], axis=-1))
    valid = jnp.ones((b, k), bool)

    outs = []
    for n_chunks in (1, 2):
        radarnet = RadarNetModel(
            **RN_KWARGS, perf=PerfConfig(decode_chunks=n_chunks))
        fusionnet = FusionNetModel(**FN_KWARGS)
        pipeline = TwoStagePipeline(radarnet, fusionnet, rn_vars, fn_vars,
                                    H, W)
        outs.append(pipeline.forward_batched(images, points, valid))
    for a, r in zip(outs[1], outs[0]):
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


def test_pipeline_reperfs_fusionnet_width_without_env(monkeypatch):
    """The fused pipeline widens FusionNet's fast-decoder width gate to
    the frame width via a config-only model copy — the caller's model
    object keeps its conservative default, no os.environ is touched, and
    an explicit user choice wins over the pipeline default (replaces the
    round-3 _default_env trace-time hack)."""
    from rcfd_tpu.nn.perf import PerfConfig

    monkeypatch.delenv('RCFD_FAST_MAX_WIDTH', raising=False)
    radarnet = RadarNetModel(**RN_KWARGS)
    fusionnet = FusionNetModel(**FN_KWARGS)
    rn_vars = radarnet.init(jax.random.PRNGKey(0))
    fn_vars = fusionnet.init(jax.random.PRNGKey(1))

    pipeline = TwoStagePipeline(radarnet, fusionnet, rn_vars, fn_vars, H, W)
    # pipeline copy widened; caller's object untouched; env untouched
    assert pipeline.fusionnet is not fusionnet
    assert pipeline.fusionnet.perf.fast_max_width == max(W, 256)
    assert pipeline.fusionnet.decoder.perf.fast_max_width == max(W, 256)
    assert fusionnet.perf.fast_max_width is None
    assert fusionnet.decoder.perf.fast_max_width is None
    assert 'RCFD_FAST_MAX_WIDTH' not in os.environ

    # an explicit user choice (constructor or env at construction) wins
    fn_user = FusionNetModel(**FN_KWARGS,
                             perf=PerfConfig(fast_max_width=256))
    pipeline2 = TwoStagePipeline(radarnet, fn_user, rn_vars, fn_vars, H, W)
    assert pipeline2.fusionnet is fn_user
    assert pipeline2.fusionnet.perf.fast_max_width == 256

    monkeypatch.setenv('RCFD_FAST_MAX_WIDTH', '256')
    fn_env = FusionNetModel(**FN_KWARGS)
    assert fn_env.perf.fast_max_width == 256
    pipeline3 = TwoStagePipeline(radarnet, fn_env, rn_vars, fn_vars, H, W)
    assert pipeline3.fusionnet is fn_env


@pytest.mark.smoke
def test_pallas_scatter_opt_in_matches_default(monkeypatch):
    """The serving graph defaults to the XLA scatter (round-3); an
    explicit constructor opt-OUT (pallas_scatter=False) must route the
    same XLA path and agree bit-exactly with the default."""
    from rcfd_tpu.nn.perf import PerfConfig

    monkeypatch.delenv('RCFD_PALLAS_SCATTER', raising=False)
    rng = np.random.default_rng(11)
    radarnet = RadarNetModel(**RN_KWARGS)
    fusionnet = FusionNetModel(**FN_KWARGS)
    rn_vars = radarnet.init(jax.random.PRNGKey(0))
    fn_vars = fusionnet.init(jax.random.PRNGKey(1))
    pipeline = TwoStagePipeline(radarnet, fusionnet, rn_vars, fn_vars, H, W)
    assert pipeline._use_pallas_scatter is False  # default in this graph
    b, k = 2, 3
    images = jnp.asarray(rng.random((b, H, W, 3), np.float32) * 255)
    points = jnp.asarray(np.stack([
        rng.integers(0, W, (b, k)).astype(np.float32),
        rng.integers(0, H, (b, k)).astype(np.float32),
        rng.random((b, k), np.float32) * 50 + 1], axis=-1))
    valid = jnp.ones((b, k), bool)

    dense_a, quasi_a, resp_a = pipeline.forward_batched(
        images, points, valid)
    rn_off = RadarNetModel(**RN_KWARGS,
                           perf=PerfConfig(pallas_scatter=False))
    pipeline_off = TwoStagePipeline(rn_off, fusionnet, rn_vars, fn_vars,
                                    H, W)
    dense_b, quasi_b, resp_b = pipeline_off.forward_batched(
        images, points, valid)
    np.testing.assert_array_equal(np.asarray(quasi_a), np.asarray(quasi_b))
    np.testing.assert_array_equal(np.asarray(resp_a), np.asarray(resp_b))
    np.testing.assert_array_equal(np.asarray(dense_a), np.asarray(dense_b))


@pytest.mark.smoke
def test_two_stage_parity_vs_reference_chain(tmp_path):
    """COMPOSED two-sided parity (VERDICT r3 missing #3): the REFERENCE's
    full two-stage chain — reference RadarNet scatter inference
    (src/radarnet_main.py:534-591) -> real 16-bit PNG write/read round
    trip with the reference codecs (save_depth x256 / save_response
    x2^14, both RE-READ with load_depth x256 per src/datasets.py:412-415)
    -> reference FusionNet forward (src/fusionnet_main.py:796-817) —
    against TwoStagePipeline.__call__ with quantize_bridge=True on the
    SAME converted random-init weights."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_import import import_reference
    import torch

    ref_radarnet_model = import_reference('radarnet_model')
    ref_fusionnet_model = import_reference('fusionnet_model')
    ref_rn_main = import_reference('radarnet_main')
    ref_data_utils = import_reference('data_utils')

    torch.manual_seed(0)
    patch = (64, 64)  # square patch: reference boxes span +-pad columns
    rn_kwargs = dict(RN_KWARGS, input_patch_size_image=patch)
    ref_rn = ref_radarnet_model.RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=patch,
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=rn_kwargs['n_filters_encoder_image'],
        n_neurons_encoder_depth=rn_kwargs['n_neurons_encoder_depth'],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=rn_kwargs['n_filters_decoder'],
        weight_initializer='kaiming_uniform',
        activation_func='leaky_relu', device=torch.device('cpu'))
    ref_fn = ref_fusionnet_model.FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type=FN_KWARGS['encoder_type'],
        n_filters_encoder_image=FN_KWARGS['n_filters_encoder_image'],
        n_filters_encoder_depth=FN_KWARGS['n_filters_encoder_depth'],
        fusion_type=FN_KWARGS['fusion_type'],
        decoder_type=FN_KWARGS['decoder_type'],
        n_resolution_decoder=1,
        n_filters_decoder=FN_KWARGS['n_filters_decoder'],
        deconv_type='up', activation_func='leaky_relu',
        weight_initializer='kaiming_uniform',
        min_predict_depth=FN_KWARGS['min_predict_depth'],
        max_predict_depth=FN_KWARGS['max_predict_depth'],
        device=torch.device('cpu'))
    # decondition near-ties in winner selection (untrained logits ~0)
    with torch.no_grad():
        ref_rn.decoder.output0.conv.weight.mul_(50.0)

    rn_path = str(tmp_path / 'rn.pth')
    fn_path = str(tmp_path / 'fn.pth')
    ref_rn.save_model(rn_path, step=1, optimizer=torch.optim.Adam(
        ref_rn.parameters(), lr=1e-4))
    ref_fn.save_model(fn_path, step=1, optimizer=torch.optim.Adam(
        ref_fn.parameters(), lr=1e-4))

    ours_rn = RadarNetModel(**rn_kwargs)
    ours_fn = FusionNetModel(**FN_KWARGS)
    rn_vars = ours_rn.restore_checkpoint(rn_path)[:2]
    fn_vars = ours_fn.restore_checkpoint(fn_path)[:2]

    rng = np.random.default_rng(3)
    n_points = 5
    image = (rng.random((H, W, 3), dtype=np.float32) * 255)
    points = np.stack([
        rng.integers(0, W, n_points).astype(np.float32),
        rng.integers(0, H, n_points).astype(np.float32),
        rng.random(n_points, dtype=np.float32) * 70 + 1], axis=1)

    # ---- reference stage 1: scatter inference ---------------------------
    pad = patch[1] // 2
    ref_rn.eval()
    ref_fn.eval()
    with torch.no_grad():
        t_image = torch.from_numpy(
            (image / 255.0).transpose(2, 0, 1)[None].astype(np.float32))
        t_points = torch.from_numpy(points.copy())
        t_points[:, 0] += pad
        boxes = [torch.stack([
            torch.stack([x - pad, torch.tensor(0.0), x + pad,
                         torch.tensor(float(H))])
            for x in t_points[:, 0]], dim=0)]
        ref_depth, ref_response = ref_rn_main.forward(
            model=ref_rn, image=t_image, radar_points=t_points,
            bounding_boxes_list=boxes, device=torch.device('cpu'))
    ref_depth = ref_depth.numpy()[0]
    ref_response = ref_response.numpy()[0]

    # ---- reference stage 1.5: the REAL PNG bridge ------------------------
    # written with the bridge codecs (setup_dataset_nuscenes_radarnet.py:
    # 344-345), read back the way FusionNet's datasets actually do —
    # BOTH through load_depth x256 (src/datasets.py:412-415), which is
    # the x64 response rescale quirk our fused bridge emulates.
    depth_png = str(tmp_path / 'depth.png')
    response_png = str(tmp_path / 'response.png')
    ref_data_utils.save_depth(ref_depth, depth_png)
    ref_data_utils.save_response(ref_response, response_png)
    depth_rt = ref_data_utils.load_depth(depth_png)
    response_rt = ref_data_utils.load_depth(response_png)  # x256, not x2^14

    # ---- reference stage 2: FusionNet forward ----------------------------
    with torch.no_grad():
        t_input_depth = torch.from_numpy(np.stack(
            [depth_rt, response_rt], axis=0)[None].astype(np.float32))
        ref_dense = ref_fn.forward(image=t_image, input_depth=t_input_depth)
    ref_dense = np.squeeze(ref_dense.numpy())

    # ---- ours: one fused jitted program ----------------------------------
    pipeline = TwoStagePipeline(
        ours_rn, ours_fn, rn_vars, fn_vars, H, W,
        normalized_image_range=(0, 1), quantize_bridge=True)
    dense, quasi_depth, quasi_response = pipeline(
        jnp.asarray(image)[None], jnp.asarray(points),
        jnp.ones((n_points,), bool))

    # bridge parity. Depth: winners can differ only at near-exact response
    # ties (same budget as test_parity_scatter_inference); matched pixels
    # must land on the exact x256 codec grid.
    depth_mismatch = (
        np.abs(np.asarray(quasi_depth) - depth_rt) > 1.5 / 256.0).mean()
    assert depth_mismatch < 0.01, \
        f'quasi-depth winner mismatch rate {depth_mismatch}'
    # Response: forward parity is ~1e-3 relative on the sigmoid output
    # (test_parity_radarnet); the x64 decode-scale quirk preserves the
    # relative error on the values FusionNet actually sees (plus one
    # codec quantization step).
    np.testing.assert_allclose(
        np.asarray(quasi_response) * RESPONSE_DECODE_SCALE, response_rt,
        rtol=3e-3, atol=1.5 * RESPONSE_DECODE_SCALE / 2 ** 14)
    # end-to-end dense depth: measured on this config max |diff| is
    # ~0.04 m over a 1-100 m range (winner ties included) — pin it with
    # headroom but tight enough that a real chain bug (wrong codec scale,
    # missing x64 rescale, transform drift) fails loudly
    dd = np.abs(np.asarray(dense) - ref_dense)
    assert dd.max() < 0.5, f'dense depth max |diff| {dd.max()}'
    assert np.percentile(dd, 99) < 0.1, \
        f'dense depth p99 |diff| {np.percentile(dd, 99)}'
    assert dd.mean() < 0.02, f'dense depth mean |diff| {dd.mean()}'


def test_pipeline_codec_encode_byte_identical_pngs(tmp_path):
    """TwoStagePipeline(codec_encode=True) returns uint16 codec-grid
    streams whose save_*_encoded PNGs are byte-identical to the float32
    pipeline's save_depth/save_response files (the run_pipeline
    production-pass mode — half the D2H bytes)."""
    rng = np.random.default_rng(17)
    radarnet = RadarNetModel(**RN_KWARGS)
    fusionnet = FusionNetModel(**FN_KWARGS)
    rn_vars = radarnet.init(jax.random.PRNGKey(0))
    fn_vars = fusionnet.init(jax.random.PRNGKey(1))
    pipe_f32 = TwoStagePipeline(radarnet, fusionnet, rn_vars, fn_vars, H, W)
    pipe_u16 = TwoStagePipeline(radarnet, fusionnet, rn_vars, fn_vars, H, W,
                                codec_encode=True)

    b, k = 2, 5
    images = (rng.random((b, H, W, 3), dtype=np.float32) * 255)
    points = np.stack([
        rng.integers(0, W, (b, k)).astype(np.float32),
        rng.integers(0, H, (b, k)).astype(np.float32),
        rng.random((b, k), dtype=np.float32) * 70 + 1], axis=-1)
    valid = np.ones((b, k), bool)

    f32 = pipe_f32.forward_batched(jnp.asarray(images), jnp.asarray(points),
                                   jnp.asarray(valid))
    u16 = pipe_u16.forward_batched(jnp.asarray(images), jnp.asarray(points),
                                   jnp.asarray(valid))
    assert all(np.asarray(s).dtype == np.uint16 for s in u16)

    savers_f32 = (data_utils.save_depth, data_utils.save_depth,
                  data_utils.save_response)
    savers_u16 = (data_utils.save_depth_encoded, data_utils.save_depth_encoded,
                  data_utils.save_response_encoded)
    for i in range(b):
        for s, (sf32, su16) in enumerate(zip(savers_f32, savers_u16)):
            pa = str(tmp_path / f'f{i}_{s}.png')
            pb = str(tmp_path / f'u{i}_{s}.png')
            sf32(np.asarray(f32[s][i]), pa)
            su16(np.asarray(u16[s][i]), pb)
            with open(pa, 'rb') as a, open(pb, 'rb') as b2:
                assert a.read() == b2.read(), (i, s)

"""bfloat16 serving accuracy: outputs must stay within the evaluation
tolerance of the float32 path (depth maps live in [1, 100] m; the eval
protocol works in millimeters, so we budget well under PNG quantization)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.models import FusionNetModel
from rcfd_tpu.nn.core import cast_tree
from rcfd_tpu.nn.optimize import fold_batch_norm


def test_bf16_fusionnet_within_tolerance(rng):
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
    params, state = fold_batch_norm(params, state)

    image = jnp.asarray(rng.random((1, 64, 96, 3)).astype(np.float32))
    depth = jnp.asarray(rng.random((1, 64, 96, 2)).astype(np.float32) * 60)

    out32, _ = model.apply(params, state, image, depth, training=False)

    p16 = cast_tree(params, jnp.bfloat16)
    s16 = cast_tree(state, jnp.bfloat16)
    out16, _ = model.apply(p16, s16, image.astype(jnp.bfloat16),
                           depth.astype(jnp.bfloat16), training=False)
    out16 = np.asarray(out16, np.float32)
    out32 = np.asarray(out32)

    # depth values span [1, 100] m; bf16 has ~3 decimal digits
    mae = np.abs(out16 - out32).mean()
    rel = np.abs(out16 - out32) / np.maximum(out32, 1.0)
    assert mae < 0.25, f'bf16 MAE {mae:.3f} m'
    assert np.percentile(rel, 99) < 0.02


def test_bf16_pipeline_scatter_placement_matches_f32(rng):
    """Coordinates must stay f32 in bf16 serving: above x=1024 bf16
    quantizes pixel positions in steps of 8, which would shift the
    response crop's column window in the fused pipeline. The nonzero
    column support of the bridge response map must be IDENTICAL between
    the f32 and bf16 pipelines."""
    from rcfd_tpu.models import RadarNetModel
    from rcfd_tpu.pipeline import TwoStagePipeline

    h, w = 64, 1536
    rn_kwargs = dict(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(64, 32),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[4, 8, 8, 8, 8],
        n_neurons_encoder_depth=[4, 8, 8, 8, 8],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[8, 8, 8, 8, 8])
    fn_kwargs = dict(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[4, 6, 8, 8, 8],
        n_filters_encoder_depth=[4, 6, 8, 8, 8],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=1,
        n_filters_decoder=[8, 8, 8, 8, 8],
        min_predict_depth=1.0, max_predict_depth=100.0)

    radarnet = RadarNetModel(**rn_kwargs)
    fusionnet = FusionNetModel(**fn_kwargs)
    rn_vars = radarnet.init(jax.random.PRNGKey(0))
    fn_vars = fusionnet.init(jax.random.PRNGKey(1))

    image = jnp.asarray(rng.random((1, h, w, 3)).astype(np.float32) * 255)
    # x = 1203 is not representable in bf16 (rounds to 1200)
    points = jnp.asarray(np.array([[1203.0, 40.0, 17.0]], np.float32))
    valid = jnp.ones((1,), bool)

    pipe32 = TwoStagePipeline(radarnet, fusionnet, rn_vars, fn_vars, h, w)
    pipe16 = TwoStagePipeline(radarnet, fusionnet, rn_vars, fn_vars, h, w,
                              compute_dtype=jnp.bfloat16)
    _, _, r32 = pipe32(image, points, valid)
    _, _, r16 = pipe16(image, points, valid)

    cols32 = np.flatnonzero(np.asarray(r32).sum(axis=0))
    cols16 = np.flatnonzero(np.asarray(r16).sum(axis=0))
    assert cols32.size > 0
    np.testing.assert_array_equal(cols16, cols32)

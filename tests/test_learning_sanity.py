"""Training-dynamics sanity: both models must overfit a fixed batch
(loss drops substantially under repeated Adam steps through the full
jitted train step, including device-side augmentation disabled)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu import fusionnet_main, radarnet_main
from rcfd_tpu.data.transforms import Transforms
from rcfd_tpu.models import FusionNetModel, RadarNetModel
from rcfd_tpu.parallel.optim import init_adam

pytestmark = pytest.mark.slow  # CLI/train-loop scale


def test_fusionnet_overfits_fixed_batch(rng):
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
    opt_state = init_adam(params)

    transforms = Transforms(normalized_image_range=[0, 1])
    step = jax.jit(fusionnet_main._make_train_step(
        model, transforms, loss_func='l1', w_smoothness=0.0,
        w_lidar_loss=0.0, w_weight_decay=0.0,
        loss_smoothness_kernel_size=-1, outlier_kernel_size=-1,
        outlier_threshold=-1, dilation_kernel_size=-1))

    batch = (
        jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32) * 255),
        jnp.asarray(rng.random((2, 32, 32, 1), dtype=np.float32) * 60),
        jnp.asarray(rng.random((2, 32, 32, 1), dtype=np.float32)),
        jnp.full((2, 32, 32, 1), 20.0, jnp.float32),  # constant target
        jnp.zeros((2, 32, 32, 1), jnp.float32),
    )
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(60):
        params, state, opt_state, info = step(
            params, state, opt_state, batch, key,
            jnp.float32(3e-3), jnp.float32(0.0))
        losses.append(float(info['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.3 * losses[0], losses[::10]


def test_radarnet_overfits_fixed_batch(rng):
    patch = (64, 32)
    model = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=patch,
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_neurons_encoder_depth=[8, 12, 16, 16, 16],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[16, 12, 8, 8, 8])
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = init_adam(params)

    transforms = Transforms(normalized_image_range=[0, 1])
    step = jax.jit(radarnet_main._make_train_step(
        model, transforms, patch, max_distance_correspondence=0.4,
        set_invalid_to_negative_class=True, w_positive_class=2.0,
        w_weight_decay=0.0))

    b, k = 2, 2
    pad = patch[1] // 2
    w_img = 48
    x = rng.integers(pad, w_img + pad, size=(b, k)).astype(np.float32)
    points = np.stack([x, rng.integers(0, 64, (b, k)).astype(np.float32),
                       rng.random((b, k)).astype(np.float32) * 50 + 5],
                      axis=-1)
    boxes = np.stack([x - pad, np.zeros_like(x), x + pad,
                      np.full_like(x, patch[0])], axis=-1)
    gt = rng.random((b, k, patch[0], patch[1], 1)).astype(np.float32) * 60
    gt[gt < 30] = 0.0
    batch = (
        jnp.asarray(rng.random((b, patch[0], w_img + 2 * pad, 3),
                               dtype=np.float32) * 255),
        jnp.asarray(points), jnp.asarray(boxes), jnp.asarray(gt))

    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(60):
        params, state, opt_state, info = step(
            params, state, opt_state, batch, key,
            jnp.float32(1e-3), jnp.float32(0.0))
        losses.append(float(info['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], losses[::10]


def test_radarnet_overfits_fixed_batch_bf16(rng, monkeypatch):
    """The mixed-precision train step (RCFD_TRAIN_DTYPE=bfloat16: f32
    master weights, bf16 image-branch compute, f32 coordinates/labels)
    must also learn."""
    monkeypatch.setenv('RCFD_TRAIN_DTYPE', 'bfloat16')
    patch = (64, 32)
    model = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=patch,
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_neurons_encoder_depth=[8, 12, 16, 16, 16],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[16, 12, 8, 8, 8])
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = init_adam(params)

    transforms = Transforms(normalized_image_range=[0, 1])
    step = jax.jit(radarnet_main._make_train_step(
        model, transforms, patch, max_distance_correspondence=0.4,
        set_invalid_to_negative_class=True, w_positive_class=2.0,
        w_weight_decay=0.0))

    b, k = 2, 2
    pad = patch[1] // 2
    w_img = 48
    x = rng.integers(pad, w_img + pad, size=(b, k)).astype(np.float32)
    points = np.stack([x, rng.integers(0, 64, (b, k)).astype(np.float32),
                       rng.random((b, k)).astype(np.float32) * 50 + 5],
                      axis=-1)
    boxes = np.stack([x - pad, np.zeros_like(x), x + pad,
                      np.full_like(x, patch[0])], axis=-1)
    gt = rng.random((b, k, patch[0], patch[1], 1)).astype(np.float32) * 60
    gt[gt < 30] = 0.0
    batch = (
        jnp.asarray(rng.random((b, patch[0], w_img + 2 * pad, 3),
                               dtype=np.float32) * 255),
        jnp.asarray(points), jnp.asarray(boxes), jnp.asarray(gt))

    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(60):
        params, state, opt_state, info = step(
            params, state, opt_state, batch, key,
            jnp.float32(1e-3), jnp.float32(0.0))
        losses.append(float(info['loss']))
    # master weights stay f32 even though compute is bf16
    assert jax.tree_util.tree_leaves(params)[0].dtype == jnp.float32
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.6 * losses[0], losses[::10]

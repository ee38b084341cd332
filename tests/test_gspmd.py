"""GSPMD 2-D mesh (data x spatial) training: the full FusionNet step runs
sharded over 8 virtual devices and matches the single-device step exactly
(GSPMD preserves program semantics, including global BN statistics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu import fusionnet_main
from rcfd_tpu.data.transforms import Transforms
from rcfd_tpu.models import FusionNetModel
from rcfd_tpu.parallel.gspmd import (get_mesh_2d, gspmd_train_step,
                                     shard_batch_2d)
from rcfd_tpu.parallel.optim import init_adam


@pytest.mark.slow  # 137 s on one CPU core; the driver's dryrun_multichip
# exercises the same 2-D GSPMD path every round
@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_gspmd_2d_mesh_matches_single_device(rng):
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
    # NOTE: no axis pmean — GSPMD handles the reductions
    step_fn = fusionnet_main._make_train_step(
        model, transforms, loss_func='l1', w_smoothness=0.0,
        w_lidar_loss=2.0, w_weight_decay=0.0,
        loss_smoothness_kernel_size=-1, outlier_kernel_size=7,
        outlier_threshold=1.5, dilation_kernel_size=-1, axis_name=None)

    b, h, w = 4, 64, 64
    batch = (
        rng.random((b, h, w, 3)).astype(np.float32) * 255,
        rng.random((b, h, w, 1)).astype(np.float32) * 60,
        rng.random((b, h, w, 1)).astype(np.float32),
        rng.random((b, h, w, 1)).astype(np.float32) * 70,
        rng.random((b, h, w, 1)).astype(np.float32) * 70,
    )
    key = jax.random.PRNGKey(1)
    lr = jnp.float32(1e-3)
    p0 = jnp.float32(0.0)

    # single device reference
    ref_params, ref_state, ref_opt, ref_info = jax.jit(step_fn)(
        params, state, opt_state, tuple(jnp.asarray(x) for x in batch),
        key, lr, p0)

    # 2x4 (data x spatial) mesh
    mesh = get_mesh_2d(2, 4)
    make = gspmd_train_step(step_fn, mesh, donate_argnums=())
    step_jit = make(len(batch))
    sharded_batch = shard_batch_2d(mesh, batch)
    g_params, g_state, g_opt, g_info = step_jit(
        params, state, opt_state, sharded_batch, key, lr, p0)

    np.testing.assert_allclose(float(g_info['loss']),
                               float(ref_info['loss']), rtol=1e-5)
    # Adam's first step is ~ lr * g / (|g| + eps): for near-zero gradients
    # the update is sign-sensitive, so different (but equally valid)
    # cross-device reduction orders can move a weight by up to ~lr.
    for a, b_ in zip(jax.tree_util.tree_leaves(g_params),
                     jax.tree_util.tree_leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=2.5e-3)
    # BN running stats are GLOBAL batch statistics on both paths
    for a, b_ in zip(jax.tree_util.tree_leaves(g_state),
                     jax.tree_util.tree_leaves(ref_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)

"""Checkpoint interop: our .pth loads in the reference code (and round
trips through torch optimizers), and the native .npz path round trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.models import FusionNetModel
from rcfd_tpu.parallel.optim import adam_step, init_adam
from rcfd_tpu.utils.checkpoint import (optax_adam_to_torch_state,
                                       torch_adam_to_optax)

from reference_import import import_reference

pytestmark = pytest.mark.slow  # CLI/train-loop scale

CONFIG = dict(
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


def _train_one_step(model, params, state, opt_state, rng):
    image = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    depth = jnp.asarray(rng.standard_normal((2, 32, 32, 2)), jnp.float32)
    gt = jnp.asarray(rng.random((2, 32, 32, 1)) * 70, jnp.float32)

    def loss_fn(p):
        out, new_state = model.apply(p, state, image, depth, training=True)
        loss, _ = model.compute_loss(
            image=image, output_depth=out, ground_truth=gt, lidar_map=gt * 0,
            loss_func='l1', w_smoothness=0.0, loss_smoothness_kernel_size=-1,
            validity_map_loss_smoothness=None, w_lidar_loss=0.0)
        return loss, new_state

    grads, new_state = jax.grad(loss_fn, has_aux=True)(params)
    params, opt_state = adam_step(params, grads, opt_state, 1e-3)
    return params, new_state, opt_state


def test_our_checkpoint_loads_in_reference(tmp_path, rng):
    import torch
    fusionnet_model = import_reference('fusionnet_model')

    model = FusionNetModel(**CONFIG)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = init_adam(params)
    params, state, opt_state = _train_one_step(model, params, state,
                                               opt_state, rng)

    path = str(tmp_path / 'ours.pth')
    model.save_checkpoint(
        path, params, state, step=42,
        optimizer_state_dict=optax_adam_to_torch_state(
            jax.device_get(params), jax.device_get(opt_state), 1e-3, 0.0))

    ref = fusionnet_model.FusionNetModel(
        **{k: v for k, v in CONFIG.items()},
        deconv_type='up', activation_func='leaky_relu',
        weight_initializer='kaiming_uniform', device=torch.device('cpu'))
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    step, opt = ref.restore_model(path, optimizer=opt)
    assert step == 42

    # forward parity after the round trip
    image = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    depth = rng.standard_normal((1, 32, 32, 2)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        ref_out = ref.forward(
            image=torch.from_numpy(image.transpose(0, 3, 1, 2)),
            input_depth=torch.from_numpy(depth.transpose(0, 3, 1, 2))).numpy()
    ours, _ = model.apply(params, state, jnp.asarray(image),
                          jnp.asarray(depth), training=False)
    np.testing.assert_allclose(np.asarray(ours)[..., 0], ref_out[:, 0],
                               rtol=1e-4, atol=1e-4)


def test_optimizer_state_round_trip(rng):
    model = FusionNetModel(**CONFIG)
    params, state = model.init(jax.random.PRNGKey(1))
    opt_state = init_adam(params)
    params, state, opt_state = _train_one_step(model, params, state,
                                               opt_state, rng)

    torch_sd = optax_adam_to_torch_state(
        jax.device_get(params), jax.device_get(opt_state), 1e-3, 0.0)
    restored = torch_adam_to_optax(jax.device_get(params), torch_sd)

    assert int(restored['count']) == int(opt_state['count'])
    for a, b in zip(jax.tree_util.tree_leaves(restored['mu']),
                    jax.tree_util.tree_leaves(opt_state['mu'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(restored['nu']),
                    jax.tree_util.tree_leaves(opt_state['nu'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_dataparallel_prefixed_checkpoint_loads(tmp_path, rng):
    """The reference wraps encoder/decoder in torch.nn.DataParallel BEFORE
    saving (src/fusionnet_model.py:395-401), so released state_dicts carry
    'module.' prefixes; the converter must strip them."""
    import torch
    fusionnet_model = import_reference('fusionnet_model')

    ref = fusionnet_model.FusionNetModel(
        **{k: v for k, v in CONFIG.items()},
        deconv_type='up', activation_func='leaky_relu',
        weight_initializer='kaiming_uniform', device=torch.device('cpu'))
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    ref.data_parallel()  # wraps in DataParallel -> 'module.' keys
    path = str(tmp_path / 'dp.pth')
    ref.save_model(path, step=5, optimizer=opt)

    sd = torch.load(path, map_location='cpu', weights_only=False)
    assert any(k.startswith('module.')
               for k in sd['encoder_state_dict'].keys())

    model = FusionNetModel(**CONFIG)
    params, state, step, _ = model.restore_checkpoint(path)
    assert step == 5

    image = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    depth = rng.standard_normal((1, 32, 32, 2)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        ref_out = ref.forward(
            image=torch.from_numpy(image.transpose(0, 3, 1, 2)),
            input_depth=torch.from_numpy(depth.transpose(0, 3, 1, 2))).numpy()
    ours, _ = model.apply(params, state, jnp.asarray(image),
                          jnp.asarray(depth), training=False)
    np.testing.assert_allclose(np.asarray(ours)[..., 0], ref_out[:, 0],
                               rtol=1e-4, atol=1e-4)


def test_native_npz_round_trip(tmp_path):
    model = FusionNetModel(**CONFIG)
    params, state = model.init(jax.random.PRNGKey(2))
    path = str(tmp_path / 'ours.npz')
    model.save_checkpoint(path, params, state, step=7)
    p2, s2, step, _ = model.restore_checkpoint(path)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_round_trip(tmp_path):
    pytest.importorskip('orbax.checkpoint')
    model = FusionNetModel(**CONFIG)
    params, state = model.init(jax.random.PRNGKey(3))
    path = str(tmp_path / 'ours.orbax')
    model.save_checkpoint(path, params, state, step=9)
    p2, s2, step, _ = model.restore_checkpoint(path)
    assert step == 9
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Gradient parity: jax.grad through our FusionNet must match torch
autograd through the reference with identical weights and loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.models import FusionNetModel
from rcfd_tpu.utils.checkpoint import tree_to_torch_state_dict

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


def test_fusionnet_gradient_parity(tmp_path, rng):
    """Float64 on both sides so accumulation-order noise cannot mask (or
    mimic) a real backward-pass discrepancy."""
    import torch
    jax.config.update('jax_enable_x64', True)
    try:
        _run_gradient_parity(tmp_path, rng)
    finally:
        jax.config.update('jax_enable_x64', False)


def _run_gradient_parity(tmp_path, rng):
    import torch
    fusionnet_model = import_reference('fusionnet_model')
    torch.manual_seed(0)
    ref = fusionnet_model.FusionNetModel(
        **CONFIG, deconv_type='up', activation_func='leaky_relu',
        weight_initializer='kaiming_uniform', device=torch.device('cpu'))
    ours = FusionNetModel(**CONFIG)

    path = str(tmp_path / 'g.pth')
    ref.save_model(path, step=0,
                   optimizer=torch.optim.Adam(ref.parameters(), lr=1e-3))
    params, state = ours.restore_checkpoint(path)[:2]
    ref.encoder.double()
    ref.decoder.double()
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float64), params)
    state = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float64)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else x, state)

    image = rng.random((2, 32, 32, 3)).astype(np.float64)
    depth = (rng.random((2, 32, 32, 2)) * 60).astype(np.float64)
    gt = (rng.random((2, 32, 32, 1)) * 70).astype(np.float64)
    gt[gt < 35] = 0.0
    lidar = (rng.random((2, 32, 32, 1)) * 70).astype(np.float64)
    lidar[lidar < 60] = 0.0

    # ---- torch backward ------------------------------------------------------
    ref.train()
    t = lambda a: torch.from_numpy(a.transpose(0, 3, 1, 2))
    t_out = ref.forward(image=t(image), input_depth=t(depth))
    ref_loss, _ = ref.compute_loss(
        image=t(image), output_depth=t_out, ground_truth=t(gt),
        lidar_map=t(lidar), loss_func='l1', w_smoothness=0.1,
        loss_smoothness_kernel_size=1,
        validity_map_loss_smoothness=t((gt <= 0).astype(np.float64)),
        w_lidar_loss=2.0)
    ref_loss.backward()
    # unused projection convs get no grad in torch (None); ours must be zero
    ref_grads = {name: (p.grad.detach().numpy() if p.grad is not None else None)
                 for name, p in ref.encoder.named_parameters()}

    # ---- jax backward --------------------------------------------------------
    def loss_fn(p):
        out, _ = ours.apply(p, state, jnp.asarray(image), jnp.asarray(depth),
                            training=True)
        loss, _ = ours.compute_loss(
            image=jnp.asarray(image), output_depth=out,
            ground_truth=jnp.asarray(gt), lidar_map=jnp.asarray(lidar),
            loss_func='l1', w_smoothness=0.1, loss_smoothness_kernel_size=1,
            validity_map_loss_smoothness=jnp.asarray(
                (gt <= 0).astype(np.float64)),
            w_lidar_loss=2.0)
        return loss

    loss_val, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_val), float(ref_loss.detach()),
                               rtol=1e-9, atol=1e-12)

    ours_flat = tree_to_torch_state_dict(grads['encoder'])
    checked = 0
    for name, ref_g in ref_grads.items():
        g = ours_flat[name]
        if ref_g is None:
            np.testing.assert_allclose(g, np.zeros_like(g), atol=0,
                                       err_msg=f'encoder.{name}')
            continue
        assert g.shape == ref_g.shape, name
        denom = np.linalg.norm(ref_g) + 1e-300
        rel = np.linalg.norm(g - ref_g) / denom
        assert rel < 1e-9, \
            f'gradient mismatch at encoder.{name}: rel error {rel:.2e}'
        checked += 1
    assert checked > 30

"""Additional parity coverage: 34-layer encoders, image-only FusionNet,
eval metrics vs the reference implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.models import FusionNetModel
from rcfd_tpu.utils import eval_utils

from reference_import import import_reference


def _pair(tmp_path, encoder_type, fusion_type='weight_and_project',
          n_filters_depth=None):
    import torch
    fusionnet_model = import_reference('fusionnet_model')
    torch.manual_seed(0)
    cfg = dict(
        input_channels_image=3,
        input_channels_depth=2,
        encoder_type=encoder_type,
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_filters_encoder_depth=n_filters_depth or [4, 6, 8, 8, 8],
        fusion_type=fusion_type,
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=1,
        n_filters_decoder=[16, 12, 8, 8, 8],
        min_predict_depth=1.0,
        max_predict_depth=100.0)
    ref = fusionnet_model.FusionNetModel(
        **cfg, deconv_type='up', activation_func='leaky_relu',
        weight_initializer='kaiming_uniform', device=torch.device('cpu'))
    ours = FusionNetModel(**cfg)
    path = str(tmp_path / 'm.pth')
    ref.save_model(path, step=1,
                   optimizer=torch.optim.Adam(ref.parameters(), lr=1e-4))
    params, state, _, _ = ours.restore_checkpoint(path)
    return ref, ours, params, state


def _compare(ref, ours, params, state, rng, with_depth=True):
    import torch
    image = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    depth = rng.standard_normal((1, 64, 64, 2)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        ref_out = ref.forward(
            image=torch.from_numpy(image.transpose(0, 3, 1, 2)),
            input_depth=torch.from_numpy(depth.transpose(0, 3, 1, 2))).numpy()
    out, _ = ours.apply(params, state, jnp.asarray(image), jnp.asarray(depth))
    np.testing.assert_allclose(np.asarray(out)[..., 0], ref_out[:, 0],
                               rtol=1e-4, atol=1e-4)


def test_fusionnet34_parity(tmp_path, rng):
    ref, ours, params, state = _pair(tmp_path, 'fusionnet34_batch_norm')
    _compare(ref, ours, params, state, rng)


def test_resnet18_image_only_parity(tmp_path, rng):
    """encoder_type resnet18 uses a single-branch ResNet over the image
    only (src/fusionnet_model.py:103-113)."""
    ref, ours, params, state = _pair(tmp_path, 'resnet18_batch_norm',
                                     fusion_type='add')
    _compare(ref, ours, params, state, rng)


def test_multiscale_decoder_n_resolution_3_parity(tmp_path, rng):
    """n_resolution > 1 exercises the side outputs + align_corners bilinear
    upsample + skip concatenation (src/networks.py:1595-1645)."""
    import torch
    fusionnet_model = import_reference('fusionnet_model')
    torch.manual_seed(3)
    cfg = dict(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_filters_encoder_depth=[4, 6, 8, 8, 8],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=3,
        n_filters_decoder=[16, 12, 8, 8, 8],
        min_predict_depth=1.0, max_predict_depth=100.0)
    ref = fusionnet_model.FusionNetModel(
        **cfg, deconv_type='up', activation_func='leaky_relu',
        weight_initializer='kaiming_uniform', device=torch.device('cpu'))
    ours = FusionNetModel(**cfg)
    path = str(tmp_path / 'ms.pth')
    ref.save_model(path, step=1,
                   optimizer=torch.optim.Adam(ref.parameters(), lr=1e-4))
    params, state, _, _ = ours.restore_checkpoint(path)

    image = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    depth = rng.standard_normal((1, 64, 64, 2)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        ref_outs = ref.forward(
            image=torch.from_numpy(image.transpose(0, 3, 1, 2)),
            input_depth=torch.from_numpy(depth.transpose(0, 3, 1, 2)),
            return_multiscale=True)
    outs, _ = ours.apply(params, state, jnp.asarray(image),
                         jnp.asarray(depth), return_multiscale=True)
    assert len(outs) == len(ref_outs) == 3
    for o, r in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.asarray(o)[..., 0], r.numpy()[:, 0], rtol=1e-4, atol=1e-4)


def test_eval_metrics_match_reference(rng):
    ref_eval = import_reference('eval_utils')
    src = rng.random(500).astype(np.float32) * 70 + 1
    tgt = rng.random(500).astype(np.float32) * 70 + 1
    np.testing.assert_allclose(eval_utils.mean_abs_err(src, tgt),
                               ref_eval.mean_abs_err(src, tgt), rtol=1e-6)
    np.testing.assert_allclose(eval_utils.root_mean_sq_err(src, tgt),
                               ref_eval.root_mean_sq_err(src, tgt), rtol=1e-6)
    np.testing.assert_allclose(eval_utils.inv_mean_abs_err(src, tgt),
                               ref_eval.inv_mean_abs_err(src, tgt), rtol=1e-6)
    np.testing.assert_allclose(eval_utils.inv_root_mean_sq_err(src, tgt),
                               ref_eval.inv_root_mean_sq_err(src, tgt),
                               rtol=1e-6)
    np.testing.assert_allclose(eval_utils.mean_abs_rel_err(src, tgt),
                               ref_eval.mean_abs_rel_err(src, tgt), rtol=1e-6)


def test_outlier_removal_matches_reference(rng):
    import torch
    net_utils = import_reference('net_utils')
    depth = rng.random((2, 1, 24, 32)).astype(np.float32) * 60
    depth[depth < 20] = 0.0
    ref_or = net_utils.OutlierRemoval(kernel_size=7, threshold=1.5)
    ref_out = ref_or.remove_outliers(torch.from_numpy(depth)).numpy()

    from rcfd_tpu.nn import functional as F
    ours = F.outlier_removal(
        jnp.asarray(depth.transpose(0, 2, 3, 1)), kernel_size=7, threshold=1.5)
    np.testing.assert_allclose(
        np.asarray(ours)[..., 0], ref_out[:, 0], rtol=1e-5, atol=1e-6)

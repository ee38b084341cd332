"""End-to-end parity: our FusionNet vs the PyTorch reference, weights
transferred through the .pth checkpoint converter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.models import FusionNetModel

from reference_import import import_reference

pytestmark = pytest.mark.smoke

CONFIG = dict(
    input_channels_image=3,
    input_channels_depth=2,
    encoder_type='fusionnet18_batch_norm',
    n_filters_encoder_image=[8, 12, 16, 24, 24],
    n_filters_encoder_depth=[4, 6, 8, 12, 12],
    fusion_type='weight_and_project',
    decoder_type='multiscale_batch_norm',
    n_filters_decoder=[24, 16, 12, 8, 8],
    min_predict_depth=1.0,
    max_predict_depth=100.0,
)


def _build_reference(fusion_type, encoder_type, decoder_type, n_res=1):
    import torch
    fusionnet_model = import_reference('fusionnet_model')
    cfg = dict(CONFIG, fusion_type=fusion_type, encoder_type=encoder_type,
               decoder_type=decoder_type)
    if fusion_type == 'weight':
        # 'weight' adds gated depth features onto image features, so the
        # branch widths must match (src/networks.py:862)
        cfg['n_filters_encoder_depth'] = cfg['n_filters_encoder_image']
    ref = fusionnet_model.FusionNetModel(
        input_channels_image=cfg['input_channels_image'],
        input_channels_depth=cfg['input_channels_depth'],
        encoder_type=cfg['encoder_type'],
        n_filters_encoder_image=cfg['n_filters_encoder_image'],
        n_filters_encoder_depth=cfg['n_filters_encoder_depth'],
        fusion_type=cfg['fusion_type'],
        decoder_type=cfg['decoder_type'],
        n_resolution_decoder=n_res,
        n_filters_decoder=cfg['n_filters_decoder'],
        deconv_type='up',
        activation_func='leaky_relu',
        weight_initializer='kaiming_uniform',
        min_predict_depth=cfg['min_predict_depth'],
        max_predict_depth=cfg['max_predict_depth'],
        device=torch.device('cpu'))
    return ref, cfg


def _build_ours(cfg, n_res=1):
    return FusionNetModel(
        input_channels_image=cfg['input_channels_image'],
        input_channels_depth=cfg['input_channels_depth'],
        encoder_type=cfg['encoder_type'],
        n_filters_encoder_image=cfg['n_filters_encoder_image'],
        n_filters_encoder_depth=cfg['n_filters_encoder_depth'],
        fusion_type=cfg['fusion_type'],
        decoder_type=cfg['decoder_type'],
        n_resolution_decoder=n_res,
        n_filters_decoder=cfg['n_filters_decoder'],
        deconv_type='up',
        activation_func='leaky_relu',
        weight_initializer='kaiming_uniform',
        min_predict_depth=cfg['min_predict_depth'],
        max_predict_depth=cfg['max_predict_depth'])


def _roundtrip_weights(ref, ours, tmp_path):
    import torch
    path = str(tmp_path / 'ref.pth')
    opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
    ref.save_model(path, step=7, optimizer=opt)
    params, state, step, _ = ours.restore_checkpoint(path)
    assert step == 7
    return params, state


@pytest.mark.parametrize('fusion_type', ['add', 'weight', 'weight_and_project', 'concat'])
def test_fusionnet_forward_parity(tmp_path, fusion_type):
    import torch
    torch.manual_seed(0)
    ref, cfg = _build_reference(fusion_type, 'fusionnet18_batch_norm',
                                'multiscale_batch_norm')
    ours = _build_ours(cfg)
    params, state = _roundtrip_weights(ref, ours, tmp_path)

    rng = np.random.default_rng(0)
    image = rng.standard_normal((2, 64, 96, 3), dtype=np.float32)
    depth = rng.standard_normal((2, 64, 96, 2), dtype=np.float32)

    ref.eval()
    with torch.no_grad():
        ref_out = ref.forward(
            image=torch.from_numpy(image.transpose(0, 3, 1, 2)),
            input_depth=torch.from_numpy(depth.transpose(0, 3, 1, 2)))
    ref_out = ref_out.numpy()[:, 0]

    out, _ = ours.apply(params, state, jnp.asarray(image), jnp.asarray(depth),
                        training=False)
    out = np.asarray(out)[..., 0]
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-4)


def test_fusionnet_no_batch_norm_parity(tmp_path):
    import torch
    torch.manual_seed(1)
    ref, cfg = _build_reference('weight_and_project', 'fusionnet18',
                                'multiscale')
    ours = _build_ours(cfg)
    params, state = _roundtrip_weights(ref, ours, tmp_path)

    rng = np.random.default_rng(1)
    image = rng.standard_normal((1, 64, 64, 3), dtype=np.float32)
    depth = rng.standard_normal((1, 64, 64, 2), dtype=np.float32)

    ref.eval()
    with torch.no_grad():
        ref_out = ref.forward(
            image=torch.from_numpy(image.transpose(0, 3, 1, 2)),
            input_depth=torch.from_numpy(depth.transpose(0, 3, 1, 2))).numpy()
    out, _ = ours.apply(params, state, jnp.asarray(image), jnp.asarray(depth))
    np.testing.assert_allclose(
        np.asarray(out)[..., 0], ref_out[:, 0], rtol=1e-4, atol=1e-4)


def test_fusionnet_train_mode_batchnorm_parity(tmp_path):
    """Training-mode forward uses batch statistics; outputs must match."""
    import torch
    torch.manual_seed(2)
    ref, cfg = _build_reference('add', 'fusionnet18_batch_norm',
                                'multiscale_batch_norm')
    ours = _build_ours(cfg)
    params, state = _roundtrip_weights(ref, ours, tmp_path)

    rng = np.random.default_rng(2)
    image = rng.standard_normal((2, 64, 64, 3), dtype=np.float32)
    depth = rng.standard_normal((2, 64, 64, 2), dtype=np.float32)

    ref.train()
    with torch.no_grad():
        ref_out = ref.forward(
            image=torch.from_numpy(image.transpose(0, 3, 1, 2)),
            input_depth=torch.from_numpy(depth.transpose(0, 3, 1, 2))).numpy()
    out, new_state = ours.apply(params, state, jnp.asarray(image),
                                jnp.asarray(depth), training=True)
    np.testing.assert_allclose(
        np.asarray(out)[..., 0], ref_out[:, 0], rtol=1e-4, atol=1e-4)

    # running stats must update identically
    ref_sd = ref.encoder.state_dict()
    ref_mean = ref_sd['conv1_image.batch_norm.running_mean'].numpy()
    ours_mean = np.asarray(
        new_state['encoder']['conv1_image']['batch_norm']['running_mean'])
    np.testing.assert_allclose(ours_mean, ref_mean, rtol=1e-4, atol=1e-5)


def test_fusionnet_loss_parity(tmp_path):
    import torch
    torch.manual_seed(3)
    ref, cfg = _build_reference('weight_and_project', 'fusionnet18_batch_norm',
                                'multiscale_batch_norm')
    ours = _build_ours(cfg)

    rng = np.random.default_rng(3)
    image = rng.random((2, 32, 32, 3), dtype=np.float32)
    output = (rng.random((2, 32, 32, 1), dtype=np.float32) * 80 + 1)
    gt = rng.random((2, 32, 32, 1), dtype=np.float32) * 80
    gt[gt < 40] = 0.0
    lidar = rng.random((2, 32, 32, 1), dtype=np.float32) * 80
    lidar[lidar < 60] = 0.0
    vmap_smooth = (gt <= 0).astype(np.float32)

    for loss_func in ['l1', 'l2', 'smoothl1']:
        for w_smooth, ks in [(0.0, 1), (0.15, 1), (0.15, 7)]:
            t = lambda a: torch.from_numpy(a.transpose(0, 3, 1, 2))
            ref_loss, ref_info = ref.compute_loss(
                image=t(image), output_depth=t(output), ground_truth=t(gt),
                lidar_map=t(lidar), loss_func=loss_func, w_smoothness=w_smooth,
                loss_smoothness_kernel_size=ks,
                validity_map_loss_smoothness=t(vmap_smooth),
                w_lidar_loss=2.0)
            loss, info = ours.compute_loss(
                image=jnp.asarray(image), output_depth=jnp.asarray(output),
                ground_truth=jnp.asarray(gt), lidar_map=jnp.asarray(lidar),
                loss_func=loss_func, w_smoothness=w_smooth,
                loss_smoothness_kernel_size=ks,
                validity_map_loss_smoothness=jnp.asarray(vmap_smooth),
                w_lidar_loss=2.0)
            np.testing.assert_allclose(
                float(loss), float(ref_loss), rtol=2e-4, atol=1e-5,
                err_msg=f'{loss_func} w_smooth={w_smooth} ks={ks}')

"""End-to-end parity: our RadarNet vs the PyTorch reference (which runs
through the pure-torch roi_pool oracle in reference_import)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.models import RadarNetModel

from reference_import import import_reference

PATCH = (64, 64)
CONFIG = dict(
    input_channels_image=3,
    input_channels_depth=3,
    input_patch_size_image=PATCH,
    n_filters_encoder_image=[8, 12, 16, 16, 16],
    n_neurons_encoder_depth=[8, 12, 16, 16, 16],
    n_filters_decoder=[24, 16, 12, 8, 8],
)


def _build_pair(encoder_type, decoder_type, tmp_path):
    import torch
    radarnet_model = import_reference('radarnet_model')
    torch.manual_seed(0)
    ref = radarnet_model.RadarNetModel(
        input_channels_image=CONFIG['input_channels_image'],
        input_channels_depth=CONFIG['input_channels_depth'],
        input_patch_size_image=PATCH,
        encoder_type=encoder_type,
        n_filters_encoder_image=CONFIG['n_filters_encoder_image'],
        n_neurons_encoder_depth=CONFIG['n_neurons_encoder_depth'],
        decoder_type=decoder_type,
        n_filters_decoder=CONFIG['n_filters_decoder'],
        weight_initializer='kaiming_uniform',
        activation_func='leaky_relu',
        device=torch.device('cpu'))

    ours = RadarNetModel(
        input_channels_image=CONFIG['input_channels_image'],
        input_channels_depth=CONFIG['input_channels_depth'],
        input_patch_size_image=PATCH,
        encoder_type=encoder_type,
        n_filters_encoder_image=CONFIG['n_filters_encoder_image'],
        n_neurons_encoder_depth=CONFIG['n_neurons_encoder_depth'],
        decoder_type=decoder_type,
        n_filters_decoder=CONFIG['n_filters_decoder'],
        weight_initializer='kaiming_uniform',
        activation_func='leaky_relu')

    path = str(tmp_path / 'radarnet.pth')
    opt = torch.optim.Adam(ref.parameters(), lr=1e-4)
    ref.save_model(path, step=3, optimizer=opt)
    params, state, step, _ = ours.restore_checkpoint(path)
    assert step == 3
    return ref, ours, params, state


@pytest.mark.parametrize('encoder_type,decoder_type', [
    ('radarnetv1_batch_norm', 'multiscale_batch_norm'),
    ('radarnetv1', 'multiscale'),
])
def test_radarnet_forward_parity(tmp_path, encoder_type, decoder_type):
    import torch
    ref, ours, params, state = _build_pair(encoder_type, decoder_type, tmp_path)

    rng = np.random.default_rng(0)
    b, k = 2, 3
    h, w = PATCH  # image height equals patch height; width padded by pw
    pad = PATCH[1] // 2
    w_padded = 96 + 2 * pad

    image = rng.standard_normal((b, h, w_padded, 3), dtype=np.float32)
    points = rng.standard_normal((b * k, 3), dtype=np.float32)
    # box left edges, in padded coords: x in [pad, 96 + pad)
    x_center = rng.integers(pad, 96 + pad, size=(b, k)).astype(np.float32)
    x1 = x_center - pad

    boxes = [
        torch.tensor(
            [[x, 0.0, x + PATCH[1], float(h)] for x in row], dtype=torch.float32)
        for row in x1
    ]

    ref.eval()
    with torch.no_grad():
        ref_logits = ref.forward(
            image=torch.from_numpy(image.transpose(0, 3, 1, 2)),
            point=torch.from_numpy(points),
            bounding_boxes=boxes,
            return_logits=True).numpy()

    logits, _ = ours.apply(params, state, jnp.asarray(image),
                           jnp.asarray(points), jnp.asarray(x1),
                           box_height=h, return_logits=True)
    np.testing.assert_allclose(
        np.asarray(logits)[..., 0], ref_logits[:, 0], rtol=1e-4, atol=1e-4)


@pytest.mark.smoke
def test_radarnet_loss_parity(tmp_path):
    import torch
    ref, ours, params, state = _build_pair(
        'radarnetv1_batch_norm', 'multiscale_batch_norm', tmp_path)

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((4, 16, 16, 1), dtype=np.float32)
    gt = (rng.random((4, 16, 16, 1)) > 0.7).astype(np.float32)
    validity = (rng.random((4, 16, 16, 1)) > 0.3).astype(np.float32)

    t = lambda a: torch.from_numpy(a.transpose(0, 3, 1, 2))
    ref_loss, _ = ref.compute_loss(t(logits), t(gt), t(validity),
                                   w_positive_class=2.0)
    loss, _ = ours.compute_loss(jnp.asarray(logits), jnp.asarray(gt),
                                jnp.asarray(validity), w_positive_class=2.0)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5, atol=1e-6)

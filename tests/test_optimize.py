"""BN folding and fast nearest-resize must be numerically faithful."""

import numpy as np

import jax
import jax.numpy as jnp

from rcfd_tpu.models import FusionNetModel, RadarNetModel
from rcfd_tpu.nn import functional as F
from rcfd_tpu.nn.optimize import fold_batch_norm


def test_fold_batch_norm_fusionnet(rng):
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

    # give running stats non-trivial values by doing one training pass
    image = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    depth = jnp.asarray(rng.standard_normal((2, 32, 32, 2)), jnp.float32)
    _, state = model.apply(params, state, image, depth, training=True)

    ref, _ = model.apply(params, state, image, depth, training=False)

    folded_params, folded_state = fold_batch_norm(params, state)
    out, _ = model.apply(folded_params, folded_state, image, depth,
                         training=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_resize_nearest_integer_fast_path(rng):
    x = jnp.asarray(rng.standard_normal((2, 7, 9, 3)), jnp.float32)
    fast = F.resize_nearest(x, (14, 18))
    # gather path reference
    row_idx = (np.arange(14) * 7) // 14
    col_idx = (np.arange(18) * 9) // 18
    ref = np.asarray(x)[:, row_idx][:, :, col_idx]
    np.testing.assert_array_equal(np.asarray(fast), ref)

    fast3 = F.resize_nearest(x, (21, 27))
    row_idx = (np.arange(21) * 7) // 21
    col_idx = (np.arange(27) * 9) // 27
    ref3 = np.asarray(x)[:, row_idx][:, :, col_idx]
    np.testing.assert_array_equal(np.asarray(fast3), ref3)

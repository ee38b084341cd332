"""Fused 2x upsample+conv must be exactly equivalent to resize->conv."""

import numpy as np

import jax
import jax.numpy as jnp

from rcfd_tpu.nn import functional as F
from rcfd_tpu.nn.layers import UpConv2d


def test_upsample2x_conv2d_equivalence(rng):
    for h, w, cin, cout in [(5, 7, 4, 6), (8, 8, 3, 5), (1, 3, 2, 2)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)
        ref = F.conv2d(F.resize_nearest(x, (2 * h, 2 * w)), k)
        fused = F.upsample2x_conv2d(x, k)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_upconv2d_fused_path_matches_generic(rng, monkeypatch):
    monkeypatch.setenv("RCFD_FUSED_UPSAMPLE", "1")
    layer = UpConv2d(4, 6, kernel_size=3, activation_func='leaky_relu',
                     use_batch_norm=True)
    params, state = layer.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 4)), jnp.float32)

    fused, _ = layer(params, state, x, shape=(12, 16))
    # generic path: resize then Conv2d directly
    up = F.resize_nearest(x, (12, 16))
    ref, _ = layer.conv(params['conv'], state['conv'], up)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # odd target shape falls back to the generic path
    out_odd, _ = layer(params, state, x, shape=(13, 16))
    assert out_odd.shape == (2, 13, 16, 6)

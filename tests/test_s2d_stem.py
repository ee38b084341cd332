"""ops/s2d_stem.py: the 2x2 space-to-depth stem rewrite must be an exact
(up to f32 summation order) replacement for the 7x7/s2 stem conv, both
at the op level and end-to-end through FusionNetModel.apply with packed
inputs (the Conv2d shape-dispatch path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.nn import functional as F
from rcfd_tpu.ops.s2d_stem import (conv2d_s2d_stem, pack2x2, pack2x2_np,
                                   s2d_stem_weights)


def test_pack2x2_np_matches_device():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
    np.testing.assert_array_equal(pack2x2_np(x), np.asarray(pack2x2(x)))


def test_pack2x2_rejects_odd_dims():
    with pytest.raises(ValueError):
        pack2x2_np(np.zeros((1, 7, 8, 3), np.float32))
    with pytest.raises(ValueError):
        pack2x2_np(np.zeros((1, 8, 9, 3), np.float32))


@pytest.mark.parametrize('cin,cout', [(3, 32), (2, 16)])
def test_conv_s2d_exact(cin, cout):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 96, cin)).astype(np.float32)
    w7 = (rng.standard_normal((7, 7, cin, cout)).astype(np.float32) * 0.05)
    direct = np.asarray(jax.jit(
        lambda x, w: F.conv2d(x, w, stride=2))(x, w7))
    packed = np.asarray(jax.jit(conv2d_s2d_stem)(pack2x2_np(x), w7))
    assert direct.shape == packed.shape
    np.testing.assert_allclose(packed, direct, rtol=1e-5, atol=1e-5)


def test_s2d_weights_preserve_mass():
    rng = np.random.default_rng(2)
    w7 = rng.standard_normal((7, 7, 3, 8)).astype(np.float32)
    w4 = np.asarray(s2d_stem_weights(w7))
    assert w4.shape == (4, 4, 12, 8)
    # every tap appears exactly once
    np.testing.assert_allclose(w4.sum(), w7.sum(), rtol=1e-5)
    assert (w4 != 0).sum() == w7.size


def _small_model():
    from rcfd_tpu.models import FusionNetModel
    return FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_filters_encoder_depth=[4, 6, 8, 8, 8],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm', n_resolution_decoder=1,
        n_filters_decoder=[16, 12, 8, 8, 8],
        min_predict_depth=1.0, max_predict_depth=100.0)


def test_fusionnet_apply_packed_input_parity():
    """model.apply(pack2x2(image), pack2x2(depth)) must equal the
    unpacked forward: same output SHAPE (the decoder target is derived
    from the packed dims x2) and same values."""
    model = _small_model()
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    image = rng.random((2, 64, 96, 3), np.float32)
    depth = rng.random((2, 64, 96, 2), np.float32)

    out, _ = jax.jit(lambda p, s, i, d: model.apply(p, s, i, d))(
        params, state, image, depth)
    out_packed, _ = jax.jit(lambda p, s, i, d: model.apply(p, s, i, d))(
        params, state, pack2x2_np(image), pack2x2_np(depth))

    assert out.shape == out_packed.shape
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out),
                               rtol=1e-4, atol=1e-5)


def test_conv2d_layer_rejects_wrong_channels():
    """A non-stem Conv2d (k=3) given 4x channels must still fail loudly —
    the packed dispatch is stem-only (k=7, s=2)."""
    from rcfd_tpu.nn.layers import Conv2d
    layer = Conv2d(3, 8, kernel_size=3, stride=1)
    p, s = layer.init(jax.random.PRNGKey(0))
    with pytest.raises(Exception):
        jax.eval_shape(lambda p, s, x: layer(p, s, x), p, s,
                       jnp.zeros((1, 8, 8, 12), jnp.float32))


def test_phase_interleave_matches_packed_concat():
    """bench.py packs depth and response separately and interleaves their
    phases in-graph; the result must equal pack2x2(concat(depth,
    response)) — the channel order conv1_depth's packed dispatch
    assumes."""
    rng = np.random.default_rng(4)
    d = rng.random((2, 8, 12, 1), np.float32)
    r = rng.random((2, 8, 12, 1), np.float32)
    want = pack2x2_np(np.concatenate([d, r], axis=-1))
    pd, pr = pack2x2_np(d), pack2x2_np(r)
    got = np.stack([pd, pr], axis=-1).reshape(*pd.shape[:-1], 8)
    np.testing.assert_array_equal(got, want)

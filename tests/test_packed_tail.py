"""Phase-packed decoder tail (ops/packed_tail.py) vs the unpacked path.

The packed tail must be numerically equivalent (up to float reassociation
of aliased kernel taps) to nearest-up x2 -> conv3x3 -> conv3x3 -> conv3x3
at full resolution, including BN eval mode, biases, leaky_relu, and the
zero-padding boundary rows/columns.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.models.networks import MultiScaleDecoder
from rcfd_tpu.nn.optimize import fold_batch_norm


def _mk_decoder(use_bn):
    return MultiScaleDecoder(
        input_channels=24,
        output_channels=1,
        n_resolution=1,
        n_filters=[16, 12, 8, 8, 8],
        n_skips=[12, 8, 6, 4, 0],
        output_func='linear',
        use_batch_norm=use_bn,
        deconv_type='up')


def _inputs(rng, b=2, h=8, w=12):
    latent = jnp.asarray(rng.standard_normal((b, h, w, 24)), jnp.float32)
    # skips[-1] (2x latent, channels n_skips[0]) is consumed first
    skips = [
        jnp.asarray(rng.standard_normal(
            (b, h * f, w * f, c)), jnp.float32)
        for f, c in [(16, 4), (8, 6), (4, 8), (2, 12)]
    ]
    return latent, skips


@pytest.mark.parametrize('use_bn', [False, True])
def test_packed_tail_matches_unpacked(use_bn, rng, monkeypatch):
    dec = _mk_decoder(use_bn)
    params, state = dec.init(jax.random.PRNGKey(3))
    if use_bn:
        # make BN stats non-trivial
        def scramble(tree, key=[0]):
            for k, v in tree.items():
                if isinstance(v, dict):
                    scramble(v)
                elif k == 'running_mean':
                    tree[k] = jnp.asarray(
                        rng.standard_normal(v.shape) * 0.1, jnp.float32)
                elif k == 'running_var':
                    tree[k] = jnp.asarray(
                        0.5 + rng.random(v.shape), jnp.float32)
        scramble(state)
    latent, skips = _inputs(rng)

    monkeypatch.setenv('RCFD_PACKED_TAIL', '0')
    ref, _ = dec(params, state, latent, skips, training=False)
    monkeypatch.setenv('RCFD_PACKED_TAIL', '1')
    out, _ = dec(params, state, latent, skips, training=False)

    np.testing.assert_allclose(
        np.asarray(out[-1]), np.asarray(ref[-1]), rtol=2e-5, atol=2e-5)


def test_packed_tail_matches_after_bn_fold(rng, monkeypatch):
    dec = _mk_decoder(True)
    params, state = dec.init(jax.random.PRNGKey(5))
    params, state = fold_batch_norm(params, state)
    latent, skips = _inputs(rng)

    monkeypatch.setenv('RCFD_PACKED_TAIL', '0')
    ref, _ = dec(params, state, latent, skips, training=False)
    monkeypatch.setenv('RCFD_PACKED_TAIL', '1')
    out, _ = dec(params, state, latent, skips, training=False)
    np.testing.assert_allclose(
        np.asarray(out[-1]), np.asarray(ref[-1]), rtol=2e-5, atol=2e-5)


def test_packed_tail_not_used_in_training(rng, monkeypatch):
    """Training must take the live-BN unpacked path (batch stats update)."""
    dec = _mk_decoder(True)
    params, state = dec.init(jax.random.PRNGKey(7))
    latent, skips = _inputs(rng)
    monkeypatch.setenv('RCFD_PACKED_TAIL', '1')
    _, new_state = dec(params, state, latent, skips, training=True)
    nbt0 = state['deconv0']['conv']['batch_norm']['num_batches_tracked']
    nbt1 = new_state['deconv0']['conv']['batch_norm']['num_batches_tracked']
    assert int(nbt1) == int(nbt0) + 1

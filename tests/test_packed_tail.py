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
from rcfd_tpu.nn.perf import PerfConfig, with_perf


def _re(module, **changes):
    """Config-only copy of a module with perf gates toggled (the
    constructor-threaded replacement for the old env-var toggles)."""
    return with_perf(module, module.perf.replace(**changes))


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

    ref, _ = _re(dec, packed_tail=False)(
        params, state, latent, skips, training=False)
    out, _ = _re(dec, packed_tail=True)(
        params, state, latent, skips, training=False)

    np.testing.assert_allclose(
        np.asarray(out[-1]), np.asarray(ref[-1]), rtol=2e-5, atol=2e-5)


def test_packed_tail_matches_after_bn_fold(rng, monkeypatch):
    dec = _mk_decoder(True)
    params, state = dec.init(jax.random.PRNGKey(5))
    params, state = fold_batch_norm(params, state)
    latent, skips = _inputs(rng)

    ref, _ = _re(dec, packed_tail=False)(
        params, state, latent, skips, training=False)
    out, _ = _re(dec, packed_tail=True)(
        params, state, latent, skips, training=False)
    np.testing.assert_allclose(
        np.asarray(out[-1]), np.asarray(ref[-1]), rtol=2e-5, atol=2e-5)


def test_packed_tail_not_used_in_training(rng, monkeypatch):
    """Training must take the live-BN unpacked path (batch stats update)."""
    dec = _mk_decoder(True)
    params, state = dec.init(jax.random.PRNGKey(7))
    latent, skips = _inputs(rng)
    _, new_state = _re(dec, packed_tail=True)(
        params, state, latent, skips, training=True)
    nbt0 = state['deconv0']['conv']['batch_norm']['num_batches_tracked']
    nbt1 = new_state['deconv0']['conv']['batch_norm']['num_batches_tracked']
    assert int(nbt1) == int(nbt0) + 1


@pytest.mark.parametrize('use_bn', [False, True])
def test_packed_decoder_block_matches_unpacked(use_bn, rng):
    """packed_decoder_block == DecoderBlock (up x2, 3x3 convs, skip concat)
    up to float reassociation — the deconv1 fast path."""
    from rcfd_tpu.nn.layers import DecoderBlock
    from rcfd_tpu.ops.packed_tail import packed_decoder_block

    block = DecoderBlock(10, 6, 8, use_batch_norm=use_bn, deconv_type='up')
    params, state = block.init(jax.random.PRNGKey(11))
    if use_bn:
        def scramble(tree):
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
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 10)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((2, 12, 20, 6)), jnp.float32)

    ref, _ = block(params, state, x, skip=skip, training=False)
    out = packed_decoder_block(x, skip, block, params, state)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_packed_deconv1_in_decoder(rng, monkeypatch):
    """The decoder's RCFD_PACKED_DECONV1 gate reproduces the unpacked
    multiscale output (canonical n_resolution=1 walk)."""
    dec = _mk_decoder(True)
    params, state = dec.init(jax.random.PRNGKey(13))
    latent, skips = _inputs(rng)

    ref, _ = _re(dec, packed_deconv1=False)(
        params, state, latent, skips, training=False)
    out, _ = _re(dec, packed_deconv1=True)(
        params, state, latent, skips, training=False)
    np.testing.assert_allclose(
        np.asarray(out[-1]), np.asarray(ref[-1]), rtol=2e-5, atol=2e-5)


def test_packed_deconv1_skipped_when_not_2x(rng, monkeypatch):
    """Odd-sized upsample targets (e.g. 113 -> 225) must fall back to the
    unpacked path and still run correctly."""
    from rcfd_tpu.models.networks import MultiScaleDecoder
    dec = MultiScaleDecoder(
        input_channels=24, output_channels=1, n_resolution=1,
        n_filters=[16, 12, 8, 8, 8], n_skips=[12, 8, 6, 4, 0],
        output_func='linear', use_batch_norm=False, deconv_type='up')
    params, state = dec.init(jax.random.PRNGKey(17))
    latent = jnp.asarray(rng.standard_normal((1, 2, 3, 24)), jnp.float32)
    # deconv1's skip is NOT exactly 2x its input (33 != 2*16)
    skips = [
        jnp.asarray(rng.standard_normal((1, 33, 48, 4)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, 16, 24, 6)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, 8, 12, 8)), jnp.float32),
        jnp.asarray(rng.standard_normal((1, 4, 6, 12)), jnp.float32),
    ]
    out, _ = _re(dec, packed_deconv1=True, packed_tail=False)(
        params, state, latent, skips, training=False)
    assert out[-1].shape[1:3] == (66, 96)


@pytest.mark.parametrize('use_bn,with_skip', [
    (False, True), (True, True), (True, False)])
def test_fast_decoder_block_matches_normal(use_bn, with_skip, rng,
                                           monkeypatch):
    """RCFD_FAST_DECODER (packed up-conv + split post-concat conv) must
    reproduce the normal DecoderBlock output for exact-x2 upsamples."""
    from rcfd_tpu.nn.layers import DecoderBlock

    block = DecoderBlock(10, 6 if with_skip else 0, 8,
                         use_batch_norm=use_bn, deconv_type='up')
    params, state = block.init(jax.random.PRNGKey(19))
    if use_bn:
        def scramble(tree):
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
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 10)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((2, 12, 20, 6)), jnp.float32) \
        if with_skip else None

    ref, _ = _re(block, fast_decoder=False)(
        params, state, x, skip=skip, training=False)
    out, _ = _re(block, fast_decoder=True)(
        params, state, x, skip=skip, training=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fast_decoder_block_not_used_for_odd_resize(rng, monkeypatch):
    """Non-2x targets must take the normal resize path."""
    from rcfd_tpu.nn.layers import DecoderBlock
    block = DecoderBlock(10, 0, 8, use_batch_norm=False, deconv_type='up')
    params, state = block.init(jax.random.PRNGKey(23))
    x = jnp.asarray(rng.standard_normal((1, 6, 10, 10)), jnp.float32)
    y, _ = _re(block, fast_decoder=True)(
        params, state, x, shape=(13, 21), training=False)
    assert y.shape[1:3] == (13, 21)


def test_fast_decoder_block_training_updates_bn(rng, monkeypatch):
    """Training must take the live-BN path even when the gate env is on."""
    from rcfd_tpu.nn.layers import DecoderBlock
    block = DecoderBlock(10, 6, 8, use_batch_norm=True, deconv_type='up')
    params, state = block.init(jax.random.PRNGKey(29))
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 10)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((2, 12, 20, 6)), jnp.float32)
    _, new_state = _re(block, fast_decoder=True)(
        params, state, x, skip=skip, training=True)
    nbt0 = state['conv']['batch_norm']['num_batches_tracked']
    nbt1 = new_state['conv']['batch_norm']['num_batches_tracked']
    assert int(nbt1) == int(nbt0) + 1


def test_split_conv_path_matches_on_odd_resize(rng, monkeypatch):
    """The concat-free post-conv must reproduce the normal block output
    for a non-2x upsample (where the packed-up fast path doesn't apply)."""
    from rcfd_tpu.nn.layers import DecoderBlock
    block = DecoderBlock(10, 6, 8, use_batch_norm=True, deconv_type='up')
    params, state = block.init(jax.random.PRNGKey(31))
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 10)), jnp.float32)
    # 13 != 2*6: odd resize -> normal deconv + split conv2
    skip = jnp.asarray(rng.standard_normal((2, 13, 21, 6)), jnp.float32)

    ref, _ = _re(block, fast_decoder=False)(
        params, state, x, skip=skip, training=False)
    out, _ = _re(block, fast_decoder=True)(
        params, state, x, skip=skip, training=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fast_decoder_block_bf16_within_tolerance(rng, monkeypatch):
    """The fast path must stay within bf16 rounding of the normal path
    when both run in bf16 (the serving dtype)."""
    from rcfd_tpu.nn.core import cast_tree
    from rcfd_tpu.nn.layers import DecoderBlock

    block = DecoderBlock(10, 6, 8, use_batch_norm=False, deconv_type='up')
    params, state = block.init(jax.random.PRNGKey(37))
    params = cast_tree(params, jnp.bfloat16)
    state = cast_tree(state, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 10)), jnp.bfloat16)
    skip = jnp.asarray(rng.standard_normal((2, 12, 20, 6)), jnp.bfloat16)

    ref, _ = _re(block, fast_decoder=False)(
        params, state, x, skip=skip, training=False)
    out, _ = _re(block, fast_decoder=True)(
        params, state, x, skip=skip, training=False)
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    denom = np.maximum(np.abs(ref), 1e-2)
    rel = np.abs(out - ref) / denom
    # two valid bf16 accumulation orderings differ by a few ulps per op;
    # bound the tail and the bulk separately
    assert np.median(rel) < 0.01, np.median(rel)
    assert np.percentile(rel, 99) < 0.06, np.percentile(rel, 99)


def test_int8_tail_approximates_f32(rng, monkeypatch):
    """RCFD_INT8_TAIL=1: the int8-quantized packed tail must track the
    f32 tail within dynamic-quantization error (opt-in fast mode; never
    bit-exact, so only a loose relative tolerance is contractual)."""
    dec = _mk_decoder(False)
    params, state = dec.init(jax.random.PRNGKey(7))
    latent, skips = _inputs(rng)

    ref, _ = _re(dec, packed_tail=True, int8_tail=False)(
        params, state, latent, skips, training=False)
    out, _ = _re(dec, packed_tail=True, int8_tail=True)(
        params, state, latent, skips, training=False)

    ref_l = np.asarray(ref[-1])
    out_l = np.asarray(out[-1])
    scale = np.abs(ref_l).max() + 1e-6
    err = np.abs(out_l - ref_l).max() / scale
    assert err < 0.05, f'int8 tail relative error {err:.4f}'

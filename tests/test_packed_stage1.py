"""ops/packed_stage1.py: the phase-packed stage-1 encoder region must be
an exact (up to f32 reassociation) replacement for the unpacked path —
op-by-op and end-to-end through FusionNetEncoder for all four fusion
types, including the -inf low-edge semantics of the full-res maxpool."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.nn import functional as F
from rcfd_tpu.ops.packed_stage1 import (conv2d_s2d_stem_packed,
                                        max_pool2d_packed,
                                        pack_pointwise_kernel)
from rcfd_tpu.ops.packed_tail import depth_to_space, space_to_depth
from rcfd_tpu.ops.s2d_stem import pack2x2_np


def test_stem_packed_output_exact():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 96, 3)).astype(np.float32)
    w7 = rng.standard_normal((7, 7, 3, 8)).astype(np.float32) * 0.05
    direct = jax.jit(lambda x, w: F.conv2d(x, w, stride=2))(x, w7)
    want = np.asarray(space_to_depth(direct))
    got = np.asarray(jax.jit(conv2d_s2d_stem_packed)(pack2x2_np(x), w7))
    assert got.shape == want.shape == (2, 16, 24, 32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_maxpool_packed_exact_including_edges():
    """All-negative inputs make the -inf (vs zero) low-edge padding
    observable; odd strides make every (shift, phase) tap land."""
    rng = np.random.default_rng(1)
    x = (-1.0 - rng.random((2, 32, 48, 5))).astype(np.float32)
    want = np.asarray(F.max_pool2d(jnp.asarray(x), 3, 2, 1))
    got = np.asarray(jax.jit(
        lambda p: max_pool2d_packed(p, 5))(pack2x2_np(x)))
    np.testing.assert_array_equal(got, want)


def test_stem_packed4_output_exact():
    """4x4-packed input -> 2x2-phase-packed output (3x3 kernel form)."""
    from rcfd_tpu.ops.packed_stage1 import conv2d_s4d_stem_packed
    from rcfd_tpu.ops.s2d_stem import pack_np
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 64, 96, 3)).astype(np.float32)
    w7 = rng.standard_normal((7, 7, 3, 8)).astype(np.float32) * 0.05
    direct = jax.jit(lambda x, w: F.conv2d(x, w, stride=2))(x, w7)
    want = np.asarray(space_to_depth(direct))
    got = np.asarray(jax.jit(conv2d_s4d_stem_packed)(pack_np(x, 4), w7))
    assert got.shape == want.shape == (2, 16, 24, 32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv2d_layer_16x_dispatch_exact():
    """Conv2d(k=7, s=2) fed a 16C input must emit the unpacked full
    output via the 4x4 stem + depth-to-space (training-path contract)."""
    from rcfd_tpu.nn.layers import Conv2d
    from rcfd_tpu.ops.s2d_stem import pack_np
    layer = Conv2d(3, 8, kernel_size=7, stride=2, use_batch_norm=False,
                   activation_func=None)
    p, s = layer.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 32, 48, 3)).astype(np.float32)
    want, _ = layer(p, s, jnp.asarray(x))
    got, _ = layer(p, s, jnp.asarray(pack_np(x, 4)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pointwise_kernel_block_diagonal():
    rng = np.random.default_rng(2)
    w1 = rng.standard_normal((1, 1, 3, 7)).astype(np.float32)
    x = rng.standard_normal((1, 8, 10, 3)).astype(np.float32)
    want = np.asarray(space_to_depth(F.conv2d(jnp.asarray(x), w1, stride=1)))
    got = np.asarray(F.conv2d(jnp.asarray(pack2x2_np(x)),
                              pack_pointwise_kernel(jnp.asarray(w1)),
                              stride=1))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _encoder(fusion_type):
    from rcfd_tpu.models.networks import FusionNetEncoder
    # 'weight' fusion multiplies depth features into the image branch
    # (w * fd + fi), so its per-stage filter counts must match
    n_fd = ([8, 12, 16, 16, 16] if fusion_type == 'weight'
            else [4, 6, 8, 8, 8])
    return FusionNetEncoder(
        n_layer=18, input_channels_image=3, input_channels_depth=2,
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_filters_encoder_depth=n_fd,
        use_batch_norm=True, fusion_type=fusion_type)


@pytest.mark.parametrize('factor', [2, 4])
@pytest.mark.parametrize('fusion_type',
                         ['add', 'weight', 'weight_and_project', 'concat'])
def test_encoder_packed_parity(fusion_type, factor):
    """Packed-input inference must equal the unpacked encoder: latent and
    every skip (BN unfolded — exercises the in-graph eval-mode fold)."""
    from rcfd_tpu.ops.s2d_stem import pack_np
    enc = _encoder(fusion_type)
    params, state = jax.jit(enc.init)(jax.random.PRNGKey(0))
    # BN running stats must be non-trivial for the fold to matter
    state = jax.tree_util.tree_map(
        lambda s: s + 0.3 if s.dtype == jnp.float32 and s.ndim == 1 else s,
        state)
    rng = np.random.default_rng(3)
    image = rng.random((2, 64, 96, 3), np.float32)
    depth = rng.random((2, 64, 96, 2), np.float32)

    latent, skips, _ = jax.jit(
        lambda p, s, i, d: enc(p, s, i, d, training=False))(
        params, state, image, depth)
    latent_p, skips_p, _ = jax.jit(
        lambda p, s, i, d: enc(p, s, i, d, training=False))(
        params, state, pack_np(image, factor), pack_np(depth, factor))

    assert latent_p.shape == latent.shape
    np.testing.assert_allclose(np.asarray(latent_p), np.asarray(latent),
                               rtol=2e-4, atol=1e-5)
    assert len(skips_p) == len(skips)
    for a, b in zip(skips_p, skips):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_encoder_packed_training_falls_back():
    """training=True with packed inputs must use the per-layer dispatch
    (exact, BN batch stats at full res) — same outputs as unpacked."""
    enc = _encoder('weight_and_project')
    params, state = jax.jit(enc.init)(jax.random.PRNGKey(0))
    rng = np.random.default_rng(4)
    image = rng.random((2, 32, 48, 3), np.float32)
    depth = rng.random((2, 32, 48, 2), np.float32)
    latent, _, st = enc(params, state, image, depth, training=True)
    latent_p, _, st_p = enc(params, state, pack2x2_np(image),
                            pack2x2_np(depth), training=True)
    np.testing.assert_allclose(np.asarray(latent_p), np.asarray(latent),
                               rtol=1e-4, atol=1e-5)
    # BN batch statistics must match too (full-res stats either way)
    for a, b in zip(jax.tree_util.tree_leaves(st_p),
                    jax.tree_util.tree_leaves(st)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


class _FakeInferenceDataset:
    """Synthetic integer-transport inference samples (image u8, depth
    u16, response u16) — enough surface for iter_device_batches."""

    def __init__(self, n, h=64, w=96):
        self.n, self.h, self.w = n, h, w

    def __len__(self):
        return self.n

    def get(self, i):
        rng = np.random.default_rng(i)
        return (rng.integers(0, 256, (self.h, self.w, 3), np.uint8),
                rng.integers(0, 80 * 256, (self.h, self.w, 1), np.uint16),
                rng.integers(0, 256, (self.h, self.w, 1), np.uint16))


def test_iter_forward_outputs_pack_s2d_identical():
    """The packed serving path (loader host-pack + packed forward) must
    yield bit-comparable per-frame outputs to the unpacked path."""
    from rcfd_tpu.data.transforms import Transforms
    from rcfd_tpu.fusionnet_main import (iter_forward_outputs,
                                         make_forward_fn)
    from rcfd_tpu.models import FusionNetModel

    model = FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_filters_encoder_depth=[4, 6, 8, 8, 8],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm', n_resolution_decoder=1,
        n_filters_decoder=[16, 12, 8, 8, 8],
        min_predict_depth=1.0, max_predict_depth=100.0)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    forward = make_forward_fn(model, Transforms(
        normalized_image_range=[0, 1]))
    ds = _FakeInferenceDataset(3)

    plain = {i: o for i, _, o in iter_forward_outputs(
        forward, params, state, ds, 2, pack_s2d=False)}
    packed = {i: o for i, _, o in iter_forward_outputs(
        forward, params, state, ds, 2, pack_s2d=True)}
    assert sorted(packed) == sorted(plain) == [0, 1, 2]
    for i in plain:
        np.testing.assert_allclose(packed[i], plain[i],
                                   rtol=2e-4, atol=1e-5)


def test_pack_fields_odd_dims_fall_back():
    """Odd-dimension frames must transfer unpacked (no crash, same
    shapes downstream)."""
    from rcfd_tpu.data.loader import iter_device_batches
    ds = _FakeInferenceDataset(2, h=63, w=96)
    got = list(iter_device_batches(ds, 2, fields=(0, 1, 2),
                                   pack_fields=(0, 1, 2)))
    (idxs, _, device) = got[0]
    assert idxs == [0, 1]
    assert device[0].shape == (2, 63, 96, 3)  # unpacked fallback


def test_depth_to_space_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.random((1, 8, 12, 6), np.float32)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(jnp.asarray(pack2x2_np(x)), 6)), x)


def test_trimmed_fullres_conv_exact():
    """ops/packed_tail.trimmed_fullres_conv: the four per-phase 2x2
    kernels (1.78x FLOPs) must reproduce the stride-1 full-res conv3x3
    on a phase-packed tensor."""
    from rcfd_tpu.ops.packed_tail import trimmed_fullres_conv
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 5)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)).astype(np.float32))
    want = F.conv2d(x, w, stride=1)
    got = depth_to_space(
        jax.jit(trimmed_fullres_conv)(space_to_depth(x), w), 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_decoder_block_skippacked_exact():
    """The packed-skip DecoderBlock must match the plain block (and the
    dense packed_decoder_block) on a packed skip."""
    from rcfd_tpu.nn.layers import DecoderBlock
    from rcfd_tpu.ops.packed_tail import (packed_decoder_block,
                                          packed_decoder_block_skippacked)
    blk = DecoderBlock(6, 4, 8, use_batch_norm=True)
    params, state = blk.init(jax.random.PRNGKey(0))
    state = jax.tree_util.tree_map(
        lambda s: s + 0.3 if s.dtype == jnp.float32 and s.ndim == 1 else s,
        state)
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 6)).astype(np.float32))
    skip = jnp.asarray(rng.standard_normal((2, 24, 32, 4)).astype(np.float32))
    want, _ = blk(params, state, x, skip=skip, training=False)
    dense = packed_decoder_block(x, skip, blk, params, state)
    got = jax.jit(
        lambda x, sp: packed_decoder_block_skippacked(
            x, sp, blk, params, state))(x, space_to_depth(skip))
    np.testing.assert_allclose(np.asarray(dense), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('fusion_type', ['add', 'weight_and_project'])
def test_model_packed_skip_parity(fusion_type):
    """FusionNetModel end to end: PerfConfig(packed_skip=True) on packed
    inputs must equal the default packed path (which equals unpacked —
    covered above). The stage-1 skip rides to deconv1 as a PackedSkip."""
    from rcfd_tpu.models import FusionNetModel
    from rcfd_tpu.nn.perf import PerfConfig
    from rcfd_tpu.ops.s2d_stem import pack_np

    kwargs = dict(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        fusion_type=fusion_type,
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=1,
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_filters_encoder_depth=([8, 12, 16, 16, 16]
                                 if fusion_type == 'weight'
                                 else [4, 6, 8, 8, 8]),
        n_filters_decoder=[16, 12, 8, 8, 8],
        min_predict_depth=1.0, max_predict_depth=100.0)
    base = FusionNetModel(**kwargs)
    packed = FusionNetModel(**kwargs, perf=PerfConfig(packed_skip=True))
    params, state = jax.jit(base.init)(jax.random.PRNGKey(0))
    state = jax.tree_util.tree_map(
        lambda s: s + 0.3 if s.dtype == jnp.float32 and s.ndim == 1 else s,
        state)

    rng = np.random.default_rng(13)
    image = rng.random((2, 64, 96, 3), np.float32)
    depth = rng.random((2, 64, 96, 2), np.float32)
    ip, dp = pack_np(image, 2), pack_np(depth, 2)

    want, _ = jax.jit(lambda p, s, i, d: base.apply(p, s, i, d,
                                                    training=False))(
        params, state, ip, dp)
    got, _ = jax.jit(lambda p, s, i, d: packed.apply(p, s, i, d,
                                                     training=False))(
        params, state, ip, dp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-5)

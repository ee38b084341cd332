"""Network layers and blocks (TPU-native port of the reference primitive set).

Reference: src/net_utils.py. Every class keeps the reference's parameter
naming so state_dicts convert 1:1; all math is NHWC / HWIO jax.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from . import functional as F
from .core import Module, Sequential, init_children


class BatchNorm2d(Module):
    """torch.nn.BatchNorm2d parity: eps 1e-5, momentum 0.1, affine,
    tracked running stats (biased batch var to normalize, unbiased to
    update running_var)."""

    def __init__(self, num_features: int, eps: float = 1e-5, momentum: float = 0.1):
        self.num_features = num_features
        self.eps = eps
        self.momentum = momentum

    def init(self, key):
        params = {
            'weight': jnp.ones((self.num_features,), jnp.float32),
            'bias': jnp.zeros((self.num_features,), jnp.float32),
        }
        state = {
            'running_mean': jnp.zeros((self.num_features,), jnp.float32),
            'running_var': jnp.ones((self.num_features,), jnp.float32),
            'num_batches_tracked': jnp.zeros((), jnp.int32),
        }
        return params, state

    def __call__(self, params, state, x, training=False):
        if training:
            mean, var = F.batch_norm_train_stats(x)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            unbiased_var = var * (n / max(n - 1, 1))
            m = self.momentum
            new_state = {
                'running_mean': (1 - m) * state['running_mean'] + m * mean,
                'running_var': (1 - m) * state['running_var'] + m * unbiased_var,
                'num_batches_tracked': state['num_batches_tracked'] + 1,
            }
            y = F.batch_norm_apply(x, params['weight'], params['bias'], mean, var, self.eps)
            return y, new_state
        else:
            y = F.batch_norm_apply(
                x, params['weight'], params['bias'],
                state['running_mean'], state['running_var'], self.eps)
            return y, state


class Conv2d(Module):
    """Conv (+ optional BN) (+ optional activation). src/net_utils.py:29-91."""

    def __init__(self,
                 in_channels: int,
                 out_channels: int,
                 kernel_size=3,
                 stride=1,
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func=('leaky_relu_default', 0.10),
                 use_batch_norm: bool = False):
        self.in_channels = in_channels
        self.out_channels = out_channels
        # int or (kh, kw): the legacy v0 encoder uses tall 17x3 kernels
        self.kernel_size = kernel_size
        self.stride = stride
        self.weight_initializer = weight_initializer
        self.activation = _resolve_activation(activation_func)
        self.use_batch_norm = use_batch_norm
        self.bn = BatchNorm2d(out_channels) if use_batch_norm else None

    def init(self, key):
        k_conv, k_bn = jax.random.split(key)
        ks = self.kernel_size
        kh, kw = (ks, ks) if isinstance(ks, int) else (ks[0], ks[1])
        shape = (kh, kw, self.in_channels, self.out_channels)
        params = {'conv': {'weight': F.init_conv_weight(k_conv, shape, self.weight_initializer)}}
        state = {}
        if self.bn is not None:
            p, s = self.bn.init(k_bn)
            params['batch_norm'] = p
            state['batch_norm'] = s
        return params, state

    def __call__(self, params, state, x, training=False):
        if (self.kernel_size == 7 and self.stride == 2
                and x.shape[-1] == 4 * self.in_channels
                and x.shape[-1] != self.in_channels):
            # 2x2 space-to-depth packed input (ops/s2d_stem.py): the
            # caller packed the full-res C<=3 frame on the host to dodge
            # the 128-lane padding tax on the stem read (measured 2.1x,
            # docs/PERF.md round-5). Exact rewrite of the 7x7/s2 conv;
            # weights keep their canonical (7,7,C,O) checkpoint shape.
            from ..ops.s2d_stem import conv2d_s2d_stem
            y = conv2d_s2d_stem(x, params['conv']['weight'])
        elif (self.kernel_size == 7 and self.stride == 2
                and x.shape[-1] == 16 * self.in_channels
                and x.shape[-1] != self.in_channels):
            # 4x4-packed input: packed-output stem + depth-to-space (the
            # layer contract stays unpacked; inference fast paths consume
            # the packed form directly via ops/packed_stage1.py)
            from ..ops.packed_stage1 import conv2d_s4d_stem_packed
            from ..ops.packed_tail import depth_to_space
            y = depth_to_space(
                conv2d_s4d_stem_packed(x, params['conv']['weight']),
                self.out_channels)
        else:
            y = F.conv2d(x, params['conv']['weight'], stride=self.stride)
        if 'bias' in params['conv']:  # BN folded into the conv (inference)
            y = y + params['conv']['bias'].astype(y.dtype)
        new_state = state
        if self.bn is not None and 'batch_norm' in params:
            y, bn_state = self.bn(params['batch_norm'], state['batch_norm'], y, training=training)
            new_state = {'batch_norm': bn_state}
        if self.activation is not None:
            y = self.activation(y)
        return y, new_state


class TransposeConv2d(Module):
    """Transpose conv (+ optional BN/activation). src/net_utils.py:94-153."""

    def __init__(self,
                 in_channels: int,
                 out_channels: int,
                 kernel_size: int = 3,
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func=('leaky_relu_default', 0.10),
                 use_batch_norm: bool = False):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.weight_initializer = weight_initializer
        self.activation = _resolve_activation(activation_func)
        self.use_batch_norm = use_batch_norm
        self.bn = BatchNorm2d(out_channels) if use_batch_norm else None

    def init(self, key):
        k_conv, k_bn = jax.random.split(key)
        # torch ConvTranspose2d weight is (in, out, kh, kw); we store HWIO
        # with I=in_channels acting as the contraction dim of the dilated conv.
        shape = (self.kernel_size, self.kernel_size, self.in_channels, self.out_channels)
        # fan_in for torch ConvTranspose default init uses in_channels * k * k
        params = {'deconv': {'weight': F.init_conv_weight(key=k_conv, shape_hwio=shape,
                                                          initializer=self.weight_initializer)}}
        state = {}
        if self.bn is not None:
            p, s = self.bn.init(k_bn)
            params['batch_norm'] = p
            state['batch_norm'] = s
        return params, state

    def __call__(self, params, state, x, training=False):
        y = F.conv_transpose2d(x, params['deconv']['weight'], stride=2,
                               padding=self.kernel_size // 2, output_padding=1)
        if 'bias' in params['deconv']:
            y = y + params['deconv']['bias'].astype(y.dtype)
        new_state = state
        if self.bn is not None and 'batch_norm' in params:
            y, bn_state = self.bn(params['batch_norm'], state['batch_norm'], y, training=training)
            new_state = {'batch_norm': bn_state}
        if self.activation is not None:
            y = self.activation(y)
        return y, new_state


class UpConv2d(Module):
    """Nearest upsample to target shape + conv. src/net_utils.py:156-198."""

    def __init__(self,
                 in_channels: int,
                 out_channels: int,
                 kernel_size: int = 3,
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func=('leaky_relu_default', 0.10),
                 use_batch_norm: bool = False,
                 perf=None):
        from .perf import PerfConfig
        self.perf = perf if perf is not None else PerfConfig.from_env()
        self.conv = Conv2d(
            in_channels, out_channels, kernel_size=kernel_size, stride=1,
            weight_initializer=weight_initializer,
            activation_func=activation_func,
            use_batch_norm=use_batch_norm)

    def init(self, key):
        p, s = self.conv.init(key)
        return {'conv': p}, {'conv': s}

    def __call__(self, params, state, x, shape, training=False):
        conv_p = params['conv']
        # The phase-decomposed path is numerically identical but measured
        # slightly slower than XLA's own upsample+conv fusion on v5e
        # (16.0 vs 17.4 frames/s full-res) — opt-in (PerfConfig
        # fused_upsample / RCFD_FUSED_UPSAMPLE at construction).
        use_fused = self.perf.fused_upsample
        if (use_fused and int(shape[0]) == 2 * x.shape[1]
                and int(shape[1]) == 2 * x.shape[2]
                and self.conv.kernel_size == 3):
            # fused upsample+conv (identical result, 2.25x fewer MACs)
            y = F.upsample2x_conv2d(x, conv_p['conv']['weight'])
            if 'bias' in conv_p['conv']:
                y = y + conv_p['conv']['bias'].astype(y.dtype)
            new_state = state['conv']
            if self.conv.bn is not None and 'batch_norm' in conv_p:
                y, bn_state = self.conv.bn(
                    conv_p['batch_norm'], state['conv']['batch_norm'], y,
                    training=training)
                new_state = {'batch_norm': bn_state}
            if self.conv.activation is not None:
                y = self.conv.activation(y)
            return y, {'conv': new_state}
        up = F.resize_nearest(x, shape)
        y, s = self.conv(conv_p, state['conv'], up, training=training)
        return y, {'conv': s}


class FullyConnected(Module):
    """Linear (+ activation) (+ dropout). src/net_utils.py:201-247.

    Dropout requires an rng; pass ``rng=`` when training with
    dropout_rate > 0.
    """

    def __init__(self,
                 in_features: int,
                 out_features: int,
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func=('leaky_relu_default', 0.10),
                 dropout_rate: float = 0.0):
        self.in_features = in_features
        self.out_features = out_features
        self.weight_initializer = weight_initializer
        self.activation = _resolve_activation(activation_func)
        self.dropout_rate = dropout_rate if 0.0 < dropout_rate <= 1.0 else 0.0

    def init(self, key):
        w, b = F.init_linear(key, self.in_features, self.out_features, self.weight_initializer)
        return {'fully_connected': {'weight': w, 'bias': b}}, {}

    def __call__(self, params, state, x, training=False, rng=None):
        w = params['fully_connected']['weight'].astype(x.dtype)
        b = params['fully_connected']['bias'].astype(x.dtype)
        y = x @ w + b
        if self.activation is not None:
            y = self.activation(y)
        if training and self.dropout_rate > 0.0 and rng is not None:
            keep = jax.random.bernoulli(rng, 1.0 - self.dropout_rate, y.shape)
            y = jnp.where(keep, y / (1.0 - self.dropout_rate), 0.0)
        return y, state


class ResNetBlock(Module):
    """Basic residual block. src/net_utils.py:253-323.

    Note: the reference constructs the 1x1 projection unconditionally (so it
    is always present in checkpoints) but only applies it when the shape
    changes; we replicate both behaviors.
    """

    def __init__(self,
                 in_channels: int,
                 out_channels: int,
                 stride: int = 1,
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func=('leaky_relu_default', 0.10),
                 use_batch_norm: bool = False):
        self.activation = _resolve_activation(activation_func)
        self.use_projection = (stride != 1) or (in_channels != out_channels)
        self.children = {
            'conv1': Conv2d(in_channels, out_channels, 3, stride,
                            weight_initializer, activation_func, use_batch_norm),
            'conv2': Conv2d(out_channels, out_channels, 3, 1,
                            weight_initializer, activation_func, use_batch_norm),
            'projection': Conv2d(in_channels, out_channels, 1, stride,
                                 weight_initializer, None, False),
        }

    def init(self, key):
        return init_children(key, self.children)

    def __call__(self, params, state, x, training=False):
        new_state = dict(state)
        y, new_state['conv1'] = self.children['conv1'](params['conv1'], state['conv1'], x, training=training)
        y, new_state['conv2'] = self.children['conv2'](params['conv2'], state['conv2'], y, training=training)
        if self.use_projection:
            shortcut, new_state['projection'] = self.children['projection'](
                params['projection'], state['projection'], x, training=training)
        else:
            shortcut = x
        return self.activation(y + shortcut), new_state


class ResNetBottleneckBlock(Module):
    """Bottleneck residual block. src/net_utils.py:326-407.

    Faithful to the reference, including its quirk of comparing shortcut
    shape against conv2 (not conv3): the projection to 4*out_channels is
    always applied because channel counts differ."""

    def __init__(self,
                 in_channels: int,
                 out_channels: int,
                 stride: int = 1,
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func=('leaky_relu_default', 0.10),
                 use_batch_norm: bool = False):
        self.activation = _resolve_activation(activation_func)
        # reference compares x.shape vs conv2.shape; projection applies when
        # stride != 1 or in_channels != out_channels; but the residual add is
        # conv3 (4*out) + shortcut, so shapes only work when projected.
        self.use_projection = True
        self.children = {
            'conv1': Conv2d(in_channels, out_channels, 1, 1,
                            weight_initializer, activation_func, use_batch_norm),
            'conv2': Conv2d(out_channels, out_channels, 3, stride,
                            weight_initializer, activation_func, use_batch_norm),
            'conv3': Conv2d(out_channels, 4 * out_channels, 1, 1,
                            weight_initializer, activation_func, use_batch_norm),
            'projection': Conv2d(in_channels, 4 * out_channels, 1, stride,
                                 weight_initializer, None, False),
        }

    def init(self, key):
        return init_children(key, self.children)

    def __call__(self, params, state, x, training=False):
        new_state = dict(state)
        y, new_state['conv1'] = self.children['conv1'](params['conv1'], state['conv1'], x, training=training)
        y, new_state['conv2'] = self.children['conv2'](params['conv2'], state['conv2'], y, training=training)
        y, new_state['conv3'] = self.children['conv3'](params['conv3'], state['conv3'], y, training=training)
        shortcut, new_state['projection'] = self.children['projection'](
            params['projection'], state['projection'], x, training=training)
        return self.activation(y + shortcut), new_state


class VGGNetBlock(Module):
    """n_conv 3x3 convs, last one strided. src/net_utils.py:410-467."""

    def __init__(self,
                 in_channels: int,
                 out_channels: int,
                 n_conv: int = 1,
                 stride: int = 1,
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func=('leaky_relu_default', 0.10),
                 use_batch_norm: bool = False):
        layers = []
        for _ in range(n_conv - 1):
            layers.append(Conv2d(in_channels, out_channels, 3, 1,
                                 weight_initializer, activation_func, use_batch_norm))
            in_channels = out_channels
        layers.append(Conv2d(in_channels, out_channels, 3, stride,
                             weight_initializer, activation_func, use_batch_norm))
        self.conv_block = Sequential(layers)

    def init(self, key):
        p, s = self.conv_block.init(key)
        return {'conv_block': p}, {'conv_block': s}

    def __call__(self, params, state, x, training=False):
        y, s = self.conv_block(params['conv_block'], state['conv_block'], x, training=training)
        return y, {'conv_block': s}


class DecoderBlock(Module):
    """Deconv/upconv + skip concat + conv. src/net_utils.py:473-569."""

    def __init__(self,
                 in_channels: int,
                 skip_channels: int,
                 out_channels: int,
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func=('leaky_relu_default', 0.10),
                 use_batch_norm: bool = False,
                 deconv_type: str = 'up',
                 perf=None):
        from .perf import PerfConfig
        self.perf = perf if perf is not None else PerfConfig.from_env()
        self.skip_channels = skip_channels
        self.deconv_type = deconv_type
        if deconv_type == 'transpose':
            self.deconv = TransposeConv2d(
                in_channels, out_channels, 3, weight_initializer,
                activation_func, use_batch_norm)
        elif deconv_type == 'up':
            self.deconv = UpConv2d(
                in_channels, out_channels, 3, weight_initializer,
                activation_func, use_batch_norm, perf=self.perf)
        else:
            raise ValueError('Unsupported deconv type: {}'.format(deconv_type))
        concat_channels = skip_channels + out_channels
        self.conv = Conv2d(concat_channels, out_channels, 3, 1,
                           weight_initializer, activation_func, use_batch_norm)

    def init(self, key):
        k1, k2 = jax.random.split(key)
        pd, sd = self.deconv.init(k1)
        pc, sc = self.conv.init(k2)
        return {'deconv': pd, 'conv': pc}, {'deconv': sd, 'conv': sc}

    # The fast paths target the per-point PATCH decodes (many small
    # windows: K>=64 x width<=144). On full-frame maps (width 400-800)
    # they are throughput-neutral but RAISE peak temp memory (the split
    # conv pair + depth_to_space relayout), which costs the batch-32
    # FusionNet serving config to OOM — so wide maps keep the proven
    # concat path (perf.fast_max_width, default 256; the fused pipeline
    # re-perfs its FusionNet to the frame width).

    def _split_conv_ok(self, training, out_width: int) -> bool:
        """Gate for the concat-free post-conv (same policy as _fast_up_ok;
        inference only, narrow maps only)."""
        if not self.perf.fast_decoder_enabled():
            return False
        if out_width > self.perf.fast_max_width_resolved():
            return False
        return not training and self.conv.kernel_size == 3

    def _fast_up_ok(self, x, shape, training) -> bool:
        """Inference fast path for exact-x2 'up' blocks: the up-conv runs
        phase-PACKED on the pre-upsample grid (pack_upconv_kernel — same
        FLOPs, full output lanes, no materialized upsample buffer) and the
        post-concat conv is SPLIT by input channels so the concat never
        materializes. Measured on v5e at the serving shapes
        (K=256, 450x144, bf16): 17.3 -> 10.0 ms. Exact up to float
        reassociation. Default on for TPU backends (PerfConfig
        fast_decoder)."""
        if not self.perf.fast_decoder_enabled():
            return False
        if training or self.deconv_type != 'up':
            return False
        if self.deconv.conv.kernel_size != 3 or self.conv.kernel_size != 3:
            return False
        if 2 * x.shape[2] > self.perf.fast_max_width_resolved():
            return False
        return tuple(shape) == (2 * x.shape[1], 2 * x.shape[2])

    def _fast_forward(self, params, state, x, skip):
        from ..ops.packed_tail import (_tile_bias, depth_to_space,
                                       effective_conv, pack_upconv_kernel)
        up_conv = self.deconv.conv
        w_up, b_up = effective_conv(up_conv, params['deconv']['conv'],
                                    state['deconv']['conv'])
        w_mid, b_mid = effective_conv(self.conv, params['conv'],
                                      state['conv'])
        y = F.conv2d(x, pack_upconv_kernel(w_up), stride=1)
        y = y + _tile_bias(b_up).astype(y.dtype)
        if up_conv.activation is not None:
            y = up_conv.activation(y)
        co = w_up.shape[-1]
        y1 = depth_to_space(y, co)
        if self.skip_channels > 0:
            from ..ops.fused_skip import (LazyColumnWindows,
                                          fused_skip_conv_add)
            if isinstance(skip, LazyColumnWindows):
                # pool2->deconv1 fusion: skip-conv once on the global
                # map, gather-add of its windows (fused_skip.py)
                y2 = fused_skip_conv_add(
                    y1, w_mid[:, :, :co], skip, w_mid[:, :, co:],
                    use_pallas=self.perf.fused_pool2_pallas,
                    gather=self.perf.fused_pool2_gather)
            else:
                # conv(concat([y1, skip]), W) == conv(y1, W[:cin_y]) +
                # conv(skip, W[cin_y:]) — the concat never materializes
                y2 = F.conv2d(y1, w_mid[:, :, :co], stride=1) + \
                    F.conv2d(skip, w_mid[:, :, co:], stride=1)
        else:
            y2 = F.conv2d(y1, w_mid, stride=1)
        y2 = y2 + b_mid.astype(y2.dtype)
        if self.conv.activation is not None:
            y2 = self.conv.activation(y2)
        return y2

    def __call__(self, params, state, x, skip=None, shape=None, training=False):
        if self.deconv_type == 'transpose':
            deconv, s_deconv = self.deconv(params['deconv'], state['deconv'], x, training=training)
        else:
            if skip is not None:
                shape = skip.shape[1:3]
            elif shape is not None:
                pass
            else:
                shape = (2 * x.shape[1], 2 * x.shape[2])
            if self._fast_up_ok(x, shape, training):
                y = self._fast_forward(params, state, x, skip)
                return y, {'deconv': state['deconv'], 'conv': state['conv']}
            deconv, s_deconv = self.deconv(params['deconv'], state['deconv'], x,
                                           shape=shape, training=training)
        if self.skip_channels > 0:
            from ..ops.fused_skip import LazyColumnWindows
            if self._split_conv_ok(training, deconv.shape[2]):
                # split path for blocks whose upsample is NOT exact x2
                # (e.g. 112 -> 225): the post-concat conv still avoids
                # materializing the concat (~8% of block time on v5e)
                from ..ops.fused_skip import fused_skip_conv_add
                from ..ops.packed_tail import effective_conv
                w_mid, b_mid = effective_conv(self.conv, params['conv'],
                                              state['conv'])
                co = deconv.shape[-1]
                if isinstance(skip, LazyColumnWindows):
                    y = fused_skip_conv_add(
                        deconv, w_mid[:, :, :co], skip, w_mid[:, :, co:],
                        use_pallas=self.perf.fused_pool2_pallas,
                        gather=self.perf.fused_pool2_gather)
                else:
                    y = F.conv2d(deconv, w_mid[:, :, :co], stride=1) + \
                        F.conv2d(skip, w_mid[:, :, co:], stride=1)
                y = y + b_mid.astype(y.dtype)
                if self.conv.activation is not None:
                    y = self.conv.activation(y)
                return y, {'deconv': s_deconv, 'conv': state['conv']}
            if isinstance(skip, LazyColumnWindows):
                skip = skip.materialize()
            concat = jnp.concatenate([deconv, skip], axis=-1)
        else:
            concat = deconv
        y, s_conv = self.conv(params['conv'], state['conv'], concat, training=training)
        return y, {'deconv': s_deconv, 'conv': s_conv}


def _resolve_activation(activation_func):
    """Accept None, a string, a callable, or ('leaky_relu_default', slope)."""
    if activation_func is None:
        return None
    if isinstance(activation_func, tuple) and activation_func[0] == 'leaky_relu_default':
        slope = activation_func[1]
        return lambda x: F.leaky_relu(x, negative_slope=slope)
    return F.activation_fn(activation_func)

"""Network architectures (TPU-native port of reference src/networks.py).

All modules operate on NHWC tensors, return (output, new_state), and keep
parameter-tree naming 1:1 with the reference's torch state_dicts.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn import functional as F
from ..nn.core import Module, Sequential, init_children
from ..nn.layers import Conv2d, DecoderBlock, FullyConnected, ResNetBlock
from ..ops.roi_pool import roi_pool_column


def _make_layer(n_block, in_channels, out_channels, stride,
                weight_initializer, activation_func, use_batch_norm):
    """Stack of ResNet blocks; first carries the stride
    (src/networks.py:178-230)."""
    blocks = []
    for n in range(n_block):
        if n != 0:
            in_channels = out_channels
            stride = 1
        blocks.append(ResNetBlock(
            in_channels=in_channels,
            out_channels=out_channels,
            stride=stride,
            weight_initializer=weight_initializer,
            activation_func=activation_func,
            use_batch_norm=use_batch_norm))
    return Sequential(blocks)


def _resnet_n_blocks(n_layer: int, n_filters: List[int]) -> List[int]:
    if n_layer == 18:
        n_blocks = [2, 2, 2, 2]
    elif n_layer == 34:
        n_blocks = [3, 4, 6, 3]
    else:
        raise ValueError('Only supports 18, 34 layer architecture')
    for _ in range(len(n_filters) - len(n_blocks) - 1):
        n_blocks = n_blocks + [n_blocks[-1]]
    network_depth = len(n_filters)
    assert network_depth < 8, 'Does not support network depth of 8 or more'
    assert network_depth == len(n_blocks) + 1
    return n_blocks


class ResNetEncoder(Module):
    """ResNet encoder with skip connections (src/networks.py:8-268).

    Stage layout: conv1 (7x7/2) -> maxpool/2 + blocks2 -> blocks3/2 ->
    blocks4/2 -> blocks5/2 [-> blocks6/2 -> blocks7/2].
    forward returns (latent, skips) where skips are every stage output
    except the input and the latent.
    """

    def __init__(self,
                 n_layer: int,
                 input_channels: int = 3,
                 n_filters: List[int] = (32, 64, 128, 256, 256),
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func: str = 'leaky_relu',
                 use_batch_norm: bool = False):
        n_filters = list(n_filters)
        n_blocks = _resnet_n_blocks(n_layer, n_filters)
        act = F.activation_fn(activation_func)

        self.children = {}
        self.children['conv1'] = Conv2d(
            input_channels, n_filters[0], kernel_size=7, stride=2,
            weight_initializer=weight_initializer,
            activation_func=act, use_batch_norm=use_batch_norm)

        strides = [1, 2, 2, 2, 2, 2]
        self.stage_names = []
        for i in range(1, len(n_filters)):
            name = 'blocks{}'.format(i + 1)
            self.children[name] = _make_layer(
                n_block=n_blocks[i - 1],
                in_channels=n_filters[i - 1],
                out_channels=n_filters[i],
                stride=strides[i - 1],
                weight_initializer=weight_initializer,
                activation_func=act,
                use_batch_norm=use_batch_norm)
            self.stage_names.append(name)

    def init(self, key):
        return init_children(key, self.children)

    def __call__(self, params, state, x, training=False):
        new_state = dict(state)
        layers = []
        y, new_state['conv1'] = self.children['conv1'](
            params['conv1'], state['conv1'], x, training=training)
        layers.append(y)
        for i, name in enumerate(self.stage_names):
            if i == 0:
                y = F.max_pool2d(y, kernel_size=3, stride=2, padding=1)
            y, new_state[name] = self.children[name](
                params[name], state[name], y, training=training)
            layers.append(y)
        return layers[-1], layers[:-1], new_state


class FusionNetEncoder(Module):
    """Two-branch (image, depth) encoder with per-scale fusion
    (src/networks.py:270-1005). Fusion types: add, weight,
    weight_and_project, concat."""

    def __init__(self,
                 n_layer: int = 18,
                 input_channels_image: int = 3,
                 input_channels_depth: int = 3,
                 n_filters_encoder_image: List[int] = (32, 64, 128, 256, 256),
                 n_filters_encoder_depth: List[int] = (32, 64, 128, 256, 256),
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func: str = 'leaky_relu',
                 use_batch_norm: bool = False,
                 fusion_type: str = 'add',
                 perf=None):
        from ..nn.perf import PerfConfig
        self.perf = perf if perf is not None else PerfConfig.from_env()
        self.fusion_type = fusion_type
        self.input_channels_image = input_channels_image
        self.input_channels_depth = input_channels_depth
        n_fi = list(n_filters_encoder_image)
        n_fd = list(n_filters_encoder_depth)
        assert len(n_fi) == len(n_fd)
        n_blocks = _resnet_n_blocks(n_layer, n_fi)
        act = F.activation_fn(activation_func)
        self.n_stages = len(n_fi)

        ch: dict = {}
        ch['conv1_image'] = Conv2d(
            input_channels_image, n_fi[0], 7, 2, weight_initializer, act, use_batch_norm)
        ch['conv1_depth'] = Conv2d(
            input_channels_depth, n_fd[0], 7, 2, weight_initializer, act, use_batch_norm)
        self._add_fusion(ch, 1, n_fd[0], n_fi[0], weight_initializer, use_batch_norm)

        strides = [1, 2, 2, 2, 2, 2]
        for i in range(1, len(n_fi)):
            stage = i + 1
            ch['blocks{}_image'.format(stage)] = _make_layer(
                n_blocks[i - 1], n_fi[i - 1], n_fi[i], strides[i - 1],
                weight_initializer, act, use_batch_norm)
            ch['blocks{}_depth'.format(stage)] = _make_layer(
                n_blocks[i - 1], n_fd[i - 1], n_fd[i], strides[i - 1],
                weight_initializer, act, use_batch_norm)
            self._add_fusion(ch, stage, n_fd[i], n_fi[i], weight_initializer, use_batch_norm)

        self.children = ch

    def _add_fusion(self, ch, stage, c_depth, c_image, weight_initializer,
                    use_batch_norm):
        """Per-scale fusion convs (reference builds one set per stage)."""
        if self.fusion_type == 'add':
            ch['conv{}_project'.format(stage)] = Conv2d(
                c_depth, c_image, 1, 1, weight_initializer, None, use_batch_norm)
        elif self.fusion_type == 'weight':
            ch['conv{}_weight'.format(stage)] = Conv2d(
                c_depth, c_depth, 3, 1, weight_initializer, 'sigmoid', use_batch_norm)
        elif self.fusion_type == 'weight_and_project':
            ch['conv{}_weight'.format(stage)] = Conv2d(
                c_depth, c_image, 1, 1, weight_initializer, 'sigmoid', use_batch_norm)
            ch['conv{}_project'.format(stage)] = Conv2d(
                c_depth, c_image, 1, 1, weight_initializer, None, use_batch_norm)
        elif self.fusion_type == 'concat':
            pass
        else:
            raise ValueError('Unsupported fusion type: {}'.format(self.fusion_type))

    def init(self, key):
        return init_children(key, self.children)

    def _fuse(self, params, state, new_state, stage, feat_image, feat_depth,
              training):
        ft = self.fusion_type
        if ft == 'add':
            name = 'conv{}_project'.format(stage)
            proj, new_state[name] = self.children[name](
                params[name], state[name], feat_depth, training=training)
            return proj + feat_image
        elif ft == 'weight':
            name = 'conv{}_weight'.format(stage)
            w, new_state[name] = self.children[name](
                params[name], state[name], feat_depth, training=training)
            return w * feat_depth + feat_image
        elif ft == 'weight_and_project':
            wname = 'conv{}_weight'.format(stage)
            pname = 'conv{}_project'.format(stage)
            w, new_state[wname] = self.children[wname](
                params[wname], state[wname], feat_depth, training=training)
            p, new_state[pname] = self.children[pname](
                params[pname], state[pname], feat_depth, training=training)
            return w * p + feat_image
        elif ft == 'concat':
            # stage 1 concatenates depth-first; later stages image-first
            # (faithful to src/networks.py:868 vs :892 etc.)
            if stage == 1:
                return jnp.concatenate([feat_depth, feat_image], axis=-1)
            return jnp.concatenate([feat_image, feat_depth], axis=-1)
        else:
            raise ValueError('Unsupported fusion type: {}'.format(ft))

    def __call__(self, params, state, image, depth, training=False):
        new_state = dict(state)
        layers = []

        # 2x2 space-to-depth packed inputs (ops/packed_stage1.py): at
        # inference the whole stage-1 region — stems, fusion, maxpool —
        # runs in packed layout so no lane-padded (H/2, W/2, C<=32)
        # buffer is materialized (the top padded-traffic site of the
        # serving roofline, docs/PERF.md round-5). Exact; eval-mode BN is
        # folded per channel in-graph. Training with packed inputs still
        # works through the per-layer Conv2d dispatch (nn/layers.py).
        ci, cd = self.input_channels_image, self.input_channels_depth
        packed = (not training
                  and ((image.shape[-1] == 4 * ci
                        and depth.shape[-1] == 4 * cd
                        and image.shape[1] % 2 == 0
                        and image.shape[2] % 2 == 0)
                       or (image.shape[-1] == 16 * ci
                           and depth.shape[-1] == 16 * cd)))
        if packed:
            from ..ops.packed_stage1 import (max_pool2d_packed,
                                             packed_fusion_stage1)
            from ..ops.packed_tail import depth_to_space
            fused_p, fi_p, fd_p = packed_fusion_stage1(
                self, params, state, image, depth)
            if self.perf.packed_skip:
                # hand the stage-1 skip to the decoder still packed
                # (PerfConfig.packed_skip): deconv1 consumes it with
                # trimmed per-phase kernels and the lane-padded full-res
                # skip buffer is never written (ops/packed_tail.
                # packed_decoder_block_skippacked)
                from ..ops.packed_tail import PackedSkip
                layers.append(PackedSkip(fused_p))
            else:
                # skip handover: the decoder consumes the unpacked skip
                # (its value is bit-identical to the unpacked encoder's)
                layers.append(
                    depth_to_space(fused_p, fused_p.shape[-1] // 4))
            fi = max_pool2d_packed(fi_p, fi_p.shape[-1] // 4)
            fd = max_pool2d_packed(fd_p, fd_p.shape[-1] // 4)
        else:
            fi, new_state['conv1_image'] = self.children['conv1_image'](
                params['conv1_image'], state['conv1_image'], image,
                training=training)
            fd, new_state['conv1_depth'] = self.children['conv1_depth'](
                params['conv1_depth'], state['conv1_depth'], depth,
                training=training)
            layers.append(
                self._fuse(params, state, new_state, 1, fi, fd, training))

        for i in range(1, self.n_stages):
            stage = i + 1
            if i == 1 and not packed:
                fi = F.max_pool2d(fi, 3, 2, 1)
                fd = F.max_pool2d(fd, 3, 2, 1)
            iname = 'blocks{}_image'.format(stage)
            dname = 'blocks{}_depth'.format(stage)
            fi, new_state[iname] = self.children[iname](
                params[iname], state[iname], fi, training=training)
            fd, new_state[dname] = self.children[dname](
                params[dname], state[dname], fd, training=training)
            layers.append(self._fuse(params, state, new_state, stage, fi, fd, training))

        return layers[-1], layers[:-1], new_state


class FullyConnectedEncoder(Module):
    """6-layer MLP point encoder (src/networks.py:1007-1067)."""

    def __init__(self,
                 input_channels: int = 3,
                 n_neurons: List[int] = (32, 64, 96, 128, 256),
                 latent_size: int = 29 * 10,
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func: str = 'leaky_relu'):
        act = F.activation_fn(activation_func)
        dims = [input_channels] + list(n_neurons) + [latent_size]
        layers = [
            FullyConnected(dims[i], dims[i + 1],
                           weight_initializer=weight_initializer,
                           activation_func=act)
            for i in range(len(dims) - 1)
        ]
        self.mlp = Sequential(layers)

    def init(self, key):
        p, s = self.mlp.init(key)
        return {'mlp': p}, {'mlp': s}

    def __call__(self, params, state, x, training=False):
        y, s = self.mlp(params['mlp'], state['mlp'], x, training=training)
        return y, {'mlp': s}


class RadarNetV1Encoder(Module):
    """Image encoder + per-point ROI pooling + MLP point encoder
    (src/networks.py:1151-1256).

    forward(image (B,H,W,3), points (B*K,3), x1 (B,K)) returns the fused
    latent (B*K, h/32, w/32, C_img + C_pt) and per-point pooled skips.
    """

    def __init__(self,
                 input_channels_image: int = 3,
                 input_channels_depth: int = 3,
                 input_patch_size_image: Tuple[int, int] = (900, 288),
                 n_filters_encoder_image: List[int] = (32, 64, 128, 128, 128),
                 n_neurons_encoder_depth: List[int] = (32, 64, 128, 128, 128),
                 latent_size_depth: int = 128 * 28 * 9,
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func: str = 'leaky_relu',
                 use_batch_norm: bool = False,
                 perf=None):
        from ..nn.perf import PerfConfig
        self.perf = perf if perf is not None else PerfConfig.from_env()
        self.n_neuron_latent_depth = list(n_neurons_encoder_depth)[-1]
        self.input_patch_size_image = tuple(input_patch_size_image)
        self.children = {
            'encoder_image': ResNetEncoder(
                n_layer=18,
                input_channels=input_channels_image,
                n_filters=n_filters_encoder_image,
                weight_initializer=weight_initializer,
                activation_func=activation_func,
                use_batch_norm=use_batch_norm),
            'encoder_depth': FullyConnectedEncoder(
                input_channels=input_channels_depth,
                n_neurons=n_neurons_encoder_depth,
                latent_size=latent_size_depth,
                weight_initializer=weight_initializer,
                activation_func=activation_func),
        }

    def init(self, key):
        return init_children(key, self.children)

    def encode_image(self, params, state, image, training=False):
        """Per-image half: the full-frame ResNet encoder (K-independent)."""
        latent_image, skips_image, new_state_img = \
            self.children['encoder_image'](
                params['encoder_image'], state['encoder_image'], image,
                training=training)
        return latent_image, skips_image, new_state_img

    def fuse_points(self, params, state, latent_image, skips_image, points,
                    x1, box_height, training=False):
        """Per-point half: ROI pooling of latent + skips, MLP point
        encoding, bottleneck concat. Chunkable along the point axis."""
        patch_h, patch_w = self.input_patch_size_image
        latent_height = int(patch_h // 32)
        latent_width = int(patch_w // 32)

        skip_scales = [1 / 2., 1 / 4., 1 / 8., 1 / 16., 1 / 32., 1 / 64., 1 / 128.]
        skip_sizes = [
            (int(patch_h * s), int(patch_w * s)) for s in skip_scales
        ]

        pool_kwargs = dict(
            gather_mode=self.perf.pool_window_gather,
            use_pallas_crop=self.perf.pallas_crop)
        latent_pooled = roi_pool_column(
            latent_image, x1, box_width=patch_w, box_y1=0, box_y2=box_height,
            spatial_scale=1 / 32., output_size=(latent_height, latent_width),
            **pool_kwargs)

        # pool2 -> deconv1 fusion: defer the (largest) 1/2-scale pool to a
        # LazyColumnWindows so the decoder can gather windows of
        # conv(G) directly into its skip add (ops/fused_skip.py) instead
        # of materializing K windows + convolving them. Consumers that
        # cannot fuse materialize() — identical values either way.
        # OPT-IN (PerfConfig.fused_pool2): the formulation wins 2x at the
        # op level (8.92 -> 4.27 ms, docs/PERF.md round-3) but measured
        # NEUTRAL-to-SLOWER inside the full model graph, where XLA stops
        # fusing the window gather into the consumer add.
        fuse_pool2 = self.perf.fused_pool2 \
            and not training and skip_sizes[0][1] <= 256
        fuse_pool4 = self.perf.fused_pool4 \
            and not training and skip_sizes[1][1] <= 256

        skips_pooled = []
        for idx, skip in enumerate(skips_image):
            lazy = (fuse_pool2 and idx == 0) or (fuse_pool4 and idx == 1)
            skips_pooled.append(roi_pool_column(
                skip, x1, box_width=patch_w, box_y1=0, box_y2=box_height,
                spatial_scale=skip_scales[idx], output_size=skip_sizes[idx],
                return_global=lazy, **pool_kwargs))

        latent_depth, new_state_depth = self.children['encoder_depth'](
            params['encoder_depth'], state['encoder_depth'], points,
            training=training)
        # torch .view(N, C, -1, W) on a (N, C*h*w) latent is C-major
        latent_depth = latent_depth.reshape(
            points.shape[0], self.n_neuron_latent_depth, -1, latent_width)
        latent_depth = jnp.transpose(latent_depth, (0, 2, 3, 1))  # NHWC

        # mixed precision: the MLP may run f32 (points are pixel
        # coordinates that bf16 would quantize); its output features join
        # the image branch in the image branch's compute dtype
        if latent_depth.dtype != latent_pooled.dtype:
            latent_depth = latent_depth.astype(latent_pooled.dtype)
        latent = jnp.concatenate([latent_pooled, latent_depth], axis=-1)
        return latent, skips_pooled, new_state_depth

    def __call__(self, params, state, image, points, x1, box_height=None,
                 training=False):
        """
        Arg(s):
            image : (B, H, W, 3)
            points : (B*K, 3) radar points (x, y, z)
            x1 : (B, K) left edges of the per-point column boxes
            box_height : static box height; defaults to the image height
                (training boxes use patch_size[0], validation boxes use the
                image height — identical when the patch spans full height)
        """
        new_state = dict(state)
        if box_height is None:
            box_height = image.shape[1]

        latent_image, skips_image, new_state['encoder_image'] = \
            self.encode_image(params, state, image, training=training)
        latent, skips_pooled, new_state['encoder_depth'] = self.fuse_points(
            params, state, latent_image, skips_image, points, x1,
            box_height, training=training)
        return latent, skips_pooled, new_state


class ResNetBasedEncoder(Module):
    """Twin ResNet encoders with concat fusion (src/networks.py:1259-1331)."""

    def __init__(self,
                 n_layer: int,
                 input_channels_image: int = 3,
                 input_channels_depth: int = 1,
                 n_filters_image: List[int] = (48, 96, 192, 384, 384),
                 n_filters_depth: List[int] = (16, 32, 64, 128, 128),
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func: str = 'leaky_relu',
                 use_batch_norm: bool = False):
        self.children = {
            'encoder_image': ResNetEncoder(
                18, input_channels_image, n_filters_image,
                weight_initializer, activation_func, use_batch_norm),
            'encoder_depth': ResNetEncoder(
                18, input_channels_depth, n_filters_depth,
                weight_initializer, activation_func, use_batch_norm),
        }

    def init(self, key):
        return init_children(key, self.children)

    def __call__(self, params, state, image, depth, training=False):
        new_state = dict(state)
        li, si, new_state['encoder_image'] = self.children['encoder_image'](
            params['encoder_image'], state['encoder_image'], image, training=training)
        ld, sd, new_state['encoder_depth'] = self.children['encoder_depth'](
            params['encoder_depth'], state['encoder_depth'], depth, training=training)
        latent = jnp.concatenate([li, ld], axis=-1)
        skips = [jnp.concatenate([a, b], axis=-1) for a, b in zip(si, sd)]
        return latent, skips, new_state


class MultiScaleDecoder(Module):
    """Multi-scale decoder with skip connections (src/networks.py:1337-1657)."""

    def __init__(self,
                 input_channels: int = 256,
                 output_channels: int = 1,
                 n_resolution: int = 1,
                 n_filters: List[int] = (256, 128, 64, 32, 16),
                 n_skips: List[int] = (256, 128, 64, 32, 0),
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func: str = 'leaky_relu',
                 output_func: str = 'linear',
                 use_batch_norm: bool = False,
                 deconv_type: str = 'up',
                 perf=None):
        from ..nn.perf import PerfConfig
        self.perf = perf if perf is not None else PerfConfig.from_env()
        n_filters = list(n_filters)
        n_skips = list(n_skips)
        network_depth = len(n_filters)
        assert network_depth < 8, 'Does not support network depth of 8 or more'
        assert 0 < n_resolution < network_depth

        self.n_resolution = n_resolution
        self.output_func = output_func
        self.network_depth = network_depth
        self.deconv_type = deconv_type
        act = F.activation_fn(activation_func)
        out_act = F.activation_fn(output_func)

        if 'upsample' in self.output_func and self.n_resolution < 2:
            self.n_resolution = 2

        ch: dict = {}
        filter_idx = 0
        in_ch, skip_ch, out_ch = (
            input_channels, n_skips[filter_idx], n_filters[filter_idx])

        self.has_deconv6 = network_depth > 6
        if self.has_deconv6:
            ch['deconv6'] = DecoderBlock(
                in_ch, skip_ch, out_ch, weight_initializer, act,
                use_batch_norm, deconv_type, perf=self.perf)
            filter_idx += 1
            in_ch, skip_ch, out_ch = (
                n_filters[filter_idx - 1], n_skips[filter_idx], n_filters[filter_idx])

        self.has_deconv5 = network_depth > 5
        if self.has_deconv5:
            ch['deconv5'] = DecoderBlock(
                in_ch, skip_ch, out_ch, weight_initializer, act,
                use_batch_norm, deconv_type, perf=self.perf)
            filter_idx += 1
            in_ch, skip_ch, out_ch = (
                n_filters[filter_idx - 1], n_skips[filter_idx], n_filters[filter_idx])

        ch['deconv4'] = DecoderBlock(
            in_ch, skip_ch, out_ch, weight_initializer, act,
            use_batch_norm, deconv_type, perf=self.perf)

        filter_idx += 1
        in_ch, skip_ch, out_ch = (
            n_filters[filter_idx - 1], n_skips[filter_idx], n_filters[filter_idx])
        ch['deconv3'] = DecoderBlock(
            in_ch, skip_ch, out_ch, weight_initializer, act,
            use_batch_norm, deconv_type, perf=self.perf)
        if self.n_resolution > 3:
            ch['output3'] = Conv2d(out_ch, output_channels, 3, 1,
                                   weight_initializer, out_act, False)

        filter_idx += 1
        in_ch, skip_ch, out_ch = (
            n_filters[filter_idx - 1], n_skips[filter_idx], n_filters[filter_idx])
        if self.n_resolution > 3:
            skip_ch = skip_ch + output_channels
        ch['deconv2'] = DecoderBlock(
            in_ch, skip_ch, out_ch, weight_initializer, act,
            use_batch_norm, deconv_type, perf=self.perf)
        if self.n_resolution > 2:
            ch['output2'] = Conv2d(out_ch, output_channels, 3, 1,
                                   weight_initializer, out_act, False)

        filter_idx += 1
        in_ch, skip_ch, out_ch = (
            n_filters[filter_idx - 1], n_skips[filter_idx], n_filters[filter_idx])
        if self.n_resolution > 2:
            skip_ch = skip_ch + output_channels
        ch['deconv1'] = DecoderBlock(
            in_ch, skip_ch, out_ch, weight_initializer, act,
            use_batch_norm, deconv_type, perf=self.perf)
        if self.n_resolution > 1:
            ch['output1'] = Conv2d(out_ch, output_channels, 3, 1,
                                   weight_initializer, out_act, False)

        filter_idx += 1
        in_ch, skip_ch, out_ch = (
            n_filters[filter_idx - 1], n_skips[filter_idx], n_filters[filter_idx])
        if self.n_resolution > 1:
            skip_ch = skip_ch + output_channels
        self.deconv0_skip_channels = skip_ch
        ch['deconv0'] = DecoderBlock(
            in_ch, skip_ch, out_ch, weight_initializer, act,
            use_batch_norm, deconv_type, perf=self.perf)
        ch['output0'] = Conv2d(out_ch, output_channels, 3, 1,
                               weight_initializer, out_act, False)

        self.children = ch

    def init(self, key):
        return init_children(key, self.children)

    def __call__(self, params, state, x, skips, shape=None, training=False):
        new_state = dict(state)
        layers = [x]
        outputs = []
        n = len(skips) - 1

        def run(name, inp, skip=None, out_shape=None):
            y, s = self.children[name](
                params[name], state[name], inp, skip=skip, shape=out_shape,
                training=training)
            new_state[name] = s
            return y

        def run_conv(name, inp):
            y, s = self.children[name](params[name], state[name], inp,
                                       training=training)
            new_state[name] = s
            return y

        if self.has_deconv6:
            layers.append(run('deconv6', layers[-1], skip=skips[n]))
            n -= 1
        if self.has_deconv5:
            layers.append(run('deconv5', layers[-1], skip=skips[n]))
            n -= 1

        layers.append(run('deconv4', layers[-1], skip=skips[n]))

        n -= 1
        layers.append(run('deconv3', layers[-1], skip=skips[n]))

        upsample_output3 = upsample_output2 = upsample_output1 = None
        if self.n_resolution > 3:
            outputs.append(run_conv('output3', layers[-1]))
            h, w = outputs[-1].shape[1:3]
            upsample_output3 = F.resize_bilinear_align_corners(
                outputs[-1], (2 * h, 2 * w))

        def _concat_skip(sk, up):
            # decoder-level concats need materialized windows
            from ..ops.fused_skip import LazyColumnWindows
            if isinstance(sk, LazyColumnWindows):
                sk = sk.materialize()
            return jnp.concatenate([sk, up], axis=-1)

        n -= 1
        skip = (_concat_skip(skips[n], upsample_output3)
                if self.n_resolution > 3 else skips[n])
        layers.append(run('deconv2', layers[-1], skip=skip))

        if self.n_resolution > 2:
            outputs.append(run_conv('output2', layers[-1]))
            h, w = outputs[-1].shape[1:3]
            upsample_output2 = F.resize_bilinear_align_corners(
                outputs[-1], (2 * h, 2 * w))

        n -= 1
        skip = skips[n]
        from ..ops.packed_tail import PackedSkip
        if isinstance(skip, PackedSkip):
            # stage-1 skip delivered packed (PerfConfig.packed_skip):
            # consume it without ever writing the lane-padded full-res
            # buffer when the block qualifies; otherwise unpack and fall
            # through to the standard paths
            if self._packed_skip_ok(layers[-1], skip, training):
                from ..ops.packed_tail import packed_decoder_block_skippacked
                layers.append(packed_decoder_block_skippacked(
                    layers[-1], skip.packed, self.children['deconv1'],
                    params['deconv1'], state['deconv1']))
                new_state['deconv1'] = state['deconv1']
                skip = None
            else:
                from ..ops.packed_tail import depth_to_space
                skip = depth_to_space(skip.packed, skip.packed.shape[-1] // 4)
        if skip is not None:
            skip = (_concat_skip(skip, upsample_output2)
                    if self.n_resolution > 2 else skip)
            if self._packed_deconv1_ok(layers[-1], skip, training):
                from ..ops.packed_tail import packed_decoder_block
                layers.append(packed_decoder_block(
                    layers[-1], skip, self.children['deconv1'],
                    params['deconv1'], state['deconv1']))
                new_state['deconv1'] = state['deconv1']
            else:
                layers.append(run('deconv1', layers[-1], skip=skip))

        if self.n_resolution > 1:
            outputs.append(run_conv('output1', layers[-1]))
            h, w = outputs[-1].shape[1:3]
            upsample_output1 = F.resize_bilinear_align_corners(
                outputs[-1], (2 * h, 2 * w))

        n -= 1
        if 'upsample' in self.output_func:
            output0 = upsample_output1
        else:
            if self.n_resolution > 1:
                skip = (_concat_skip(skips[n], upsample_output1)
                        if n == 0 else upsample_output1)
                layers.append(run('deconv0', layers[-1], skip=skip))
                output0 = run_conv('output0', layers[-1])
            else:
                if n == 0:
                    target = skips[n].shape[1:3]
                else:
                    target = tuple(shape[-2:]) if shape is not None else \
                        (2 * layers[-1].shape[1], 2 * layers[-1].shape[2])
                if self._packed_tail_ok(layers[-1], target, training):
                    if self.perf.int8_tail:
                        # opt-in int8 fast mode (approximate — breaks
                        # 14-bit response parity; docs/PERF.md)
                        from ..ops.packed_tail import \
                            packed_decoder_tail_int8 as packed_decoder_tail
                    else:
                        from ..ops.packed_tail import packed_decoder_tail
                    output0 = packed_decoder_tail(
                        layers[-1], self.children['deconv0'],
                        self.children['output0'], params, state)
                    new_state['deconv0'] = state['deconv0']
                    new_state['output0'] = state['output0']
                else:
                    if n == 0:
                        layers.append(run('deconv0', layers[-1],
                                          skip=skips[n]))
                    else:
                        layers.append(run(
                            'deconv0', layers[-1],
                            out_shape=shape[-2:] if shape is not None
                            else None))
                    output0 = run_conv('output0', layers[-1])

        outputs.append(output0)
        return outputs, new_state

    def _packed_skip_ok(self, x, skip, training) -> bool:
        """packed_decoder_block_skippacked applies when deconv1
        nearest-upsamples exactly x2 onto the packed skip's (full-res)
        grid — i.e. the packed spatial dims equal x's — at inference
        with 'up' deconv and no side-output concat into this skip
        (n_resolution <= 2; side outputs land on full-res grids)."""
        if training or self.deconv_type != 'up' or self.n_resolution > 2:
            return False
        return tuple(skip.packed.shape[1:3]) == tuple(x.shape[1:3])

    def _packed_deconv1_ok(self, x, skip, training) -> bool:
        """The phase-packed deconv1 (ops/packed_tail.packed_decoder_block)
        applies when the block nearest-upsamples exactly x2 onto the skip's
        grid (true for the canonical patch/frame geometries; deconv2's
        113 -> 225 style odd resizes do not qualify). Inference only.

        MEASURED SLOWER on v5e (15.3 vs 10.0 ms at K=64 RadarNet shapes):
        the 4x-dense packed-packed conv does not pay off — XLA's unpacked
        path runs above the ~25% utilization break-even. Kept as a tested
        opt-in (PerfConfig.packed_deconv1), like fused_upsample."""
        if not self.perf.packed_deconv1:
            return False
        from ..ops.fused_skip import LazyColumnWindows
        if isinstance(skip, LazyColumnWindows):
            return False
        if training or self.deconv_type != 'up':
            return False
        return tuple(skip.shape[1:3]) == (2 * x.shape[1], 2 * x.shape[2])

    def _packed_tail_ok(self, x, target, training) -> bool:
        """The phase-packed tail (ops/packed_tail.py) applies to the
        canonical inference tail: 'up' deconv0 without a skip concat,
        3x3 output conv, exact x2 upsample to even dims."""
        if not self.perf.packed_tail:
            return False
        if training or self.deconv_type != 'up':
            return False
        if self.children['deconv0'].skip_channels != 0:
            return False
        if self.children['output0'].kernel_size != 3 or \
                self.children['output0'].stride != 1:
            return False
        return tuple(target) == (2 * x.shape[1], 2 * x.shape[2])

"""Legacy v0 pipeline capabilities (reference src/models.py, src/losses.py,
src/transforms.py, setup/data_gen_*.py).

The v0 pipeline is superseded in the reference by the radarnet_*/
fusionnet_* stack, and is in fact BROKEN in the reference tree: its
models.py passes list-valued kernel sizes into the current net_utils.Conv2d
(src/models.py:58-63), which computes `kernel_size // 2` and raises
TypeError. We still provide its distinctive capabilities in working form:

- rectangular (17x3) conv kernels (supported natively by our Conv2d)
- the v0 FusionNet: tall-kernel ResNet encoder + BN MLP radar branch +
  VOICED-style decoder + the logit-bias trick (src/models.py:340-372)
- LoG (Laplacian-of-Gaussian) kernels (src/losses.py:7-16)
- the point-centered crop transform (src/transforms.py:60-130)
- brute-force point registration (the KD-tree radius query of
  setup/data_gen_train.py:733-873 — point counts are O(100), so a dense
  distance matrix is the TPU-native form)
- 3-class correspondence labels (0 no-match / 1 match / 2 invalid,
  setup/data_gen_train.py:1136-1183)
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import functional as F
from ..nn.core import Module, Sequential, init_children
from ..nn.layers import Conv2d, DecoderBlock, UpConv2d


# ---------------------------------------------------------------------------
# v0 network
# ---------------------------------------------------------------------------

class LegacyResNetBlock(Module):
    """Basic residual block with rectangular kernels / per-dim strides (the
    variant the legacy models.py expects)."""

    def __init__(self, in_channels, out_channels, kernel_size=(17, 3),
                 stride=(1, 1), weight_initializer='kaiming_uniform',
                 activation_func='leaky_relu', use_batch_norm=False):
        act = F.activation_fn(activation_func) \
            if isinstance(activation_func, str) else activation_func
        self.activation = act
        self.use_projection = (tuple(stride) != (1, 1)) or \
            (in_channels != out_channels)
        self.children = {
            'conv1': Conv2d(in_channels, out_channels, tuple(kernel_size),
                            tuple(stride), weight_initializer, act,
                            use_batch_norm),
            'conv2': Conv2d(out_channels, out_channels, tuple(kernel_size),
                            (1, 1), weight_initializer, act, use_batch_norm),
            'projection': Conv2d(in_channels, out_channels, 1, tuple(stride),
                                 weight_initializer, None, False),
        }

    def init(self, key):
        return init_children(key, self.children)

    def __call__(self, params, state, x, training=False):
        new_state = dict(state)
        y, new_state['conv1'] = self.children['conv1'](
            params['conv1'], state['conv1'], x, training=training)
        y, new_state['conv2'] = self.children['conv2'](
            params['conv2'], state['conv2'], y, training=training)
        if self.use_projection:
            shortcut, new_state['projection'] = self.children['projection'](
                params['projection'], state['projection'], x, training=training)
        else:
            shortcut = x
        return self.activation(y + shortcut), new_state


class LegacyResNetEncoder(Module):
    """5-stage encoder with tall 17x3 kernels, every stage stride (2, 2)
    (src/models.py:10-179)."""

    def __init__(self, input_channels=3,
                 n_filters=(32, 64, 128, 128, 128),
                 weight_initializer='kaiming_uniform',
                 activation_func='leaky_relu', use_batch_norm=True):
        act = F.activation_fn(activation_func)
        n_filters = list(n_filters)
        self.children = {
            'conv1': Conv2d(input_channels, n_filters[0], (17, 3), (2, 2),
                            weight_initializer, act, use_batch_norm),
        }
        n_blocks = [2, 2, 2, 2]
        for i in range(4):
            blocks = []
            in_ch = n_filters[i]
            out_ch = n_filters[i + 1]
            for n in range(n_blocks[i]):
                blocks.append(LegacyResNetBlock(
                    in_ch if n == 0 else out_ch, out_ch, (17, 3),
                    (2, 2) if n == 0 else (1, 1),
                    weight_initializer, act, use_batch_norm))
            self.children['blocks{}'.format(i + 2)] = Sequential(blocks)

    def init(self, key):
        return init_children(key, self.children)

    def __call__(self, params, state, x, training=False):
        new_state = dict(state)
        layers = []
        y, new_state['conv1'] = self.children['conv1'](
            params['conv1'], state['conv1'], x, training=training)
        layers.append(y)
        for i in range(2, 6):
            name = 'blocks{}'.format(i)
            y, new_state[name] = self.children[name](
                params[name], state[name], y, training=training)
            layers.append(y)
        return layers[-1], layers[:-1], new_state


class BatchNorm1d(Module):
    """Feature batch norm for the MLP radar branch (src/models.py:190-199)."""

    def __init__(self, num_features):
        self.num_features = num_features

    def init(self, key):
        params = {'weight': jnp.ones((self.num_features,), jnp.float32),
                  'bias': jnp.zeros((self.num_features,), jnp.float32)}
        state = {'running_mean': jnp.zeros((self.num_features,), jnp.float32),
                 'running_var': jnp.ones((self.num_features,), jnp.float32),
                 'num_batches_tracked': jnp.zeros((), jnp.int32)}
        return params, state

    def __call__(self, params, state, x, training=False):
        if training:
            mean = jnp.mean(x, axis=0)
            var = jnp.mean(jnp.square(x), axis=0) - jnp.square(mean)
            n = x.shape[0]
            new_state = {
                'running_mean': 0.9 * state['running_mean'] + 0.1 * mean,
                'running_var': 0.9 * state['running_var'] +
                0.1 * var * (n / max(n - 1, 1)),
                'num_batches_tracked': state['num_batches_tracked'] + 1,
            }
        else:
            mean, var = state['running_mean'], state['running_var']
            new_state = state
        inv = jax.lax.rsqrt(var + 1e-5)
        return (x - mean) * inv * params['weight'] + params['bias'], new_state


class LegacyRadarBranch(Module):
    """Linear+BN1d+leaky MLP (src/models.py:181-205)."""

    def __init__(self, n_filters=(32, 64, 128, 128), n_outputs=29 * 10,
                 radar_input_dim=3):
        from ..nn.layers import FullyConnected
        dims = [radar_input_dim] + list(n_filters[:-1]) + \
            [n_filters[-1] * n_outputs]
        self.linears = [
            FullyConnected(dims[i], dims[i + 1], activation_func=None)
            for i in range(len(dims) - 1)
        ]
        self.bns = [BatchNorm1d(dims[i + 1]) for i in range(len(dims) - 1)]

    def init(self, key):
        params, state = {}, {}
        keys = jax.random.split(key, 2 * len(self.linears))
        for i, (lin, bn) in enumerate(zip(self.linears, self.bns)):
            p, s = lin.init(keys[2 * i])
            params['linear{}'.format(i)] = p
            state['linear{}'.format(i)] = s
            p, s = bn.init(keys[2 * i + 1])
            params['bn{}'.format(i)] = p
            state['bn{}'.format(i)] = s
        return params, state

    def __call__(self, params, state, x, training=False):
        new_state = dict(state)
        for i, (lin, bn) in enumerate(zip(self.linears, self.bns)):
            x, new_state['linear{}'.format(i)] = lin(
                params['linear{}'.format(i)], state['linear{}'.format(i)], x,
                training=training)
            x, new_state['bn{}'.format(i)] = bn(
                params['bn{}'.format(i)], state['bn{}'.format(i)], x,
                training=training)
            x = F.leaky_relu(x, 0.1)
        return x, new_state


class LegacyVOICEDDecoder(Module):
    """4-stage decoder; final output at 1/2 scale upsampled x2 nearest
    (src/models.py:208-337)."""

    def __init__(self, input_channels=256, output_channels=1,
                 n_filters=(256, 128, 64, 32), n_skips=(128, 128, 64, 32),
                 weight_initializer='kaiming_uniform',
                 activation_func='leaky_relu', output_func='linear',
                 use_batch_norm=True):
        act = F.activation_fn(activation_func)
        out_act = F.activation_fn(output_func)
        n_filters = list(n_filters)
        n_skips = list(n_skips)
        self.children = {
            'deconv4': DecoderBlock(input_channels, n_skips[0], n_filters[0],
                                    weight_initializer, act, use_batch_norm,
                                    'up'),
            'deconv3': DecoderBlock(n_filters[0], n_skips[1], n_filters[1],
                                    weight_initializer, act, use_batch_norm,
                                    'up'),
            'deconv2': DecoderBlock(n_filters[1], n_skips[2], n_filters[2],
                                    weight_initializer, act, use_batch_norm,
                                    'up'),
            'deconv1': UpConv2d(n_filters[2], n_filters[3], 3,
                                weight_initializer, act, use_batch_norm),
            'output1': Conv2d(n_skips[3] + n_filters[3], output_channels, 3,
                              1, weight_initializer, out_act, False),
        }

    def init(self, key):
        return init_children(key, self.children)

    def __call__(self, params, state, x, skips, training=False):
        new_state = dict(state)
        n = len(skips) - 1
        y, new_state['deconv4'] = self.children['deconv4'](
            params['deconv4'], state['deconv4'], x, skip=skips[n],
            training=training)
        n -= 1
        y, new_state['deconv3'] = self.children['deconv3'](
            params['deconv3'], state['deconv3'], y, skip=skips[n],
            training=training)
        n -= 1
        y, new_state['deconv2'] = self.children['deconv2'](
            params['deconv2'], state['deconv2'], y, skip=skips[n],
            training=training)
        n -= 1
        y, new_state['deconv1'] = self.children['deconv1'](
            params['deconv1'], state['deconv1'], y,
            shape=skips[n].shape[1:3], training=training)
        concat = jnp.concatenate([y, skips[n]], axis=-1)
        out, new_state['output1'] = self.children['output1'](
            params['output1'], state['output1'], concat, training=training)
        h, w = out.shape[1:3]
        return F.resize_nearest(out, (2 * h, 2 * w)), new_state


class LegacyFusionNet(Module):
    """v0 FusionNet: per-point correspondence logits at 1/1 resolution with
    the logit-bias trick (src/models.py:340-372)."""

    def __init__(self, bias_factor: float = 0.0, radar_input_dim: int = 3,
                 latent_hw: Tuple[int, int] = (29, 10)):
        self.bias_factor = bias_factor
        self.latent_hw = tuple(latent_hw)
        self.children = {
            'image_encoder': LegacyResNetEncoder(
                input_channels=3, n_filters=(32, 64, 128, 128, 128),
                use_batch_norm=True),
            'radar_branch': LegacyRadarBranch(
                n_filters=(32, 64, 128, 128),
                n_outputs=latent_hw[0] * latent_hw[1],
                radar_input_dim=radar_input_dim),
            'decoder': LegacyVOICEDDecoder(
                input_channels=256, output_channels=1,
                n_filters=(256, 128, 64, 32), n_skips=(128, 128, 64, 32),
                use_batch_norm=True),
        }

    def init(self, key):
        return init_children(key, self.children)

    def __call__(self, params, state, image, radar, training=False):
        new_state = dict(state)
        latent, skips, new_state['image_encoder'] = \
            self.children['image_encoder'](
                params['image_encoder'], state['image_encoder'], image,
                training=training)
        rfeat, new_state['radar_branch'] = self.children['radar_branch'](
            params['radar_branch'], state['radar_branch'], radar,
            training=training)
        h, w = self.latent_hw
        rfeat = rfeat.reshape(radar.shape[0], 128, h, w)
        rfeat = jnp.transpose(rfeat, (0, 2, 3, 1))
        merged = jnp.concatenate([latent, rfeat], axis=-1)
        logits, new_state['decoder'] = self.children['decoder'](
            params['decoder'], state['decoder'], merged, skips,
            training=training)
        return logits - self.bias_factor, new_state


# ---------------------------------------------------------------------------
# LoG kernels (src/losses.py:7-16)
# ---------------------------------------------------------------------------

def log_kernel(sigma: float, x, y):
    """Laplacian of Gaussian at (x, y)."""
    r2 = x ** 2 + y ** 2
    return (-1.0 / (math.pi * sigma ** 4) * (1 - r2 / (2 * sigma ** 2)) *
            np.exp(-r2 / (2 * sigma ** 2)))


def log_kernel_discrete(sigma: float, n: int) -> np.ndarray:
    """n x n discrete LoG filter."""
    idx = np.arange(n) - (n - 1) / 2
    xx, yy = np.meshgrid(idx, idx, indexing='ij')
    return log_kernel(sigma, xx, yy).astype(np.float32)


# ---------------------------------------------------------------------------
# Point-centered crop transform (src/transforms.py:60-130)
# ---------------------------------------------------------------------------

def crop_image_to_shape_on_point(points, images, labels, crop_height: int,
                                 crop_width: int, label_fill: float = 2.0):
    """Per-sample point-centered crops: pad width by w//2 (edge for images,
    `label_fill` — the 'invalid' class — for labels), crop the bottom
    crop_height rows and the crop_width-wide window at the point's column,
    then reset the point x to the patch center.

    Arg(s): points (B, 3); images (B, H, W, C); labels (B, H, W, c)
    Returns (points', image_crops (B, crop_h, crop_w, C), label_crops)
    """
    pad = crop_width // 2
    points = jnp.asarray(points)
    x_shift = points[:, 0] + pad
    points = points.at[:, 0].set(x_shift)

    images_p = jnp.pad(images, ((0, 0), (0, 0), (pad, pad), (0, 0)),
                       mode='edge')
    labels_p = jnp.pad(labels, ((0, 0), (0, 0), (pad, pad), (0, 0)),
                       mode='constant', constant_values=label_fill)
    crop_top = images_p.shape[1] - crop_height

    def crop_one(x, img, lab):
        start = x.astype(jnp.int32) - pad
        img_c = jax.lax.dynamic_slice(
            img, (crop_top, start, 0),
            (crop_height, crop_width, img.shape[-1]))
        lab_c = jax.lax.dynamic_slice(
            lab, (crop_top, start, 0),
            (crop_height, crop_width, lab.shape[-1]))
        return img_c, lab_c

    image_crops, label_crops = jax.vmap(crop_one)(x_shift, images_p, labels_p)
    points = points.at[:, 0].set(pad)
    return points, image_crops, label_crops


# ---------------------------------------------------------------------------
# Point registration (setup/data_gen_train.py:733-873)
# ---------------------------------------------------------------------------

def register_points(lidar_x, lidar_z, radar_x, radar_z,
                    radius: float = 0.4, z_scaling_factor: float = 0.6):
    """Radar->lidar correspondence by radius query in (x, scaled z) space.

    The reference builds a sklearn KDTree over ~hundreds of points; the
    TPU-native form is one dense distance matrix. Returns, per radar point,
    the index of the nearest lidar point within `radius` (or -1) and the
    distance (inf when none).
    """
    lidar_feat = jnp.stack(
        [jnp.asarray(lidar_x), jnp.asarray(lidar_z) * z_scaling_factor],
        axis=1)
    radar_feat = jnp.stack(
        [jnp.asarray(radar_x), jnp.asarray(radar_z) * z_scaling_factor],
        axis=1)
    d2 = jnp.sum(
        (radar_feat[:, None, :] - lidar_feat[None, :, :]) ** 2, axis=-1)
    d = jnp.sqrt(d2)
    nearest = jnp.argmin(d, axis=1)
    nearest_d = jnp.min(d, axis=1)
    matched = nearest_d <= radius
    return jnp.where(matched, nearest, -1), \
        jnp.where(matched, nearest_d, jnp.inf)


def three_class_labels(ground_truth_depth, radar_z,
                       max_distance_correspondence: float = 0.4,
                       invalid_fill: float = 2.0):
    """3-class correspondence labels over a per-point GT patch: 1 = match
    (|gt - z| < tau), 0 = valid-but-no-match, `invalid_fill` (2) = no GT
    (setup/data_gen_train.py:1136-1183 label semantics)."""
    gt = jnp.asarray(ground_truth_depth)
    z = jnp.asarray(radar_z)
    match = jnp.abs(gt - z) < max_distance_correspondence
    labels = jnp.where(match, 1.0, 0.0)
    return jnp.where(gt > 0, labels, invalid_fill)


def check_for_length_and_copy(indices: np.ndarray, final_len: int) -> np.ndarray:
    """Pad an index list to final_len by cyclic repetition, or truncate
    (reference setup/data_gen_train.py:876-897)."""
    indices = np.asarray(indices)
    n = indices.shape[0]
    if n >= final_len:
        return indices[:final_len]
    reps = int(np.ceil(final_len / max(n, 1)))
    return np.tile(indices, reps)[:final_len]


def register_points_radius(lidar_x, lidar_z, radar_x, radar_z,
                           radius: float = 0.4,
                           z_scaling_factor: float = 0.6):
    """ALL lidar indices within `radius` of each radar point in the
    (x, z * w) plane — the KD-tree radius query of the legacy data-gen
    (setup/data_gen_train.py:733-873) as one dense distance matrix.

    Returns a list of np index arrays (possibly empty), one per radar
    point."""
    lidar_feat = np.stack(
        [np.asarray(lidar_x), np.asarray(lidar_z) * z_scaling_factor], axis=1)
    radar_feat = np.stack(
        [np.asarray(radar_x), np.asarray(radar_z) * z_scaling_factor], axis=1)
    d = np.sqrt(np.sum(
        (radar_feat[:, None, :] - lidar_feat[None, :, :]) ** 2, axis=-1))
    return [np.where(row <= radius)[0] for row in d]


def reorganize_points(radar_points, lidar_points, idx_arrays,
                      num_points: int):
    """Build per-radar-point ground-truth point sets
    (reference setup/data_gen_train.py:899-982): for each radar point
    with >= 1 match, collect its matched lidar (x, y) pixel positions
    padded/truncated to num_points.

    Arg(s):
        radar_points : (3, N_r) image-plane radar points (x, y rows first)
        lidar_points : (2or3, N_l) image-plane lidar points
        idx_arrays : per-radar-point matched lidar indices
        num_points : static per-point match count
    Returns:
        input_points (M, 3), ground_truth_points (M, num_points, 2) for
        the M radar points that had at least one match.
    """
    radar_points = np.asarray(radar_points)
    lidar_points = np.asarray(lidar_points)
    inputs, gts = [], []
    for r, idx in enumerate(idx_arrays):
        if len(idx) == 0:
            continue
        idx = check_for_length_and_copy(idx, num_points)
        inputs.append(radar_points[:3, r])
        gts.append(lidar_points[:2, idx].T)  # (num_points, 2) x,y
    if not inputs:
        return (np.zeros((0, 3), np.float32),
                np.zeros((0, num_points, 2), np.float32))
    return (np.stack(inputs).astype(np.float32),
            np.stack(gts).astype(np.float32))

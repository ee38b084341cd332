"""Functional NN primitives for the TPU-native radar-camera-fusion-depth stack.

All tensor ops here are pure jax/jnp functions over NHWC arrays (TPU-native
layout; the PyTorch reference uses NCHW). Weight layout for convolutions is
HWIO. Semantics mirror the reference's torch building blocks
(reference: src/net_utils.py) so that converted checkpoints reproduce the
same outputs:

- conv2d: symmetric padding of kernel_size // 2, no bias
  (src/net_utils.py:63-69)
- max_pool2d 3x3/stride-2/pad-1 pads with -inf like torch.nn.MaxPool2d
- batch_norm: eps 1e-5, momentum 0.1, biased batch variance for
  normalization, unbiased for the running-stat update (torch semantics)
- resize_nearest: floor(i * in/out) index mapping, identical to
  torch.nn.functional.interpolate(mode='nearest')
  (used by UpConv2d, src/net_utils.py:195-198)
- resize_bilinear_align_corners: torch interpolate(mode='bilinear',
  align_corners=True) (multi-scale decoder side outputs,
  src/networks.py:1599-1603)
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def activation_fn(name: Optional[str]):
    """Map an activation name to an elementwise function (or None for linear).

    Mirrors the dispatch (and its substring matching plus the 0.20 negative
    slope!) of the reference: src/net_utils.py:4-23. Layer-level defaults in
    the reference use slope 0.10; callers that go through activation_func()
    always get 0.20.
    """
    if name is None:
        return None
    if not isinstance(name, str):
        return name  # already a callable
    if 'linear' in name:
        return None
    elif 'leaky_relu' in name:
        return functools.partial(leaky_relu, negative_slope=0.20)
    elif 'relu' in name:
        return relu
    elif 'elu' in name:
        return elu
    elif 'sigmoid' in name:
        return sigmoid
    else:
        raise ValueError('Unsupported activation function: {}'.format(name))


def leaky_relu(x, negative_slope=0.10):
    return jnp.where(x >= 0, x, negative_slope * x)


def relu(x):
    return jnp.maximum(x, 0)


def elu(x):
    return jnp.where(x > 0, x, jnp.expm1(x))


def sigmoid(x):
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# Weight initializers (torch-parity)
# ---------------------------------------------------------------------------

def _fan_in_out_conv(shape_hwio: Sequence[int]) -> Tuple[int, int]:
    kh, kw, cin, cout = shape_hwio
    receptive = kh * kw
    return cin * receptive, cout * receptive


def init_conv_weight(key, shape_hwio, initializer: str) -> jnp.ndarray:
    """Initialize a conv kernel in HWIO layout.

    'kaiming_uniform' reproduces torch.nn.Conv2d's *default* init
    (kaiming uniform with a=sqrt(5) -> bound = 1/sqrt(fan_in)), because the
    reference only calls an explicit initializer for the other three names
    (src/net_utils.py:71-77).
    """
    fan_in, fan_out = _fan_in_out_conv(shape_hwio)
    if initializer == 'kaiming_uniform':
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape_hwio, jnp.float32, -bound, bound)
    elif initializer == 'kaiming_normal':
        std = math.sqrt(2.0 / fan_in)
        return std * jax.random.normal(key, shape_hwio, jnp.float32)
    elif initializer == 'xavier_uniform':
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape_hwio, jnp.float32, -bound, bound)
    elif initializer == 'xavier_normal':
        std = math.sqrt(2.0 / (fan_in + fan_out))
        return std * jax.random.normal(key, shape_hwio, jnp.float32)
    else:
        raise ValueError('Unsupported weight initializer: {}'.format(initializer))


def init_linear(key, in_features, out_features, initializer: str):
    """Initialize (weight, bias) for a linear layer; weight is (in, out).

    torch.nn.Linear stores (out, in); we keep (in, out) so y = x @ w + b.
    Default torch init: kaiming uniform a=sqrt(5) for weight, and
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for bias (src/net_utils.py:222-229).
    """
    kw, kb = jax.random.split(key)
    fan_in, fan_out = in_features, out_features
    if initializer == 'kaiming_uniform':
        bound = 1.0 / math.sqrt(fan_in)
        w = jax.random.uniform(kw, (in_features, out_features), jnp.float32, -bound, bound)
    elif initializer == 'kaiming_normal':
        std = math.sqrt(2.0 / fan_in)
        w = std * jax.random.normal(kw, (in_features, out_features), jnp.float32)
    elif initializer == 'xavier_uniform':
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(kw, (in_features, out_features), jnp.float32, -bound, bound)
    elif initializer == 'xavier_normal':
        std = math.sqrt(2.0 / (fan_in + fan_out))
        w = std * jax.random.normal(kw, (in_features, out_features), jnp.float32)
    else:
        raise ValueError('Unsupported weight initializer: {}'.format(initializer))
    b_bound = 1.0 / math.sqrt(fan_in)
    b = jax.random.uniform(kb, (out_features,), jnp.float32, -b_bound, b_bound)
    return w, b


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------

def conv2d(x, w, stride=1, padding: Optional[int] = None):
    """2D convolution, NHWC x HWIO -> NHWC, symmetric padding k//2 by
    default. stride may be an int or an (sh, sw) pair (the legacy v0
    encoder uses rectangular 17x3 kernels, reference src/models.py:58-63)."""
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        pad_h, pad_w = kh // 2, kw // 2
    else:
        pad_h = pad_w = padding
    if isinstance(stride, int):
        stride = (stride, stride)
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=tuple(stride),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    )


def conv_transpose2d(x, w, stride: int = 2, padding: Optional[int] = None,
                     output_padding: int = 1):
    """Transposed conv matching torch.nn.ConvTranspose2d(stride=2,
    padding=k//2, output_padding=1) semantics (src/net_utils.py:125-132).

    Implemented as input dilation + conv with flipped-kernel semantics via
    lax.conv_general_dilated with lhs_dilation.
    """
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = kh // 2
    # torch output size: (in - 1)*stride - 2*pad + k + output_padding
    # lax: with lhs_dilation=s, effective input (in-1)*s + 1; output =
    # (in-1)*s + 1 + pad_lo + pad_hi - k + 1.
    # Choose pad_lo = k - 1 - padding, pad_hi = k - 1 - padding + output_padding.
    pad_lo_h = kh - 1 - padding
    pad_hi_h = kh - 1 - padding + output_padding
    pad_lo_w = kw - 1 - padding
    pad_hi_w = kw - 1 - padding + output_padding
    # ConvTranspose applies the kernel as correlation from the output side:
    # equivalent to convolution (flipped kernel) over the dilated input.
    w_flipped = w[::-1, ::-1, :, :]
    return lax.conv_general_dilated(
        x,
        w_flipped.astype(x.dtype),
        window_strides=(1, 1),
        padding=((pad_lo_h, pad_hi_h), (pad_lo_w, pad_hi_w)),
        lhs_dilation=(stride, stride),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    )


def upsample2x_conv2d(x, w):
    """Fused 2x nearest-upsample + 3x3 conv (pad 1).

    Exactly equivalent to conv2d(resize_nearest(x, 2x), w) but computed as
    four 2x2-kernel phase convolutions on the LOW-res input — 2.25x fewer
    MACs and no (2H, 2W, C_in) intermediate. Derivation: output pixel
    (2i+dy, 2j+dx) reads upsampled rows {2i+dy-1, .., 2i+dy+1} which map to
    low-res rows {i-1, i} (dy=0) or {i, i+1} (dy=1) with kernel taps
    summed accordingly; same for columns.
    """
    assert w.shape[0] == 3 and w.shape[1] == 3
    w = w.astype(x.dtype)
    # row-combined 2x3 kernels
    r0 = jnp.stack([w[0], w[1] + w[2]], axis=0)  # dy=0: rows (i-1, i)
    r1 = jnp.stack([w[0] + w[1], w[2]], axis=0)  # dy=1: rows (i, i+1)

    def col_combine(r, dx):
        if dx == 0:
            return jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)
        return jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)

    phases = []
    for dy, r in ((0, r0), (1, r1)):
        pad_h = (1, 0) if dy == 0 else (0, 1)
        for dx in (0, 1):
            k = col_combine(r, dx)  # (2, 2, Cin, Cout)
            pad_w = (1, 0) if dx == 0 else (0, 1)
            phases.append(lax.conv_general_dilated(
                x, k, (1, 1), padding=(pad_h, pad_w),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')))

    n, h, wd, c = phases[0].shape
    stacked = jnp.stack(phases, axis=0).reshape(2, 2, n, h, wd, c)
    out = jnp.transpose(stacked, (2, 3, 0, 4, 1, 5))  # (N, h, dy, w, dx, C)
    return out.reshape(n, 2 * h, 2 * wd, c)


def max_pool2d(x, kernel_size: int = 3, stride: int = 2, padding: int = 1):
    """Max pool over NHWC with -inf padding (torch.nn.MaxPool2d parity)."""
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def min_pool2d(x, kernel_size: int, stride: int = 1, padding: int = 0,
               pad_value: Optional[jnp.ndarray] = None):
    """Min pool; used by OutlierRemoval (src/net_utils.py:615-627)."""
    if pad_value is None:
        pad_value = jnp.array(jnp.inf, dtype=x.dtype)
    if padding > 0:
        x = jnp.pad(
            x,
            ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            mode='constant',
            constant_values=pad_value,
        )
    return lax.reduce_window(
        x,
        jnp.inf,
        lax.min,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, 0), (0, 0), (0, 0)),
    )


def batch_norm_apply(x, weight, bias, mean, var, eps: float = 1e-5):
    """Normalize NHWC x with per-channel stats. Stat math runs in at least
    float32 (promoted further if the params are wider, e.g. f64 tests)."""
    dtype = x.dtype
    stat_dtype = jnp.promote_types(jnp.float32, weight.dtype)
    inv = lax.rsqrt(var.astype(stat_dtype) + eps)
    scale = (weight.astype(stat_dtype) * inv).astype(dtype)
    shift = (bias.astype(stat_dtype) -
             mean.astype(stat_dtype) * weight.astype(stat_dtype) * inv
             ).astype(dtype)
    return x * scale + shift


def batch_norm_train_stats(x):
    """Batch mean and biased variance over (N, H, W) in >= float32."""
    stat_dtype = jnp.promote_types(jnp.float32, x.dtype)
    xs = x.astype(stat_dtype)
    mean = jnp.mean(xs, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xs), axis=(0, 1, 2)) - jnp.square(mean)
    return mean, var


def resize_nearest(x, shape: Tuple[int, int]):
    """Nearest-neighbor resize of NHWC to (H, W) with torch 'nearest'
    index mapping: src_idx = floor(dst_idx * in / out)."""
    n, h, w, c = x.shape
    out_h, out_w = int(shape[0]), int(shape[1])
    if out_h == h and out_w == w:
        return x
    if out_h % h == 0 and out_w % w == 0:
        # exact integer upsample: broadcast instead of gather (the floor
        # index map degenerates to pixel duplication)
        kh, kw = out_h // h, out_w // w
        x = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (n, h, kh, w, kw, c))
        return x.reshape(n, out_h, out_w, c)
    row_idx = (jnp.arange(out_h) * h) // out_h
    col_idx = (jnp.arange(out_w) * w) // out_w
    return x[:, row_idx][:, :, col_idx]


def resize_bilinear_align_corners(x, shape: Tuple[int, int]):
    """Bilinear resize with align_corners=True (torch parity)."""
    n, h, w, c = x.shape
    out_h, out_w = int(shape[0]), int(shape[1])
    if out_h == h and out_w == w:
        return x

    def coords(out_dim, in_dim):
        if out_dim == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(out_dim, dtype=jnp.float32) * ((in_dim - 1) / (out_dim - 1))

    ys = coords(out_h, h)
    xs = coords(out_w, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(jnp.float32)).astype(x.dtype)
    wx = (xs - x0.astype(jnp.float32)).astype(x.dtype)

    top = x[:, y0]
    bot = x[:, y1]
    rows = top + wy[None, :, None, None] * (bot - top)
    left = rows[:, :, x0]
    right = rows[:, :, x1]
    return left + wx[None, None, :, None] * (right - left)


def outlier_removal(depth, kernel_size: int = 7, threshold: float = 1.5):
    """Remove sparse-depth outliers via local min-pool comparison.

    NHWC (C=1) port of the reference OutlierRemoval
    (src/net_utils.py:575-638): fill zeros with 10*max, min-pool a
    kernel_size neighborhood, zero any measurement more than `threshold`
    above the local minimum.
    """
    max_value = 10.0 * jnp.max(depth)
    depth_max_filled = jnp.where(depth > 0.0, depth, max_value)
    padding = kernel_size // 2
    depth_max_filled = jnp.pad(
        depth_max_filled,
        ((0, 0), (padding, padding), (padding, padding), (0, 0)),
        mode='constant',
        constant_values=0.0,
    )
    # the reference pads with max_value; emulate by replacing pad zeros
    depth_max_filled = jnp.where(depth_max_filled == 0.0, max_value, depth_max_filled)
    min_values = min_pool2d(depth_max_filled, kernel_size, stride=1, padding=0)
    validity_map_clean = jnp.where(min_values < depth - threshold, 0.0, 1.0)
    return depth * validity_map_clean.astype(depth.dtype)

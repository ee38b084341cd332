"""Loss functions (TPU port of reference src/fusionnet_losses.py and the
masked BCE from src/radarnet_model.py:126-167)."""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import functional as F


def l1_loss(src, tgt, weight=None):
    """Mean L1. With `weight` (a 0/1 mask), computes the masked mean —
    equivalent to the reference's boolean-indexed
    torch.nn.functional.l1_loss(src[mask], tgt[mask])."""
    err = jnp.abs(src - tgt)
    return _masked_mean(err, weight)


def l2_loss(src, tgt, weight=None):
    err = jnp.square(src - tgt)
    return _masked_mean(err, weight)


def smooth_l1_loss(src, tgt, weight=None, beta: float = 1.0):
    diff = jnp.abs(src - tgt)
    err = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return _masked_mean(err, weight)


def _masked_mean(err, weight):
    if weight is None:
        return jnp.mean(err)
    weight = weight.astype(err.dtype)
    denom = jnp.sum(weight)
    return jnp.sum(err * weight) / jnp.maximum(denom, 1.0)


def binary_cross_entropy_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise BCE-with-logits with positive-class weighting
    (torch.nn.functional.binary_cross_entropy_with_logits parity).

    loss = (1 + (pw - 1) * t) * softplus(-x) + (1 - t) * x  (stable form)
    """
    log_sig = jax.nn.log_sigmoid(logits)          # log(sigmoid(x))
    log_one_minus = jax.nn.log_sigmoid(-logits)   # log(1 - sigmoid(x))
    return -(pos_weight * targets * log_sig + (1.0 - targets) * log_one_minus)


def gradient_yx(t):
    """First differences along y and x of an NHWC tensor
    (src/fusionnet_losses.py:131-145)."""
    dx = t[:, :, :-1, :] - t[:, :, 1:, :]
    dy = t[:, :-1, :, :] - t[:, 1:, :, :]
    return dy, dx


def smoothness_loss_func(predict, image):
    """Edge-aware first-difference smoothness
    (src/fusionnet_losses.py:49-74). NHWC."""
    predict_dy, predict_dx = gradient_yx(predict)
    image_dy, image_dx = gradient_yx(image)
    weights_x = jnp.exp(-jnp.mean(jnp.abs(image_dx), axis=-1, keepdims=True))
    weights_y = jnp.exp(-jnp.mean(jnp.abs(image_dy), axis=-1, keepdims=True))
    smoothness_x = jnp.mean(weights_x * jnp.abs(predict_dx))
    smoothness_y = jnp.mean(weights_y * jnp.abs(predict_dy))
    return smoothness_x + smoothness_y


def sobel_filter(filter_size=(1, 1, 3, 3)):
    """Generalized sobel kernels, returned as numpy (kh, kw)
    (src/fusionnet_losses.py:147-161)."""
    kh, kw = filter_size[-2], filter_size[-1]
    gx = np.ones((kh, kw), dtype=np.float32)
    gy = np.ones((kh, kw), dtype=np.float32)

    gx[:, kw // 2] = 0
    gx[kh // 2, kw // 2 - 1] = 2
    gx[kh // 2, kw // 2 + 1] = 2
    gx[:, kw // 2:] = -gx[:, kw // 2:]

    gy[kh // 2, :] = 0
    gy[kh // 2 - 1, kw // 2] = 2
    gy[kh // 2 + 1, kw // 2] = 2
    gy[kh // 2 + 1:, :] = -gy[kh // 2 + 1:, :]
    return gx, gy


def _conv_single(x, kernel_np):
    """Valid conv of NHWC (C=1) x with a (kh, kw) kernel.

    Matches torch.nn.functional.conv2d, which computes cross-correlation —
    no kernel flip."""
    k = jnp.asarray(kernel_np, x.dtype)[:, :, None, None]
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def sobel_smoothness_loss_func(predict, image, weights, filter_size=(1, 1, 7, 7)):
    """Sobel-filtered smoothness with validity weights
    (src/fusionnet_losses.py:77-125). NHWC, predict C=1, image C=3."""
    kh, kw = filter_size[-2], filter_size[-1]
    predict = jnp.pad(
        predict,
        ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
        mode='edge')

    gx, gy = sobel_filter(filter_size)
    predict_dy = _conv_single(predict, gy)
    predict_dx = _conv_single(predict, gx)

    gray = (image[..., 0] * 0.30 + image[..., 1] * 0.59 + image[..., 2] * 0.11)
    gray = gray[..., None]
    gray = jnp.pad(gray, ((0, 0), (1, 1), (1, 1), (0, 0)), mode='edge')

    gx_i, gy_i = sobel_filter((1, 1, 3, 3))
    image_dy = _conv_single(gray, gy_i)
    image_dx = _conv_single(gray, gx_i)

    weights_x = jnp.exp(-jnp.mean(jnp.abs(image_dx), axis=-1, keepdims=True))
    weights_y = jnp.exp(-jnp.mean(jnp.abs(image_dy), axis=-1, keepdims=True))

    smoothness_x = jnp.mean(weights * weights_x * jnp.abs(predict_dx))
    smoothness_y = jnp.mean(weights * weights_y * jnp.abs(predict_dy))
    return (smoothness_x + smoothness_y) / float(kh * kw)

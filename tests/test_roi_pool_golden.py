"""ROI pool vs the independent C++ golden kernel (native/roi_pool_golden.cpp).

tests/reference_import.py's torch stub and ops/roi_pool.py were written by
the same hand (SURVEY §7.3 item 2 risk); the C++ golden is a third,
independent transcription of torchvision's roi_pool kernel algorithm.
Validates every canonical skip scale including 1/64 and 1/128 with the
real full-height column-box geometry.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from rcfd_tpu import native
from rcfd_tpu.ops.roi_pool import roi_pool, roi_pool_column

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native toolchain unavailable')

H_IMG, W_PAD = 900, 1888  # padded nuScenes frame (1600 + 2*144)
PATCH_H, PATCH_W = 900, 288
SCALES = [1 / 2., 1 / 4., 1 / 8., 1 / 16., 1 / 32., 1 / 64., 1 / 128.]


def _feat_dims(scale):
    # encoder feature dims: repeated stride-2 halvings (ceil division)
    h, w = H_IMG, W_PAD
    for _ in range(int(round(math.log2(1.0 / scale)))):
        h, w = -(-h // 2), -(-w // 2)
    return h, w


@pytest.mark.parametrize('scale', SCALES)
def test_roi_pool_column_matches_cpp_golden(scale, rng):
    h_f, w_f = _feat_dims(scale)
    c, k = 3, 9
    feat = rng.standard_normal((1, h_f, w_f, c)).astype(np.float32)
    # full-height fixed-width column boxes, incl. both image edges
    x1 = np.concatenate([
        np.array([0.0, W_PAD - PATCH_W], np.float32),
        rng.integers(0, W_PAD - PATCH_W, k - 2).astype(np.float32)])
    pooled_size = (max(int(PATCH_H * scale), 1), max(int(PATCH_W * scale), 1))

    ours = np.asarray(roi_pool_column(
        jnp.asarray(feat), jnp.asarray(x1[None]), box_width=PATCH_W,
        box_y1=0, box_y2=H_IMG, spatial_scale=scale,
        output_size=pooled_size))

    boxes = np.stack([x1, np.zeros_like(x1), x1 + PATCH_W,
                      np.full_like(x1, H_IMG)], axis=1)
    golden = native.roi_pool_golden(
        feat[0].transpose(2, 0, 1), boxes, scale, pooled_size)
    golden = golden.transpose(0, 2, 3, 1)  # KCHW -> KHWC

    np.testing.assert_allclose(ours, golden, rtol=1e-6, atol=1e-6,
                               err_msg=f'scale 1/{int(1/scale)}')


def test_general_roi_pool_matches_cpp_golden(rng):
    h_f, w_f, c, k = 24, 40, 4, 6
    feat = rng.standard_normal((1, h_f, w_f, c)).astype(np.float32)
    boxes = np.stack([
        rng.integers(0, 50, k).astype(np.float32),
        rng.integers(0, 30, k).astype(np.float32),
        rng.integers(50, 78, k).astype(np.float32),
        rng.integers(30, 47, k).astype(np.float32)], axis=1)
    scale, pooled = 0.5, (7, 11)

    ours = np.asarray(roi_pool(
        jnp.asarray(feat), jnp.asarray(boxes[None]), spatial_scale=scale,
        output_size=pooled))
    golden = native.roi_pool_golden(
        feat[0].transpose(2, 0, 1), boxes, scale, pooled)
    np.testing.assert_allclose(ours, golden.transpose(0, 2, 3, 1),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.smoke
def test_row_bin_f32_overshoot_matches_golden(rng):
    """At 1/8 scale (roi_h = 114 over 112 bins) torchvision's FLOAT32 bin
    arithmetic makes bin 55 span THREE rows ([55, 58)); float64 math gives
    two. A spike on row 57 must appear in both bins 55 and 56."""
    h_f, w_f = 113, 236
    feat = np.zeros((1, h_f, w_f, 1), np.float32)
    feat[0, 57, :, 0] = 7.0
    x1 = np.array([[0.0]], np.float32)
    out = np.asarray(roi_pool_column(
        jnp.asarray(feat), jnp.asarray(x1), box_width=288, box_y1=0,
        box_y2=900, spatial_scale=0.125, output_size=(112, 36)))
    assert out[0, 55, 0, 0] == 7.0, 'bin 55 must include row 57 (f32 bins)'
    assert out[0, 56, 0, 0] == 7.0
    assert out[0, 54, 0, 0] == 0.0

    boxes = np.array([[0., 0., 288., 900.]], np.float32)
    golden = native.roi_pool_golden(
        feat[0].transpose(2, 0, 1), boxes, 0.125, (112, 36))
    np.testing.assert_array_equal(out, golden.transpose(0, 2, 3, 1))

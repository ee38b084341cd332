"""Unit tests for TPU ops: ROI pooling and the quasi-dense scatter."""

import numpy as np
import pytest

import jax.numpy as jnp

from rcfd_tpu.ops import roi_pool, roi_pool_column, scatter_quasi_dense

from reference_import import torch_roi_pool

pytestmark = pytest.mark.smoke


def _column_boxes(x1, box_w, box_h):
    """(N, K) left edges -> list of (K, 4) torch boxes."""
    import torch
    out = []
    for row in x1:
        boxes = [[x, 0.0, x + box_w, box_h] for x in row]
        out.append(torch.tensor(boxes, dtype=torch.float32))
    return out


@pytest.mark.parametrize('scale_denom', [2, 4, 8, 32, 64, 128])
def test_roi_pool_column_vs_torch_semantics(scale_denom, rng):
    import torch
    box_h, box_w = 128, 64
    scale = 1.0 / scale_denom
    pooled = (max(int(box_h * scale), 1), max(int(box_w * scale), 1))
    h_f = max(int(np.ceil(box_h * scale)), 1) + 1
    w_f = max(int(np.ceil((box_w + 256) * scale)), 1) + 2

    feat = rng.standard_normal((2, h_f, w_f, 3), dtype=np.float32)
    x1 = rng.integers(0, 256, size=(2, 4)).astype(np.float32)

    ours = roi_pool_column(
        jnp.asarray(feat), jnp.asarray(x1), box_width=box_w,
        box_y1=0, box_y2=box_h, spatial_scale=scale, output_size=pooled)
    ours = np.asarray(ours)

    ref = torch_roi_pool(
        torch.from_numpy(feat.transpose(0, 3, 1, 2)),
        _column_boxes(x1, box_w, box_h),
        spatial_scale=scale, output_size=pooled).numpy()
    ref = ref.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_roi_pool_general_vs_torch_semantics(rng):
    import torch
    feat = rng.standard_normal((2, 16, 20, 3), dtype=np.float32)
    boxes = np.zeros((2, 3, 4), np.float32)
    for n in range(2):
        for k in range(3):
            x1, y1 = rng.integers(0, 30, 2)
            boxes[n, k] = [x1, y1, x1 + rng.integers(4, 20), y1 + rng.integers(4, 20)]
    pooled = (4, 5)
    scale = 0.5

    ours = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(boxes),
                               spatial_scale=scale, output_size=pooled))
    tboxes = [torch.from_numpy(boxes[n]) for n in range(2)]
    ref = torch_roi_pool(torch.from_numpy(feat.transpose(0, 3, 1, 2)), tboxes,
                         spatial_scale=scale, output_size=pooled).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), rtol=1e-6, atol=1e-6)


def _reference_scatter(crops, x_positions, z, h, w, threshold=0.5,
                       legacy=True):
    """Literal numpy port of the reference scatter loop
    (src/radarnet_main.py:534-591). legacy=True reproduces the int64
    argmax-map quirks (integer-truncated depths + cascading index/z
    rewrites); legacy=False is the clean gather."""
    k, ph, pw = crops.shape
    pad = pw // 2
    tiles = np.zeros((k, h, w + 2 * pad), np.float32)
    for i in range(k):
        c = np.where(crops[i] < threshold, 0.0, crops[i])
        x = int(x_positions[i])
        tiles[i, h - ph:, x - pad:x + pad] = c
    tiles = tiles[:, :, pad:-pad]
    response = tiles.max(axis=0)
    argmax = tiles.argmax(axis=0)
    if legacy:
        m = argmax.astype(np.int64)
        for p in range(k):
            m = np.where(m == p, int(z[p]), m)  # int64 fill truncates
        depth = m.astype(np.float32)
    else:
        depth = z[argmax].copy()
    depth[response == 0] = 0.0
    return depth, response


@pytest.mark.parametrize('legacy', [True, False])
def test_scatter_quasi_dense_matches_reference_loop(rng, legacy):
    h, w, ph, pw, k = 40, 64, 24, 16, 6
    pad = pw // 2
    crops = rng.random((k, ph, pw), dtype=np.float32)
    x = rng.integers(pad, w + pad, size=(k,)).astype(np.float32)
    # include z values that collide with point indices to exercise the
    # legacy rewrite cascade
    z = np.array([3.0, 17.4, 1.9, 44.0, 2.5, 60.1], np.float32)

    ref_d, ref_r = _reference_scatter(crops, x, z, h, w, legacy=legacy)
    d, r = scatter_quasi_dense(
        jnp.asarray(crops), jnp.asarray(x), jnp.asarray(z),
        jnp.ones((k,), bool), image_height=h, image_width=w,
        patch_size=(ph, pw), legacy_depth_semantics=legacy)
    np.testing.assert_allclose(np.asarray(r), ref_r, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-6, atol=1e-6)


def test_scatter_tie_break_first_index_wins():
    """Two points writing the same response to the same pixel: the smaller
    point index must win (torch.max first-occurrence argmax)."""
    ph, pw, h, w = 4, 4, 8, 12
    pad = pw // 2
    crops = np.zeros((2, ph, pw), np.float32)
    crops[0, 1, :] = 0.7
    crops[1, 1, :] = 0.7
    x = np.array([6.0 + pad, 6.0 + pad], np.float32)  # identical windows
    z = np.array([10.0, 20.0], np.float32)
    d, r = scatter_quasi_dense(
        jnp.asarray(crops), jnp.asarray(x), jnp.asarray(z),
        jnp.ones((2,), bool), h, w, (ph, pw))
    d = np.asarray(d)
    # crop pixel (1, j) lands at column x - 2*pad + j = 6 - pad + j
    cols = slice(6 - pad, 6 - pad + pw)
    assert np.all(d[h - ph + 1, cols] == 10.0)


def test_scatter_padded_points_are_ignored():
    ph, pw, h, w = 4, 4, 8, 12
    pad = pw // 2
    crops = np.full((3, ph, pw), 0.9, np.float32)
    x = np.array([4 + pad, 6 + pad, 0 + pad], np.float32)
    z = np.array([5.0, 6.0, 7.0], np.float32)
    valid = np.array([True, False, False])
    d, r = scatter_quasi_dense(
        jnp.asarray(crops), jnp.asarray(x), jnp.asarray(z),
        jnp.asarray(valid), h, w, (ph, pw))
    d = np.asarray(d)
    assert set(np.unique(d)) <= {0.0, 5.0}
    assert np.any(d == 5.0)


def test_scatter_legacy_rewrite_skips_padding_points():
    """Regression: with legacy_depth_semantics=True the index->z rewrite
    must loop over REAL points only. A z=0 padding point p used to
    rewrite any pixel whose cascaded integer depth equaled p back to 0
    (1 valid point z=5.7 padded to K=8 yielded an all-zero depth map)."""
    ph, pw, h, w = 4, 4, 8, 12
    pad = pw // 2
    k = 8
    crops = np.zeros((k, ph, pw), np.float32)
    crops[0] = 0.9
    x = np.full((k,), 4 + pad, np.float32)
    z = np.zeros((k,), np.float32)
    z[0] = 5.7  # int-truncates to 5 == index of a padding point
    valid = np.zeros((k,), bool)
    valid[0] = True
    d, r = scatter_quasi_dense(
        jnp.asarray(crops), jnp.asarray(x), jnp.asarray(z),
        jnp.asarray(valid), h, w, (ph, pw), legacy_depth_semantics=True)
    d = np.asarray(d)
    assert np.any(d == 5.0), 'padding point cascade zeroed the depth map'
    assert set(np.unique(d)) <= {0.0, 5.0}

    # must equal the reference loop run over just the real point
    ref_d, ref_r = _reference_scatter(crops[:1], x[:1], z[:1], h, w,
                                      legacy=True)
    np.testing.assert_allclose(d, ref_d, rtol=1e-6, atol=1e-6)


def test_scatter_threshold_zeroes_low_response():
    ph, pw, h, w = 4, 4, 8, 12
    pad = pw // 2
    crops = np.full((1, ph, pw), 0.4, np.float32)  # below threshold
    x = np.array([4 + pad], np.float32)
    z = np.array([9.0], np.float32)
    d, r = scatter_quasi_dense(
        jnp.asarray(crops), jnp.asarray(x), jnp.asarray(z),
        jnp.ones((1,), bool), h, w, (ph, pw))
    assert float(np.asarray(r).max()) == 0.0
    assert float(np.asarray(d).max()) == 0.0

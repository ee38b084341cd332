"""ROI max pooling for TPU.

The reference reaches torchvision.ops.roi_pool (C++/CUDA) from
src/networks.py:1232-1247 with a very specific structure: every box is a
full-height, fixed-width column window ``[x - pad, 0, x + pad, H]`` around a
radar point's column (src/datasets.py:226-235, src/radarnet_main.py:640-648),
and ``output_size`` equals the box size at the feature scale. We exploit that
structure:

- Row bins depend only on (H, scale, output h) — all static — so row pooling
  is precomputed with static indices and shared across all boxes and batch
  elements.
- Column bins depend on the box x offset only through round(x * scale) and a
  roi_width that varies by +-1 with rounding; we implement them as a bounded
  gather + masked max (window of MAXB columns per output column).

Semantics follow torchvision's roi_pool kernel exactly:
  roi_start = round(coord * spatial_scale); roi_size = max(end - start + 1, 1)
  bin j covers [floor(j * bin), ceil((j+1) * bin)) clamped to the feature map;
  empty bins produce 0.

A general (arbitrary boxes) `roi_pool` built on the same bin math is provided
for parity testing and API completeness.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round_half_away(v):
    """C++ std::round for non-negative inputs (torchvision uses round())."""
    return jnp.floor(v + 0.5)


def _static_bins(roi_size: int, pooled: int):
    """Static bin (start, end) pairs for a fixed roi size."""
    bin_size = roi_size / pooled
    starts = np.floor(np.arange(pooled) * bin_size).astype(np.int64)
    ends = np.ceil((np.arange(pooled) + 1) * bin_size).astype(np.int64)
    return starts, ends


def pool_rows_static(feat, box_y1: int, box_y2: int, spatial_scale: float,
                     pooled_h: int):
    """Max-pool rows of NHWC feat into pooled_h bins (static box y-extent).

    Returns (N, pooled_h, W, C). Shared across all column boxes.
    """
    h = feat.shape[1]
    roi_start_h = int(np.round(box_y1 * spatial_scale))
    roi_end_h = int(np.round(box_y2 * spatial_scale))
    roi_height = max(roi_end_h - roi_start_h + 1, 1)
    starts, ends = _static_bins(roi_height, pooled_h)
    starts = np.clip(starts + roi_start_h, 0, h)
    ends = np.clip(ends + roi_start_h, 0, h)
    max_bin = int(np.max(ends - starts))

    out = None
    for t in range(max_bin):
        idx = np.clip(starts + t, 0, h - 1)
        valid = (starts + t) < ends  # static bool per row
        rows = feat[:, idx]  # static gather
        if not valid.all():
            mask = jnp.asarray(valid.reshape(1, -1, 1, 1))
            rows = jnp.where(mask, rows, jnp.array(-jnp.inf, feat.dtype))
        out = rows if out is None else jnp.maximum(out, rows)
    # empty bins (shouldn't occur with these geometries) -> 0 like torchvision
    out = jnp.where(jnp.isfinite(out), out, 0).astype(feat.dtype)
    return out


def roi_pool_column(feat, x1, box_width: int, box_y1: int, box_y2: int,
                    spatial_scale: float, output_size: Tuple[int, int]):
    """ROI max pool for full-height fixed-width column boxes.

    Arg(s):
        feat : (N, H_f, W_f, C) feature map (NHWC)
        x1 : (N, K) float/int left edges of the boxes in input coords
            (x2 = x1 + box_width)
        box_width : static box width in input coords
        box_y1, box_y2 : static vertical box extent in input coords
        spatial_scale : feature scale (e.g. 1/32)
        output_size : (pooled_h, pooled_w)
    Returns:
        (N * K, pooled_h, pooled_w, C) pooled features, ordered like
        torchvision.ops.roi_pool with a list of per-image boxes
        (image-major).
    """
    n, h_f, w_f, c = feat.shape
    k = x1.shape[1]
    pooled_h, pooled_w = output_size

    rows = pool_rows_static(feat, box_y1, box_y2, spatial_scale, pooled_h)
    # rows: (N, pooled_h, W_f, C)

    x1f = x1.astype(jnp.float32)
    roi_start_w = _round_half_away(x1f * spatial_scale).astype(jnp.int32)  # (N, K)
    roi_end_w = _round_half_away((x1f + box_width) * spatial_scale).astype(jnp.int32)
    roi_width = jnp.maximum(roi_end_w - roi_start_w + 1, 1)  # (N, K)

    # Static upper bound on bin width: roi_width <= ceil(W*s) + 2
    max_roi_w = int(math.ceil(box_width * spatial_scale)) + 2
    max_bin_w = int(math.ceil(max_roi_w / pooled_w)) + 1

    bin_w = roi_width.astype(jnp.float32) / pooled_w  # (N, K)
    j = jnp.arange(pooled_w, dtype=jnp.float32)
    wstart = jnp.floor(j[None, None, :] * bin_w[..., None])          # (N, K, pw)
    wend = jnp.ceil((j[None, None, :] + 1.0) * bin_w[..., None])     # (N, K, pw)
    wstart = jnp.clip(wstart.astype(jnp.int32) + roi_start_w[..., None], 0, w_f)
    wend = jnp.clip(wend.astype(jnp.int32) + roi_start_w[..., None], 0, w_f)

    t = jnp.arange(max_bin_w, dtype=jnp.int32)
    cols = wstart[..., None] + t  # (N, K, pw, T)
    valid = cols < wend[..., None]
    cols_c = jnp.clip(cols, 0, w_f - 1)

    # Gather columns from the row-pooled map, one bin tap at a time:
    # accumulating the max over T gathers of (ph, K*pw, C) instead of one
    # (ph, K*pw*T, C) gather cuts the transient HBM traffic by T (the
    # 1/2-scale skip at K=128 would otherwise materialize ~3 GB).
    def per_image(rows_n, cols_n, valid_n):
        # rows_n: (ph, W_f, C); cols_n/valid_n: (K, pw, T)
        neg_inf = jnp.array(-jnp.inf, rows_n.dtype)
        acc = None
        for tap in range(max_bin_w):
            g = rows_n[:, cols_n[..., tap].reshape(-1)]  # (ph, K*pw, C)
            g = g.reshape(pooled_h, k, pooled_w, c)
            g = jnp.where(valid_n[None, ..., tap, None], g, neg_inf)
            acc = g if acc is None else jnp.maximum(acc, g)
        acc = jnp.where(jnp.isfinite(acc), acc, 0).astype(rows_n.dtype)
        return jnp.transpose(acc, (1, 0, 2, 3))  # (K, ph, pw, C)

    pooled = jax.vmap(per_image)(rows, cols_c, valid)  # (N, K, ph, pw, C)
    return pooled.reshape(n * k, pooled_h, pooled_w, c)


def roi_pool(feat, boxes, spatial_scale: float, output_size: Tuple[int, int],
             max_roi_size: Tuple[int, int] = None):
    """General ROI max pool (torchvision semantics) for NHWC features.

    Arg(s):
        feat : (N, H, W, C)
        boxes : (N, K, 4) [x1, y1, x2, y2] per-image boxes
        spatial_scale : feature scale
        output_size : (pooled_h, pooled_w)
        max_roi_size : static bound on (roi_h, roi_w) at feature scale;
            defaults to the whole feature map (memory heavy — prefer
            roi_pool_column for the radar column boxes).
    Returns:
        (N * K, pooled_h, pooled_w, C)
    """
    n, h_f, w_f, c = feat.shape
    k = boxes.shape[1]
    pooled_h, pooled_w = output_size
    if max_roi_size is None:
        max_roi_size = (h_f + 1, w_f + 1)

    bf = boxes.astype(jnp.float32)
    start_w = _round_half_away(bf[..., 0] * spatial_scale).astype(jnp.int32)
    start_h = _round_half_away(bf[..., 1] * spatial_scale).astype(jnp.int32)
    end_w = _round_half_away(bf[..., 2] * spatial_scale).astype(jnp.int32)
    end_h = _round_half_away(bf[..., 3] * spatial_scale).astype(jnp.int32)
    roi_w = jnp.maximum(end_w - start_w + 1, 1)
    roi_h = jnp.maximum(end_h - start_h + 1, 1)

    max_bin_h = int(math.ceil(max_roi_size[0] / pooled_h)) + 1
    max_bin_w = int(math.ceil(max_roi_size[1] / pooled_w)) + 1

    def bins(start, size, pooled, max_bin, limit):
        b = size.astype(jnp.float32) / pooled
        i = jnp.arange(pooled, dtype=jnp.float32)
        s = jnp.floor(i[None, None, :] * b[..., None]).astype(jnp.int32)
        e = jnp.ceil((i[None, None, :] + 1.0) * b[..., None]).astype(jnp.int32)
        s = jnp.clip(s + start[..., None], 0, limit)
        e = jnp.clip(e + start[..., None], 0, limit)
        t = jnp.arange(max_bin, dtype=jnp.int32)
        idx = s[..., None] + t
        valid = idx < e[..., None]
        return jnp.clip(idx, 0, limit - 1), valid

    ridx, rvalid = bins(start_h, roi_h, pooled_h, max_bin_h, h_f)  # (N,K,ph,Th)
    cidx, cvalid = bins(start_w, roi_w, pooled_w, max_bin_w, w_f)  # (N,K,pw,Tw)

    def per_roi(feat_n, ridx_k, rvalid_k, cidx_k, cvalid_k):
        g = feat_n[ridx_k.reshape(-1)][:, cidx_k.reshape(-1)]
        g = g.reshape(pooled_h, max_bin_h, pooled_w, max_bin_w, c)
        mask = rvalid_k.reshape(pooled_h, max_bin_h, 1, 1, 1) & \
            cvalid_k.reshape(1, 1, pooled_w, max_bin_w, 1)
        g = jnp.where(mask, g, jnp.array(-jnp.inf, g.dtype))
        g = jnp.max(g, axis=(1, 3))
        return jnp.where(jnp.isfinite(g), g, 0).astype(feat_n.dtype)

    pooled = jax.vmap(
        lambda f, ri, rv, ci, cv: jax.vmap(
            lambda a, b_, c_, d_: per_roi(f, a, b_, c_, d_))(ri, rv, ci, cv)
    )(feat, ridx, rvalid, cidx, cvalid)
    return pooled.reshape(n * k, pooled_h, pooled_w, c)

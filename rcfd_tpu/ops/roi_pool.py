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
    """Static bin (start, end) pairs for a fixed roi size.

    The arithmetic is FLOAT32 like torchvision's kernel (scalar_t bins):
    e.g. roi 114 over 112 bins gives f32(114/112) * 56 = 57.0000038, so
    bin 55 spans THREE rows [55, 58) where float64 math would give two —
    verified against the independent C++ golden kernel."""
    bin_size = np.float32(roi_size) / np.float32(pooled)
    idx = np.arange(pooled, dtype=np.float32)
    starts = np.floor(idx * bin_size).astype(np.int64)
    ends = np.ceil((idx + np.float32(1)) * bin_size).astype(np.int64)
    return starts, ends


def pool_rows_static(feat, box_y1: int, box_y2: int, spatial_scale: float,
                     pooled_h: int):
    """Max-pool rows of NHWC feat into pooled_h bins (static box y-extent).

    Returns (N, pooled_h, W, C). Shared across all column boxes.
    """
    h = feat.shape[1]
    # torchvision rounds with C++ std::round (half AWAY from zero);
    # np.round is banker's rounding and differs at the 1/8 skip where
    # 900 * 0.125 = 112.5 (np.round -> 112, std::round -> 113) — a real
    # off-by-one caught by the independent C++ golden kernel
    roi_start_h = int(np.floor(box_y1 * spatial_scale + 0.5))
    roi_end_h = int(np.floor(box_y2 * spatial_scale + 0.5))
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
                    spatial_scale: float, output_size: Tuple[int, int],
                    return_global: bool = False,
                    gather_mode: str = 'take',
                    use_pallas_crop: bool = None):
    """ROI max pool for full-height fixed-width column boxes.

    Arg(s):
        feat : (N, H_f, W_f, C) feature map (NHWC)
        x1 : (N, K) float/int left edges of the boxes in input coords
            (x2 = x1 + box_width)
        box_width : static box width in input coords
        box_y1, box_y2 : static vertical box extent in input coords
        gather_mode : 'take' (default; per-column gather — XLA's gather
            emitter writes the consumer layout directly, −3.2 ms/frame
            in the serving graph at the cost of a larger first compile)
            or 'slice' (vmapped dynamic_slice) for the constant-bin
            window gather (PerfConfig.pool_window_gather).
        use_pallas_crop : block-DMA window extraction in the
            variable-bin path; None = on for TPU backends
            (PerfConfig.pallas_crop).
        spatial_scale : feature scale (e.g. 1/32)
        output_size : (pooled_h, pooled_w)
        return_global : if the constant-bin fast path applies, return the
            pool as a LazyColumnWindows (global 2-tap-max map + starts)
            instead of materialized windows — the pool2->deconv1 fusion
            consumes it (ops/fused_skip.py); materialize() reproduces
            the standard result exactly. Falls back to materialized
            windows when the fast path does not apply.
    Returns:
        (N * K, pooled_h, pooled_w, C) pooled features, ordered like
        torchvision.ops.roi_pool with a list of per-image boxes
        (image-major); or a LazyColumnWindows (see return_global).
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

    # Constant-bin fast path: when box_width * scale is an integer equal to
    # pooled_w (true for skip scales 1/2 .. 1/32 of the 288-wide patch),
    # round(x*s + bw*s) - round(x*s) == bw*s for EVERY x, so
    # roi_width == pooled_w + 1 always and torchvision's bin j is exactly
    # [j, j+2) for all boxes: floor(j*(pw+1)/pw) = j and
    # ceil((j+1)*(pw+1)/pw) = j+2 on j in [0, pw). Pooling then factors
    # into a box-independent sliding 2-tap max G over columns followed by
    # a contiguous per-box crop G[:, s_k : s_k + pw] — no per-bin gather.
    bw_scaled = box_width * spatial_scale

    def _bins_are_j_j2(pw: int) -> bool:
        # torchvision's f32 bin arithmetic must give exactly [j, j+2) for
        # every bin (verified for all canonical widths; guards exotic ones)
        b = np.float32(pw + 1) / np.float32(pw)
        j = np.arange(pw, dtype=np.float32)
        s = np.floor(j * b)
        e = np.ceil((j + np.float32(1)) * b)
        return bool((s == np.arange(pw)).all() and
                    (e == np.arange(pw) + 2).all())

    if float(bw_scaled).is_integer() and pooled_w == int(bw_scaled) and \
            _bins_are_j_j2(pooled_w):
        neg_inf = jnp.array(-jnp.inf, rows.dtype)
        # right tap: rows[:, w+1], -inf past the map (torchvision clips
        # wend to w_f; a 1-tap bin at the edge keeps rows[:, w_f-1])
        right = jnp.concatenate(
            [rows[:, :, 1:], jnp.full_like(rows[:, :, :1], neg_inf)], axis=2)
        g = jnp.maximum(rows, right)
        # -inf past w_f so bins fully beyond the map give 0 like empty bins
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pooled_w), (0, 0)),
                    constant_values=neg_inf)
        start = jnp.clip(roi_start_w, 0, w_f)

        if return_global:
            from .fused_skip import LazyColumnWindows
            # zero the -inf apron up front: windows of the finite map
            # are identical to windowing then where(isfinite, ., 0)
            g0 = jnp.where(jnp.isfinite(g), g, 0).astype(rows.dtype)
            return LazyColumnWindows(g0, start.astype(jnp.int32), pooled_w)

        # NOTE: routing this gather through crop_pallas.batch_column_crop
        # was measured 2x SLOWER than the vmapped dynamic_slice here
        # (14.8 vs 7.1 ms/frame at B=4 K=64 bf16, docs/PERF.md round-3)
        # — unlike the general path below, the constant-bin contiguous
        # windows already lower to efficient block DMAs in XLA.
        # Window gather formulation. In the FULL serving graph the
        # vmapped dynamic_slice lowers to a while-loop of dynamic-
        # update-slices in row-major layout plus a ~1 GB relayout copy
        # per scale into the consumer conv's batch-minor layout; the
        # take (per-column gather) form lets XLA's gather emitter write
        # the consumer layout directly. Measured end-to-end
        # (tools/pipebisect.py, B=4 K=64 bf16): RadarNet half
        # 31.5 -> 28.2 ms/frame, full pipeline 44.1 -> 40.9. Cost: the
        # serving graph's first compile grows (~2.4 -> ~17 min through
        # this container's compile relay — one-time per config).
        # gather_mode='slice' restores the old form.
        if gather_mode == 'take':
            cols = start[:, :, None] + jnp.arange(pooled_w)[None, None, :]
            pooled = jax.vmap(
                lambda g_n, c_n: jnp.take(g_n, c_n, axis=1))(g, cols)
            pooled = jnp.moveaxis(pooled, 1, 2)  # (N, K, ph, pw, C)
        else:
            def window_one(g_n, s_k):
                return jax.lax.dynamic_slice(
                    g_n, (0, s_k, 0), (pooled_h, pooled_w, c))

            pooled = jax.vmap(
                lambda gn, sk: jax.vmap(lambda s_: window_one(gn, s_))(sk)
            )(g, start)  # (N, K, ph, pw, C)
        pooled = jnp.where(jnp.isfinite(pooled), pooled, 0).astype(rows.dtype)
        return pooled.reshape(n * k, pooled_h, pooled_w, c)

    # Static upper bound on bin width: roi_width <= ceil(W*s) + 2
    max_roi_w = int(math.ceil(box_width * spatial_scale)) + 2
    max_bin_w = int(math.ceil(max_roi_w / pooled_w)) + 1

    bin_w = roi_width.astype(jnp.float32) / pooled_w  # (N, K)
    j = jnp.arange(pooled_w, dtype=jnp.float32)
    wstart = jnp.floor(j[None, None, :] * bin_w[..., None])          # (N, K, pw)
    wend = jnp.ceil((j[None, None, :] + 1.0) * bin_w[..., None])     # (N, K, pw)
    wstart = jnp.clip(wstart.astype(jnp.int32) + roi_start_w[..., None], 0, w_f)
    wend = jnp.clip(wend.astype(jnp.int32) + roi_start_w[..., None], 0, w_f)

    # Windowed crop + static-shift max. The previous formulation gathered
    # (ph, K*pw, C) per bin tap from the full row-pooled map — ~3x the
    # output bytes in transient HBM traffic (29.5 ms for the 1/2-scale
    # skip at K=128). Here each point takes ONE contiguous window of
    # win = pw + S columns via dynamic_slice (a block gather the TPU DMAs
    # efficiently), and the bin max becomes S static shifted slices with
    # validity masks — all fusible elementwise ops.
    #
    # Bin j's taps live at local columns [wstart_l[j], wend_l[j]) with
    # wstart_l[j] - j in [0, E] (E = max_roi_w - pw) and bin width <= T,
    # so local index j + s with s in [0, E + T) covers every tap.
    # Requires x1 >= 0 (all column boxes satisfy this; boxes fully right
    # of the map degrade to empty bins -> 0 like torchvision).
    shifts = (max_roi_w - pooled_w) + max_bin_w
    win = pooled_w + shifts
    start = jnp.minimum(roi_start_w, w_f)  # (N, K)

    use_pallas = use_pallas_crop if use_pallas_crop is not None else \
        jax.default_backend() in ('tpu', 'axon')
    if use_pallas:
        # block-DMA window extraction (XLA lowers the vmapped
        # dynamic_slice below to a serialized element gather, 10-16 ms
        # for the 1/2-scale skip; the kernel is ~bandwidth-bound)
        from .crop_pallas import batch_column_crop
        windows = jnp.stack([
            batch_column_crop(rows[i], start[i], win) for i in range(n)])
    else:
        rows_p = jnp.pad(rows, ((0, 0), (0, 0), (0, win), (0, 0)))

        def window_one(rows_n, s_k):
            return jax.lax.dynamic_slice(
                rows_n, (0, s_k, 0), (pooled_h, win, c))

        windows = jax.vmap(
            lambda rn, sk: jax.vmap(lambda s_: window_one(rn, s_))(sk)
        )(rows_p, start)  # (N, K, ph, win, C)

    ws_l = wstart - start[..., None]  # (N, K, pw), >= j by construction
    we_l = wend - start[..., None]

    neg_inf = jnp.array(-jnp.inf, rows.dtype)
    jj = jnp.arange(pooled_w, dtype=jnp.int32)
    acc = None
    for s in range(shifts):
        a = jj + s  # local column of this shift per output bin
        m = (a[None, None, :] >= ws_l) & (a[None, None, :] < we_l)
        seg = windows[:, :, :, s:s + pooled_w, :]
        seg = jnp.where(m[:, :, None, :, None], seg, neg_inf)
        acc = seg if acc is None else jnp.maximum(acc, seg)
    pooled = jnp.where(jnp.isfinite(acc), acc, 0).astype(rows.dtype)
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

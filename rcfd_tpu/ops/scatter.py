"""Quasi-dense scatter/argmax composite (RadarNet inference).

TPU-native reformulation of the reference's scatter inference
(src/radarnet_main.py:534-591): the reference materializes K full-size
images, pastes each point's response crop, takes torch.max over the point
axis, rewrites the argmax index with the point's metric depth, and zeroes
pixels with no response.

Here we never materialize K full frames. Each point's crop covers a fixed
288-column window, so we express the composite as two width-indexed
scatters + one gather:

  1. scatter-max the thresholded responses into the (H, W) response map
  2. scatter-min the point index where a point's response equals the map's
     max (ties resolve to the smallest point index — identical to
     torch.max's first-occurrence argmax)
  3. gather z by winning index; zero where the max response is 0

Supports padded/ragged point sets via a validity mask (masked points never
win).

LEGACY DEPTH SEMANTICS (default ON for parity): the reference's rewrite
loop (src/radarnet_main.py:576-583) operates on torch.max's int64 argmax
map, which has two consequences baked into every released artifact:
  1. each point's metric z is TRUNCATED to an integer when written
     (torch.full_like(int64_map, fill_value=z)), so quasi-dense depth maps
     are integer meters;
  2. the sequential `where(map == point_idx, z_p)` rewrites CASCADE: a
     pixel rewritten to an integer z that equals a later point's index is
     rewritten again by that later point.
The stage-2 FusionNet was trained on maps with exactly these semantics, so
`legacy_depth_semantics=True` reproduces them bit-for-bit (as a
lax.fori_loop over the point axis). Set False for the clean float gather
(documented fix; better depth precision).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _legacy_rewrite(idx_map, response_map, z_values, valid, n_points: int):
    """Bit-exact emulation of the reference's index->z rewrite loop.

    The reference loops over the N REAL points only; with padded point
    sets the padding iterations must be skipped, otherwise a padding
    point p (z=0) rewrites any pixel whose cascaded integer depth equals
    p to 0. The `valid` gate reproduces the real-points-only loop.
    """
    z_int = z_values.astype(jnp.int32)  # trunc toward zero (z > 0)
    valid = valid.astype(jnp.bool_)
    # empty pixels have argmax 0 in the reference (max of all-zero tiles)
    m = jnp.where(response_map > 0, idx_map, 0).astype(jnp.int32)

    def body(p, m):
        return jnp.where(valid[p] & (m == p), z_int[p], m)

    m = jax.lax.fori_loop(0, n_points, body, m)
    return jnp.where(response_map > 0, m.astype(response_map.dtype), 0.0)


def scatter_quasi_dense(response_crops, x_positions, z_values, valid,
                        image_height: int, image_width: int,
                        patch_size: Tuple[int, int],
                        threshold: float = 0.5,
                        legacy_depth_semantics: bool = True):
    """Scatter per-point response crops into quasi-dense depth/response maps.

    Arg(s):
        response_crops : (K, ph, pw) sigmoid responses for each point's patch
        x_positions : (K,) padded-coordinate x of each point (original x +
            pw // 2, as produced by the datasets / validate box builders)
        z_values : (K,) metric depth of each point
        valid : (K,) bool mask for real (non-padding) points
        image_height, image_width : original (unpadded) image size
        patch_size : (ph, pw)
        threshold : responses below this are zeroed (reference uses 0.5)
    Returns:
        depth_map : (H, W) quasi-dense depth
        response_map : (H, W) confidence map
    """
    k, ph, pw = response_crops.shape
    pad = pw // 2
    h, w = image_height, image_width
    crop_top = h - ph

    vals = jnp.where(response_crops < threshold, 0.0, response_crops)
    vals = jnp.where(valid[:, None, None], vals, 0.0)

    # Column of crop pixel (k, j) in unpadded image coords:
    # padded coords place the crop at [x - pad, x + pad); stripping the pad
    # columns shifts by another -pad.
    x_int = x_positions.astype(jnp.int32)
    cols = x_int[:, None] - 2 * pad + jnp.arange(pw, dtype=jnp.int32)[None, :]
    in_bounds = (cols >= 0) & (cols < w)
    cols_c = jnp.clip(cols, 0, w - 1)
    vals = jnp.where(in_bounds[None, :, :], vals.transpose(1, 0, 2), 0.0)
    # vals now (ph, K, pw)

    response_map = jnp.zeros((h, w), dtype=response_crops.dtype)
    response_map = response_map.at[crop_top:, cols_c].max(vals)

    # Winning point index: smallest k whose value equals the local max (> 0).
    current = response_map[crop_top:, cols_c]  # (ph, K, pw)
    k_idx = jnp.arange(k, dtype=jnp.int32)[None, :, None]
    candidate = jnp.where((vals > 0) & (vals == current), k_idx, k)
    idx_map = jnp.full((h, w), k, dtype=jnp.int32)
    idx_map = idx_map.at[crop_top:, cols_c].min(candidate)

    # accumulate in the crop dtype (winner comparisons are bit-exact in any
    # dtype), return f32 maps so bf16 serving doesn't round the bridge
    # codec quantization or the metric z gather downstream
    response_map = response_map.astype(jnp.float32)
    if legacy_depth_semantics:
        depth_map = _legacy_rewrite(idx_map, response_map, z_values, valid, k)
    else:
        z_ext = jnp.concatenate([z_values.astype(jnp.float32),
                                 jnp.zeros((1,), jnp.float32)])
        depth_map = jnp.where(response_map > 0, z_ext[idx_map], 0.0)
    return depth_map, response_map

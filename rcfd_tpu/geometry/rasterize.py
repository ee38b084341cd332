"""Depth-map rasterization + z-buffer merging (jittable scatter kernels).

Replaces the reference's per-point Python loops
(points_to_depth_map, setup/setup_dataset_nuscenes.py:829-855; z-buffer
update, :445-457) with XLA scatter ops. The reference's sequential
insert-order semantics for duplicate pixels is replaced by a canonical
scatter-min (nearest-depth wins), which equals the reference's occlusion
rule for cross-frame merging; within-frame duplicate pixels resolve to the
nearest return instead of the last-iterated one (documented divergence —
deterministic, and physically the right choice).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

_INF = jnp.inf


def points_to_depth_map(xy, depth, mask, image_height: int, image_width: int,
                        quantize_round: bool = True):
    """Scatter (N, 2) projected points into an (H, W) depth map.

    Duplicate pixels keep the minimum depth. Masked points are ignored.
    """
    xy = jnp.asarray(xy)
    depth = jnp.asarray(depth)
    if quantize_round:
        # np.round (banker's) in the reference; half-to-even matches numpy
        xi = jnp.round(xy[..., 0]).astype(jnp.int32)
        yi = jnp.round(xy[..., 1]).astype(jnp.int32)
    else:
        xi = xy[..., 0].astype(jnp.int32)
        yi = xy[..., 1].astype(jnp.int32)

    inb = (xi >= 0) & (xi < image_width) & (yi >= 0) & (yi < image_height)
    use = mask & inb if mask is not None else inb
    xi = jnp.clip(xi, 0, image_width - 1)
    yi = jnp.clip(yi, 0, image_height - 1)
    vals = jnp.where(use, depth, _INF)

    zbuf = jnp.full((image_height, image_width), _INF, depth.dtype)
    zbuf = zbuf.at[yi, xi].min(vals)
    return jnp.where(jnp.isfinite(zbuf), zbuf, 0.0)


def z_buffer_merge(main_depth_map, xy, depth, mask):
    """Merge projected points into an existing depth map with the
    reference's occlusion rule (setup/setup_dataset_nuscenes.py:445-457):
    write if the pixel is empty, or if the new depth is strictly nearer.
    Vectorized as elementwise min with empty-fill."""
    h, w = main_depth_map.shape
    incoming = points_to_depth_map(xy, depth, mask, h, w)
    valid_main = main_depth_map > 0
    valid_in = incoming > 0
    merged = jnp.where(
        valid_main & valid_in, jnp.minimum(main_depth_map, incoming),
        jnp.where(valid_in, incoming, main_depth_map))
    return merged


def zero_boxes(depth_map, boxes_np):
    """Zero out axis-aligned pixel boxes (mover removal,
    setup/setup_dataset_nuscenes.py:361-370). Host-side numpy (the box list
    is tiny and ragged)."""
    out = np.asarray(depth_map).copy()
    for (min_x, min_y, max_x, max_y) in boxes_np:
        out[int(min_y):int(max_y), int(min_x):int(max_x)] = 0
    return out


def zero_mask(depth_map, mover_mask):
    """Zero out mover pixels given a boolean H x W panoptic mask (denseGT
    variant, setup/setup_dataset_nuscenes_with_denseGT.py:374-379)."""
    return jnp.where(jnp.asarray(mover_mask), 0.0, depth_map)


def depth_map_to_points(depth_map):
    """Inverse of rasterization: (H, W) map -> y, x, z arrays of nonzero
    pixels (host-side; ragged output)."""
    dm = np.asarray(depth_map)
    ys, xs = np.nonzero(dm)
    return xs, ys, dm[ys, xs]

"""Depth-map reprojection + multi-frame merging (jittable, static shapes).

The reference's multi-frame GT builder (merge_lidar_point_clouds,
setup/setup_dataset_nuscenes.py:252-614) loops in Python per point:
rasterize neighbor lidar -> zero mover boxes -> backproject -> re-pose into
the main frame -> re-project -> zero main-frame movers -> sequential
z-buffer update. Here the whole neighbor-frame step is ONE static-shape
kernel over the pixel grid: every pixel of the neighbor depth map is
backprojected (invalid ones masked), transformed, projected and
scatter-min-merged. This changes the complexity class from
O(points x python) to one fused XLA program per frame.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .rasterize import points_to_depth_map
from .transforms import backproject_to_camera, transform_points, view_points


def depth_map_pixel_grid(height: int, width: int, dtype=jnp.float32):
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=dtype),
                          jnp.arange(width, dtype=dtype), indexing='ij')
    return jnp.stack([xs.ravel(), ys.ravel()], axis=-1)  # (H*W, 2) as (x, y)


def reproject_depth_map(src_depth_map,
                        src_intrinsics,
                        src_to_dst_matrix,
                        dst_intrinsics,
                        dst_height: int,
                        dst_width: int,
                        src_mover_mask=None,
                        dst_mover_mask=None,
                        min_distance_from_camera: float = 1.0):
    """Reproject a source-camera depth map into a destination camera.

    Arg(s):
        src_depth_map : (H_s, W_s) metric depth in the source camera
        src_intrinsics / dst_intrinsics : 3x3 K matrices
        src_to_dst_matrix : 4x4 rigid transform src camera -> dst camera
            (compose(camera_to_sensor..., sensor_to_camera...) chains)
        src_mover_mask : optional (H_s, W_s) bool, True = moving object in
            the source frame (zeroed before lifting)
        dst_mover_mask : optional (H_d, W_d) bool, True = moving object in
            the destination frame (projected points landing there dropped)
        min_distance_from_camera : visibility threshold (reference uses 1 m)
    Returns:
        (H_d, W_d) depth map of reprojected points (0 where none)
    """
    h_s, w_s = src_depth_map.shape
    depth = src_depth_map
    if src_mover_mask is not None:
        depth = jnp.where(src_mover_mask, 0.0, depth)

    xy = depth_map_pixel_grid(h_s, w_s, depth.dtype)
    z = depth.ravel()
    valid = z > 0

    points_src = backproject_to_camera(xy, z, src_intrinsics)
    points_dst = transform_points(points_src, src_to_dst_matrix)

    z_dst = points_dst[:, 2]
    proj = view_points(points_dst, dst_intrinsics, normalize=True)
    x, y = proj[:, 0], proj[:, 1]
    mask = valid & (z_dst > min_distance_from_camera) & \
        (x > 1) & (x < dst_width - 1) & (y > 1) & (y < dst_height - 1)

    out = points_to_depth_map(
        jnp.stack([x, y], axis=-1), z_dst, mask, dst_height, dst_width)
    if dst_mover_mask is not None:
        out = jnp.where(dst_mover_mask, 0.0, out)
    return out


def merge_neighbor_into_main(main_depth_map,
                             neighbor_depth_map,
                             neighbor_intrinsics,
                             neighbor_to_main_matrix,
                             main_intrinsics,
                             neighbor_mover_mask=None,
                             main_mover_mask=None,
                             min_distance_from_camera: float = 1.0):
    """One step of the reference's multi-frame merge: reproject a neighbor
    frame into the main camera and z-buffer-merge (keep nearer depth, fill
    empty pixels — setup/setup_dataset_nuscenes.py:445-457)."""
    h, w = main_depth_map.shape
    reprojected = reproject_depth_map(
        neighbor_depth_map, neighbor_intrinsics, neighbor_to_main_matrix,
        main_intrinsics, h, w,
        src_mover_mask=neighbor_mover_mask,
        dst_mover_mask=main_mover_mask,
        min_distance_from_camera=min_distance_from_camera)
    valid_main = main_depth_map > 0
    valid_in = reprojected > 0
    return jnp.where(
        valid_main & valid_in, jnp.minimum(main_depth_map, reprojected),
        jnp.where(valid_in, reprojected, main_depth_map))

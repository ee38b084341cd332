"""Batched rigid-transform + pinhole projection kernels (jittable).

TPU-native replacement for the reference's per-point Python loops over
nuscenes-devkit pose chains (setup/setup_dataset_nuscenes.py:128-250): the
4-step sensor->ego->global->ego'->camera' chain becomes one composed 4x4
matrix applied to an (N, 3) batch, and the pinhole projection + visibility
mask are vectorized. These kernels are pure jnp and also run fine under
numpy inputs on the host for offline preprocessing.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def quaternion_to_rotation_matrix(q):
    """(w, x, y, z) quaternion -> 3x3 rotation matrix (pyquaternion
    convention used by nuScenes pose records)."""
    q = jnp.asarray(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = jnp.where(n > 0, 2.0 / n, 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack([
        jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
        jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
        jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
    ], axis=-2)


def pose_matrix(rotation_q, translation, inverse: bool = False):
    """4x4 homogeneous transform from a nuScenes pose record.

    inverse=True gives the global->frame direction (translate(-t) then
    rotate(R^T), exactly the reference's inverse steps at
    setup/setup_dataset_nuscenes.py:174-180)."""
    r = quaternion_to_rotation_matrix(jnp.asarray(rotation_q, jnp.float32))
    t = jnp.asarray(translation, jnp.float32)
    m = jnp.eye(4, dtype=jnp.float32)
    if inverse:
        m = m.at[:3, :3].set(r.T)
        m = m.at[:3, 3].set(-r.T @ t)
    else:
        m = m.at[:3, :3].set(r)
        m = m.at[:3, 3].set(t)
    return m


def compose(*matrices):
    """Compose 4x4 transforms; compose(A, B) applies B first then A."""
    out = jnp.eye(4, dtype=jnp.float32)
    for m in matrices:
        out = out @ m
    return out


def transform_points(points, matrix):
    """Apply a 4x4 transform to (N, 3) points."""
    points = jnp.asarray(points)
    r = matrix[:3, :3].astype(points.dtype)
    t = matrix[:3, 3].astype(points.dtype)
    return points @ r.T + t


def sensor_to_camera_matrix(sensor_pose, sensor_ego_pose, camera_ego_pose,
                            camera_pose):
    """The 4-step chain sensor->ego->global->ego'->camera'
    (setup/setup_dataset_nuscenes.py:161-180). Each pose is a dict with
    'rotation' (w,x,y,z) and 'translation' (3,)."""
    return compose(
        pose_matrix(camera_pose['rotation'], camera_pose['translation'],
                    inverse=True),
        pose_matrix(camera_ego_pose['rotation'], camera_ego_pose['translation'],
                    inverse=True),
        pose_matrix(sensor_ego_pose['rotation'], sensor_ego_pose['translation']),
        pose_matrix(sensor_pose['rotation'], sensor_pose['translation']),
    )


def camera_to_sensor_matrix(sensor_pose, sensor_ego_pose, camera_ego_pose,
                            camera_pose):
    """Inverse chain camera->ego->global->ego'->sensor
    (camera_to_lidar_frame, setup/setup_dataset_nuscenes.py:206-250)."""
    return compose(
        pose_matrix(sensor_pose['rotation'], sensor_pose['translation'],
                    inverse=True),
        pose_matrix(sensor_ego_pose['rotation'], sensor_ego_pose['translation'],
                    inverse=True),
        pose_matrix(camera_ego_pose['rotation'], camera_ego_pose['translation']),
        pose_matrix(camera_pose['rotation'], camera_pose['translation']),
    )


def view_points(points_cam, intrinsics, normalize: bool = True):
    """Pinhole projection of (N, 3) camera-frame points with a 3x3 K
    (nuscenes view_points semantics). Returns (N, 3): x, y, 1 (normalized)
    or K @ p (not normalized)."""
    points_cam = jnp.asarray(points_cam)
    k = jnp.asarray(intrinsics, points_cam.dtype)
    proj = points_cam @ k.T
    if normalize:
        z = proj[..., 2:3]
        proj = proj / jnp.where(z == 0, 1.0, z)
    return proj


def project_points_to_image(points_sensor, transform, intrinsics,
                            image_height: int, image_width: int,
                            min_distance_from_camera: float = 1.0):
    """Full projection: rigid transform -> pinhole -> visibility mask
    (point_cloud_to_image, setup/setup_dataset_nuscenes.py:128-204).

    Returns (xy (N, 2), depth (N,), mask (N,) bool). Static shapes: invalid
    points are masked, not dropped."""
    points_cam = transform_points(points_sensor, transform)
    depth = points_cam[..., 2]
    proj = view_points(points_cam, intrinsics, normalize=True)
    x, y = proj[..., 0], proj[..., 1]
    mask = (depth > min_distance_from_camera) & \
        (x > 1) & (x < image_width - 1) & \
        (y > 1) & (y < image_height - 1)
    return jnp.stack([x, y], axis=-1), depth, mask


def backproject_to_camera(xy, depth, intrinsics):
    """Lift (N, 2) pixels + (N,) depths into (N, 3) camera-frame points
    (setup/setup_dataset_nuscenes.py:377-384)."""
    xy = jnp.asarray(xy)
    ones = jnp.ones_like(xy[..., :1])
    homo = jnp.concatenate([xy, ones], axis=-1)
    k_inv = jnp.linalg.inv(jnp.asarray(intrinsics, jnp.float32)).astype(xy.dtype)
    rays = homo @ k_inv.T
    return rays * depth[..., None]

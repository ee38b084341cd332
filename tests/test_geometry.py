"""Geometry kernel tests: quaternions, pose chains, projection round-trip,
z-buffer merge semantics."""

import pytest
import numpy as np

import jax.numpy as jnp

from rcfd_tpu.geometry import (backproject_to_camera, camera_to_sensor_matrix,
                               compose, points_to_depth_map, pose_matrix,
                               project_points_to_image,
                               quaternion_to_rotation_matrix,
                               sensor_to_camera_matrix, transform_points,
                               view_points, z_buffer_merge)


pytestmark = pytest.mark.smoke


def _random_quat(rng):
    q = rng.standard_normal(4)
    return q / np.linalg.norm(q)


def test_quaternion_rotation_matrix_properties(rng):
    for _ in range(5):
        q = _random_quat(rng)
        r = np.asarray(quaternion_to_rotation_matrix(q))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99


def test_quaternion_known_rotation():
    # 90 degrees about z: (w, x, y, z) = (cos45, 0, 0, sin45)
    q = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    r = np.asarray(quaternion_to_rotation_matrix(q))
    np.testing.assert_allclose(
        r @ np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), atol=1e-6)


def test_pose_matrix_inverse(rng):
    q = _random_quat(rng)
    t = rng.standard_normal(3)
    fwd = pose_matrix(q, t)
    inv = pose_matrix(q, t, inverse=True)
    np.testing.assert_allclose(
        np.asarray(compose(inv, fwd)), np.eye(4), atol=1e-5)


def test_pose_chain_round_trip(rng):
    """sensor->camera then camera->sensor must be identity."""
    poses = []
    for _ in range(4):
        poses.append({'rotation': _random_quat(rng),
                      'translation': rng.standard_normal(3)})
    fwd = sensor_to_camera_matrix(*poses)
    bwd = camera_to_sensor_matrix(*poses)
    np.testing.assert_allclose(np.asarray(compose(bwd, fwd)), np.eye(4),
                               atol=1e-4)

    points = rng.standard_normal((10, 3)).astype(np.float32)
    out = transform_points(transform_points(points, fwd), bwd)
    np.testing.assert_allclose(np.asarray(out), points, atol=1e-4)


def test_projection_backprojection_round_trip(rng):
    k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    points = np.stack([
        rng.uniform(-5, 5, 20), rng.uniform(-3, 3, 20), rng.uniform(2, 50, 20)
    ], axis=1).astype(np.float32)
    proj = np.asarray(view_points(points, k, normalize=True))
    lifted = np.asarray(backproject_to_camera(proj[:, :2], points[:, 2], k))
    np.testing.assert_allclose(lifted, points, rtol=1e-4, atol=1e-4)


def test_project_points_to_image_mask(rng):
    k = np.array([[100.0, 0, 50], [0, 100.0, 40], [0, 0, 1]], np.float32)
    ident = np.eye(4, dtype=np.float32)
    points = np.array([
        [0.0, 0.0, 10.0],    # center, visible
        [0.0, 0.0, 0.5],     # too close
        [100.0, 0.0, 10.0],  # off image
        [0.0, 0.0, -5.0],    # behind camera
    ], np.float32)
    xy, depth, mask = project_points_to_image(points, ident, k, 80, 100)
    mask = np.asarray(mask)
    assert mask.tolist() == [True, False, False, False]
    np.testing.assert_allclose(np.asarray(xy)[0], [50, 40], atol=1e-4)


def _sequential_merge(main, xs, ys, zs):
    """Literal port of the reference z-buffer update rule
    (setup/setup_dataset_nuscenes.py:445-457)."""
    out = main.copy()
    valid = (out > 0).astype(int)
    for x, y, z in zip(xs, ys, zs):
        if valid[y, x] == 1 and z < out[y, x]:
            out[y, x] = z
        elif valid[y, x] != 1:
            out[y, x] = z
            valid[y, x] = 1
    return out


def test_z_buffer_merge_matches_sequential_rule(rng):
    h, w = 12, 16
    main = rng.random((h, w), dtype=np.float32) * 50
    main[rng.random((h, w)) < 0.5] = 0.0

    n = 40
    xs = rng.integers(0, w, n)
    ys = rng.integers(0, h, n)
    zs = (rng.random(n, dtype=np.float32) * 50 + 1)
    # unique pixels: sequential rule and scatter-min agree exactly
    seen = set()
    keep = []
    for i in range(n):
        if (xs[i], ys[i]) not in seen:
            seen.add((xs[i], ys[i]))
            keep.append(i)
    xs, ys, zs = xs[keep], ys[keep], zs[keep]

    expected = _sequential_merge(main, xs, ys, zs)
    xy = np.stack([xs, ys], axis=1).astype(np.float32)
    merged = np.asarray(z_buffer_merge(
        jnp.asarray(main), jnp.asarray(xy), jnp.asarray(zs),
        jnp.ones(len(xs), bool)))
    np.testing.assert_allclose(merged, expected, rtol=1e-6)


def test_points_to_depth_map_min_wins():
    xy = np.array([[3.0, 2.0], [3.0, 2.0], [5.0, 1.0]], np.float32)
    z = np.array([10.0, 4.0, 7.0], np.float32)
    dm = np.asarray(points_to_depth_map(
        jnp.asarray(xy), jnp.asarray(z), jnp.ones(3, bool), 8, 8))
    assert dm[2, 3] == 4.0
    assert dm[1, 5] == 7.0
    assert dm.sum() == 11.0

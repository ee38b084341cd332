"""Reprojection kernel tests: rendering a synthetic 3D scene from two
cameras and reprojecting one view into the other must match the direct
render at the surviving pixels."""

import numpy as np

import jax.numpy as jnp

from rcfd_tpu.geometry import (compose, points_to_depth_map, pose_matrix,
                               project_points_to_image)
import pytest

from rcfd_tpu.geometry.reproject import (merge_neighbor_into_main,
                                         reproject_depth_map)

H, W = 60, 80
K = np.array([[80.0, 0, 40], [0, 80.0, 30], [0, 0, 1]], np.float32)


def _render(points_world, world_to_cam):
    xy, z, mask = project_points_to_image(points_world, world_to_cam, K, H, W)
    return np.asarray(points_to_depth_map(xy, z, mask, H, W))


def test_reproject_identity():
    rng = np.random.default_rng(0)
    points = np.stack([
        rng.uniform(-10, 10, 200), rng.uniform(-5, 5, 200),
        rng.uniform(5, 40, 200)], axis=1).astype(np.float32)
    ident = np.eye(4, dtype=np.float32)
    dm = _render(points, ident)
    re = np.asarray(reproject_depth_map(jnp.asarray(dm), K, ident, K, H, W))
    valid = (dm > 0) & (re > 0)
    assert valid.sum() > 100
    np.testing.assert_allclose(re[valid], dm[valid], rtol=1e-3)


def test_reproject_between_cameras():
    rng = np.random.default_rng(1)
    points = np.stack([
        rng.uniform(-10, 10, 500), rng.uniform(-5, 5, 500),
        rng.uniform(8, 40, 500)], axis=1).astype(np.float32)

    # camera A at origin; camera B translated by 0.5 m in x with a small yaw
    yaw = 0.05
    q = np.array([np.cos(yaw / 2), 0, np.sin(yaw / 2), 0], np.float32)
    cam_b_pose = pose_matrix(q, np.array([0.5, 0.0, 0.0]))  # B -> world
    world_to_b = pose_matrix(q, np.array([0.5, 0.0, 0.0]), inverse=True)
    ident = np.eye(4, dtype=np.float32)

    dm_a = _render(points, ident)
    dm_b = _render(points, np.asarray(world_to_b))

    # reproject B's depth map into A: src->dst = B->world (then world==A)
    re_a = np.asarray(reproject_depth_map(
        jnp.asarray(dm_b), K, cam_b_pose, K, H, W))

    # compare where both have values: small quantization jitter allowed
    valid = (dm_a > 0) & (re_a > 0)
    assert valid.sum() > 50
    diff = np.abs(re_a[valid] - dm_a[valid])
    # most pixels agree to sub-decimeter (rasterization shifts a few)
    assert np.median(diff) < 0.1
    assert (diff < 0.5).mean() > 0.8


def test_mover_masks_drop_points():
    rng = np.random.default_rng(2)
    points = np.stack([
        rng.uniform(-10, 10, 300), rng.uniform(-5, 5, 300),
        rng.uniform(8, 40, 300)], axis=1).astype(np.float32)
    ident = np.eye(4, dtype=np.float32)
    dm = _render(points, ident)

    src_mask = np.zeros((H, W), bool)
    src_mask[:, :W // 2] = True  # movers on the left half
    re = np.asarray(reproject_depth_map(
        jnp.asarray(dm), K, ident, K, H, W,
        src_mover_mask=jnp.asarray(src_mask)))
    assert re[:, :W // 2 - 1].sum() == 0  # nothing lifted from masked region


@pytest.mark.smoke
def test_merge_keeps_nearer_depth():
    main = np.zeros((H, W), np.float32)
    main[10, 10] = 20.0
    main[20, 20] = 5.0

    neighbor = np.zeros((H, W), np.float32)
    # identity reprojection: pixel (10, 10) with nearer depth, (20, 20) farther
    neighbor[10, 10] = 12.0
    neighbor[20, 20] = 9.0
    neighbor[30, 30] = 7.0  # fills an empty pixel

    ident = np.eye(4, dtype=np.float32)
    merged = np.asarray(merge_neighbor_into_main(
        jnp.asarray(main), jnp.asarray(neighbor), K, ident, K))
    assert merged[10, 10] == 12.0
    assert merged[20, 20] == 5.0
    assert merged[30, 30] == 7.0

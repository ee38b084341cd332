"""nuScenes-devkit adapter: pulls poses/intrinsics/point clouds from the DB
and drives the jittable geometry kernels.

The devkit import is gated — everything numeric lives in
rcfd_tpu.geometry.{transforms,rasterize,reproject} and is fully testable
without nuScenes. This module replaces the reference's per-point Python
loops (setup/setup_dataset_nuscenes.py:128-797) with batched kernels:
projection is one fused program; the multi-frame merge is one
reproject+scatter-min program per neighbor frame.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from . import rasterize, transforms
from .reproject import merge_neighbor_into_main


def _require_nuscenes():
    try:
        from nuscenes.nuscenes import NuScenes  # noqa: F401
        return True
    except ImportError as e:
        raise ImportError(
            'nuscenes-devkit is required for dataset preprocessing. '
            'Install it in the deployment environment; the geometry kernels '
            'themselves are devkit-free (rcfd_tpu.geometry).') from e


def get_sensor_poses(nusc, sample_data_token: str):
    """(calibrated_sensor pose, ego pose) dicts for a sample_data record."""
    sd = nusc.get('sample_data', sample_data_token)
    sensor_pose = nusc.get('calibrated_sensor', sd['calibrated_sensor_token'])
    ego_pose = nusc.get('ego_pose', sd['ego_pose_token'])
    return sensor_pose, ego_pose


def get_camera_intrinsics(nusc, camera_token: str) -> np.ndarray:
    sd = nusc.get('sample_data', camera_token)
    cs = nusc.get('calibrated_sensor', sd['calibrated_sensor_token'])
    return np.asarray(cs['camera_intrinsic'], np.float32)


def get_image_shape(nusc, camera_token: str) -> Tuple[int, int]:
    sd = nusc.get('sample_data', camera_token)
    return int(sd['height']), int(sd['width'])


def sensor_to_camera_matrix(nusc, sensor_token: str, camera_token: str):
    """4x4 sensor frame -> camera frame (the reference's 4-step chain,
    setup/setup_dataset_nuscenes.py:161-180)."""
    s_pose, s_ego = get_sensor_poses(nusc, sensor_token)
    c_pose, c_ego = get_sensor_poses(nusc, camera_token)
    return np.asarray(transforms.sensor_to_camera_matrix(
        s_pose, s_ego, c_ego, c_pose))


def camera_to_camera_matrix(nusc, src_camera_token: str, dst_camera_token: str):
    """4x4 src camera -> dst camera (for depth-map reprojection)."""
    src_pose, src_ego = get_sensor_poses(nusc, src_camera_token)
    dst_pose, dst_ego = get_sensor_poses(nusc, dst_camera_token)
    # src camera -> global
    to_global = transforms.compose(
        transforms.pose_matrix(src_ego['rotation'], src_ego['translation']),
        transforms.pose_matrix(src_pose['rotation'], src_pose['translation']))
    # global -> dst camera
    to_dst = transforms.compose(
        transforms.pose_matrix(dst_pose['rotation'], dst_pose['translation'],
                               inverse=True),
        transforms.pose_matrix(dst_ego['rotation'], dst_ego['translation'],
                               inverse=True))
    return np.asarray(transforms.compose(to_dst, to_global))


def load_point_cloud(nusc, sensor_token: str, sensor: str = 'lidar'):
    """(N, 3) points in the sensor frame. Radar keeps ALL returns
    (RadarPointCloud.disable_filters(), reference :616-797)."""
    _require_nuscenes()
    from nuscenes.utils.data_classes import LidarPointCloud, RadarPointCloud
    sd = nusc.get('sample_data', sensor_token)
    path = os.path.join(nusc.dataroot, sd['filename'])
    if sensor == 'lidar':
        pc = LidarPointCloud.from_file(path)
    else:
        RadarPointCloud.disable_filters()
        pc = RadarPointCloud.from_file(path)
        RadarPointCloud.default_filters()
    return pc.points[:3].T.astype(np.float32)  # (N, 3)


def project_sensor_to_camera(nusc, points_sensor, sensor_token: str,
                             camera_token: str,
                             min_distance_from_camera: float = 1.0):
    """Project sensor-frame points into the camera: (xy (N,2), z (N,),
    mask (N,)). Batched kernel replacing point_cloud_to_image."""
    h, w = get_image_shape(nusc, camera_token)
    k = get_camera_intrinsics(nusc, camera_token)
    m = sensor_to_camera_matrix(nusc, sensor_token, camera_token)
    xy, z, mask = transforms.project_points_to_image(
        points_sensor, m, k, h, w,
        min_distance_from_camera=min_distance_from_camera)
    return np.asarray(xy), np.asarray(z), np.asarray(mask)


def mover_boxes_image_frame(nusc, camera_token: str) -> np.ndarray:
    """Axis-aligned pixel boxes of movers (vehicle.* / human.*) visible in a
    camera (reference :361-370). Returns (M, 4) [min_x, min_y, max_x, max_y]."""
    _require_nuscenes()
    from nuscenes.utils.geometry_utils import BoxVisibility, view_points
    _, boxes, camera_intrinsic = nusc.get_sample_data(
        camera_token, box_vis_level=BoxVisibility.ANY,
        use_flat_vehicle_coordinates=False)
    out = []
    for box in boxes:
        if box.name[:7] == 'vehicle' or box.name[:5] == 'human':
            corners = view_points(box.corners(), view=camera_intrinsic,
                                  normalize=True)[:2, :]
            out.append([int(np.min(corners.T[:, 0])),
                        int(np.min(corners.T[:, 1])),
                        int(np.max(corners.T[:, 0])),
                        int(np.max(corners.T[:, 1]))])
    return np.asarray(out, np.int64).reshape(-1, 4)


def boxes_to_mask(boxes: np.ndarray, height: int, width: int) -> np.ndarray:
    mask = np.zeros((height, width), bool)
    for (min_x, min_y, max_x, max_y) in boxes:
        mask[max(min_y, 0):max(max_y, 0), max(min_x, 0):max(max_x, 0)] = True
    return mask


def load_panoptic_mask(panoptic_dirpath: str, camera_token: str,
                       height: int, width: int) -> Optional[np.ndarray]:
    """Boolean H x W mover mask saved by gen_panoptic_seg (one .npy per
    camera sample_data token)."""
    path = os.path.join(panoptic_dirpath, camera_token + '.npy')
    if not os.path.exists(path):
        return None
    mask = np.load(path)
    assert mask.shape == (height, width)
    return mask.astype(bool)


def rasterize_sensor_depth(nusc, sensor_token: str, camera_token: str,
                           sensor: str = 'lidar',
                           min_distance_from_camera: float = 1.0) -> np.ndarray:
    """Single-frame sensor depth map in the camera (points_to_depth_map)."""
    h, w = get_image_shape(nusc, camera_token)
    points = load_point_cloud(nusc, sensor_token, sensor)
    xy, z, mask = project_sensor_to_camera(
        nusc, points, sensor_token, camera_token,
        min_distance_from_camera=min_distance_from_camera)
    return np.asarray(rasterize.points_to_depth_map(xy, z, mask, h, w))


def _iterate_samples(nusc, sample, direction: str, n_steps: int):
    """Yield up to n_steps neighboring keyframe samples."""
    current = sample
    produced = 0
    while current[direction] != '' and produced < n_steps:
        current = nusc.get('sample', current[direction])
        yield current
        produced += 1


def merge_point_clouds(nusc,
                       current_sample_token: str,
                       n_forward: int,
                       n_backward: int,
                       sensor: str = 'lidar',
                       use_mover_boxes: bool = True,
                       panoptic_dirpath: Optional[str] = None):
    """Multi-frame merge into the main CAM_FRONT frame.

    TPU-native equivalent of merge_lidar_point_clouds /
    merge_radar_point_clouds (setup/setup_dataset_nuscenes.py:252-797):
    neighbor frames are rasterized in their own camera, mover-filtered
    (boxes or panoptic masks; radar skips filtering like the reference),
    then reprojected + z-buffer merged in one kernel per frame.

    Returns:
        (2, N) array of x, y pixel positions; (N,) depths
    """
    sensor_key = 'LIDAR_TOP' if sensor == 'lidar' else 'RADAR_FRONT'
    sample = nusc.get('sample', current_sample_token)
    main_sensor_token = sample['data'][sensor_key]
    main_camera_token = sample['data']['CAM_FRONT']

    h, w = get_image_shape(nusc, main_camera_token)
    main_k = get_camera_intrinsics(nusc, main_camera_token)

    main_depth = rasterize_sensor_depth(
        nusc, main_sensor_token, main_camera_token, sensor)

    filter_movers = use_mover_boxes and sensor == 'lidar'
    main_mask = None
    if filter_movers:
        if panoptic_dirpath is not None:
            main_mask = load_panoptic_mask(panoptic_dirpath,
                                           main_camera_token, h, w)
        if main_mask is None:
            main_mask = boxes_to_mask(
                mover_boxes_image_frame(nusc, main_camera_token), h, w)

    for direction, n_steps in [('next', n_forward), ('prev', n_backward)]:
        for neighbor in _iterate_samples(nusc, sample, direction, n_steps):
            n_sensor_token = neighbor['data'][sensor_key]
            n_camera_token = neighbor['data']['CAM_FRONT']
            n_k = get_camera_intrinsics(nusc, n_camera_token)

            neighbor_depth = rasterize_sensor_depth(
                nusc, n_sensor_token, n_camera_token, sensor)

            n_mask = None
            if filter_movers:
                if panoptic_dirpath is not None:
                    n_mask = load_panoptic_mask(panoptic_dirpath,
                                                n_camera_token, h, w)
                if n_mask is None:
                    n_mask = boxes_to_mask(
                        mover_boxes_image_frame(nusc, n_camera_token), h, w)

            n_to_main = camera_to_camera_matrix(nusc, n_camera_token,
                                                main_camera_token)
            main_depth = np.asarray(merge_neighbor_into_main(
                main_depth, neighbor_depth, n_k, n_to_main, main_k,
                neighbor_mover_mask=n_mask, main_mover_mask=main_mask))

    xs, ys, zs = rasterize.depth_map_to_points(main_depth)
    return np.stack([xs, ys], axis=0).astype(np.float32), zs.astype(np.float32)


# ---------------------------------------------------------------------------
# Dense-GT variant: walk every intermediate lidar SWEEP (not just keyframes)
# and pair each sweep with its nearest-timestamp camera image
# (reference setup/setup_dataset_nuscenes_with_denseGT.py:337-350, 1096-1129)
# ---------------------------------------------------------------------------

def scene_camera_records(nusc, scene, channel: str = 'CAM_FRONT'):
    """All camera sample_data records of a scene (keyframes + sweeps),
    sorted by timestamp."""
    sample = nusc.get('sample', scene['first_sample_token'])
    sd_token = sample['data'][channel]
    # rewind to the first sample_data in the chain
    sd = nusc.get('sample_data', sd_token)
    while sd['prev'] != '':
        sd = nusc.get('sample_data', sd['prev'])
    records = []
    while True:
        records.append(sd)
        if sd['next'] == '':
            break
        sd = nusc.get('sample_data', sd['next'])
    records.sort(key=lambda r: r['timestamp'])
    return records


def closest_camera_token(camera_records, timestamp: int) -> str:
    """Nearest-timestamp camera sample_data token (the reference's
    get_closest_camera_image_to_lidar_scan_in_a_sample)."""
    timestamps = [r['timestamp'] for r in camera_records]
    idx = int(np.argmin(np.abs(np.asarray(timestamps) - timestamp)))
    return camera_records[idx]['token']


def merge_lidar_sweeps_dense(nusc,
                             current_sample_token: str,
                             n_forward: int,
                             n_backward: int,
                             camera_records,
                             panoptic_dirpath: Optional[str] = None):
    """Dense-GT merge: accumulate up to n_forward/n_backward intermediate
    lidar SWEEPS (the full 20 Hz sample_data chain), pairing each sweep with
    its closest camera image and removing movers with panoptic masks.

    Returns (2, N) x,y and (N,) z like merge_point_clouds.
    """
    sample = nusc.get('sample', current_sample_token)
    main_lidar_token = sample['data']['LIDAR_TOP']
    main_camera_token = sample['data']['CAM_FRONT']

    h, w = get_image_shape(nusc, main_camera_token)
    main_k = get_camera_intrinsics(nusc, main_camera_token)
    main_depth = rasterize_sensor_depth(
        nusc, main_lidar_token, main_camera_token, 'lidar')

    main_mask = None
    if panoptic_dirpath is not None:
        main_mask = load_panoptic_mask(panoptic_dirpath, main_camera_token,
                                       h, w)
    if main_mask is None:
        main_mask = boxes_to_mask(
            mover_boxes_image_frame(nusc, main_camera_token), h, w)

    def process_sweep(sweep_sd):
        nonlocal main_depth
        sweep_token = sweep_sd['token']
        cam_token = closest_camera_token(camera_records, sweep_sd['timestamp'])
        n_k = get_camera_intrinsics(nusc, cam_token)
        sweep_depth = rasterize_sensor_depth(nusc, sweep_token, cam_token,
                                             'lidar')
        n_mask = None
        if panoptic_dirpath is not None:
            n_mask = load_panoptic_mask(panoptic_dirpath, cam_token, h, w)
        n_to_main = camera_to_camera_matrix(nusc, cam_token, main_camera_token)
        main_depth = np.asarray(merge_neighbor_into_main(
            main_depth, sweep_depth, n_k, n_to_main, main_k,
            neighbor_mover_mask=n_mask, main_mover_mask=main_mask))

    for direction, n_steps in [('next', n_forward), ('prev', n_backward)]:
        sd = nusc.get('sample_data', main_lidar_token)
        produced = 0
        while sd[direction] != '' and produced < n_steps:
            sd = nusc.get('sample_data', sd[direction])
            process_sweep(sd)
            produced += 1

    xs, ys, zs = rasterize.depth_map_to_points(main_depth)
    return np.stack([xs, ys], axis=0).astype(np.float32), zs.astype(np.float32)

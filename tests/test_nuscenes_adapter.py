"""End-to-end stage-0 merge over a fabricated 2-frame scene with known
geometry (the SURVEY §4 golden-fixture strategy): a fake nuScenes DB
drives rcfd_tpu.geometry.nuscenes_adapter with monkeypatched point-cloud
loading, so the pose-chain projection, rasterization, mover filtering and
z-buffer merge run exactly as in production."""

import numpy as np
import pytest

from rcfd_tpu.geometry import nuscenes_adapter as adapter

K_INTRINSIC = [[100.0, 0.0, 80.0], [0.0, 100.0, 45.0], [0.0, 0.0, 1.0]]
H, W = 90, 160


class FakeNusc:
    """Minimal nuScenes DB: two keyframes; the second ego pose is
    translated 1 m forward (z in camera frame ~ x in global)."""

    def __init__(self):
        ident_q = [1.0, 0.0, 0.0, 0.0]
        self.dataroot = '/nonexistent'
        self._tables = {
            'sample': {
                's0': {'token': 's0', 'next': 's1', 'prev': '',
                       'data': {'LIDAR_TOP': 'l0', 'CAM_FRONT': 'c0',
                                'RADAR_FRONT': 'r0'}},
                's1': {'token': 's1', 'next': '', 'prev': 's0',
                       'data': {'LIDAR_TOP': 'l1', 'CAM_FRONT': 'c1',
                                'RADAR_FRONT': 'r1'}},
            },
            'sample_data': {},
            'calibrated_sensor': {
                'cs_cam': {'rotation': ident_q, 'translation': [0.0, 0.0, 0.0],
                           'camera_intrinsic': K_INTRINSIC},
                'cs_lidar': {'rotation': ident_q,
                             'translation': [0.0, 0.0, 0.0]},
            },
            'ego_pose': {
                'ego0': {'rotation': ident_q, 'translation': [0.0, 0.0, 0.0]},
                # ego moves 1 m along the camera's optical axis (z)
                'ego1': {'rotation': ident_q, 'translation': [0.0, 0.0, 1.0]},
            },
        }
        for i, ego in [(0, 'ego0'), (1, 'ego1')]:
            self._tables['sample_data'][f'c{i}'] = {
                'token': f'c{i}', 'calibrated_sensor_token': 'cs_cam',
                'ego_pose_token': ego, 'height': H, 'width': W,
                'filename': f'cam{i}.jpg', 'timestamp': i * 500000,
                'next': '', 'prev': ''}
            self._tables['sample_data'][f'l{i}'] = {
                'token': f'l{i}', 'calibrated_sensor_token': 'cs_lidar',
                'ego_pose_token': ego, 'filename': f'lidar{i}.bin',
                'timestamp': i * 500000, 'next': '', 'prev': ''}

    def get(self, table, token):
        return self._tables[table][token]


POINTS_FRAME0 = np.array([
    [0.0, 0.0, 10.0],    # straight ahead, 10 m
    [2.0, 1.0, 20.0],
    [-3.0, -1.5, 30.0],
], np.float32)

# the same physical points seen from frame 1 (ego moved +1 m along z):
POINTS_FRAME1 = POINTS_FRAME0 - np.array([0.0, 0.0, 1.0], np.float32)
# plus a point only frame 1 sees
EXTRA_FRAME1 = np.array([[1.0, 0.5, 14.0]], np.float32)


@pytest.fixture
def fake(monkeypatch):
    nusc = FakeNusc()

    def fake_load(nusc_, sensor_token, sensor='lidar'):
        if sensor_token == 'l0':
            return POINTS_FRAME0.copy()
        return np.concatenate([POINTS_FRAME1, EXTRA_FRAME1], axis=0)

    monkeypatch.setattr(adapter, 'load_point_cloud', fake_load)
    monkeypatch.setattr(adapter, 'mover_boxes_image_frame',
                        lambda n, c: np.zeros((0, 4), np.int64))
    return nusc


def _expected_pixel(p):
    k = np.asarray(K_INTRINSIC)
    proj = k @ p
    return proj[0] / proj[2], proj[1] / proj[2]


def test_single_frame_rasterization(fake):
    dm = adapter.rasterize_sensor_depth(fake, 'l0', 'c0', 'lidar')
    assert dm.shape == (H, W)
    for p in POINTS_FRAME0:
        x, y = _expected_pixel(p)
        assert dm[int(round(y)), int(round(x))] == pytest.approx(p[2], abs=1e-4)
    assert (dm > 0).sum() == len(POINTS_FRAME0)


def test_merge_accumulates_neighbor_frame(fake):
    xy, z = adapter.merge_point_clouds(fake, 's0', n_forward=1, n_backward=0,
                                       sensor='lidar')
    # all 3 shared points plus the frame-1-only point (reprojected into
    # frame 0 where it sits at depth 14 + 1 m ego shift)
    assert len(z) == 4
    dm = np.zeros((H, W), np.float32)
    dm[xy[1].astype(int), xy[0].astype(int)] = z

    for p in POINTS_FRAME0:
        x, y = _expected_pixel(p)
        assert dm[int(round(y)), int(round(x))] == pytest.approx(p[2], abs=0.05)

    # the neighbor point passes through pixel quantization (rasterize ->
    # backproject from the pixel center), so allow a 1-px neighborhood —
    # the reference pipeline quantizes identically
    extra_frame0 = EXTRA_FRAME1[0] + np.array([0, 0, 1.0])
    x, y = _expected_pixel(extra_frame0)
    yi, xi = int(round(y)), int(round(x))
    window = dm[yi - 1:yi + 2, xi - 1:xi + 2]
    vals = window[window > 0]
    assert len(vals) == 1
    assert vals[0] == pytest.approx(extra_frame0[2], abs=0.05)


def test_mover_mask_removes_points(fake, monkeypatch):
    # mask out the pixel of the first point in BOTH frames
    x0, y0 = _expected_pixel(POINTS_FRAME0[0])
    mask = np.zeros((H, W), bool)
    mask[int(round(y0)) - 2:int(round(y0)) + 3,
         int(round(x0)) - 2:int(round(x0)) + 3] = True
    monkeypatch.setattr(
        adapter, 'load_panoptic_mask', lambda *a, **k: mask)

    xy, z = adapter.merge_point_clouds(
        fake, 's0', n_forward=1, n_backward=0, sensor='lidar',
        panoptic_dirpath='/fake')
    dm = np.zeros((H, W), np.float32)
    dm[xy[1].astype(int), xy[0].astype(int)] = z
    # reference semantics: the mover mask filters REPROJECTED neighbor
    # points, not the main frame's own lidar returns
    assert dm[int(round(y0)), int(round(x0))] == pytest.approx(10.0, abs=1e-3)
    assert len(z) == 4


def test_camera_to_camera_matrix_round_trip(fake):
    m01 = adapter.camera_to_camera_matrix(fake, 'c0', 'c1')
    m10 = adapter.camera_to_camera_matrix(fake, 'c1', 'c0')
    np.testing.assert_allclose(m01 @ m10, np.eye(4), atol=1e-5)
    # frame-0 point at z=10 appears at z=9 from the advanced camera
    p = np.array([0.0, 0.0, 10.0, 1.0], np.float32)
    np.testing.assert_allclose((m01 @ p)[2], 9.0, atol=1e-5)

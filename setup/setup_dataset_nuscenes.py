"""Stage-0 preprocessing: build lidar/radar/ground-truth artifacts from the
nuScenes DB (TPU-native port of reference setup/setup_dataset_nuscenes.py).

Per keyframe of every scene:
  - single-scan lidar depth PNG            -> lidar/
  - single-frame radar points (N x 3)      -> radar_points/ (and the
    +-N-frame accumulated merge -> radar_points_reprojected/, matching
    reference setup/setup_dataset_nuscenes.py:1025-1037,1083-1084)
  - +-N-frame merged, mover-filtered lidar -> ground_truth/
  - Delaunay-interpolated dense GT         -> ground_truth_interp/
plus newline-delimited path manifests (train/val split with ::2 val
subsets). The per-point Python loops of the reference are replaced by the
batched projection / scatter-min kernels in rcfd_tpu.geometry.

Requires nuscenes-devkit (deployment environment); use --paths_only to
regenerate manifests without recomputation.
"""

import argparse
import multiprocessing as mp
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcfd_tpu.data import io as data_utils
from rcfd_tpu.geometry import nuscenes_adapter as adapter

MAX_SCENES = 850


def get_train_val_split_ids(split_dirpath, debug=False):
    """Load the official 700/150 scene-id split pickles
    (reference setup/setup_dataset_nuscenes.py:96-126)."""
    with open(os.path.join(split_dirpath, 'train_ids.pkl'), 'rb') as f:
        train_ids = pickle.load(f)
    with open(os.path.join(split_dirpath, 'val_ids.pkl'), 'rb') as f:
        val_ids = pickle.load(f)
    if debug:
        return [1], val_ids
    return train_ids, val_ids


def _build_nusc(dataroot, version):
    """DB factory (separated so tests can substitute a fake DB)."""
    from nuscenes.nuscenes import NuScenes
    return NuScenes(version=version, dataroot=dataroot, verbose=False)


def process_scene(args):
    """Process one scene: walk keyframes, save artifacts, return paths."""
    (scene_id, dataroot, version, output_dirpath, n_forward, n_backward,
     paths_only, panoptic_dirpath) = args

    nusc = _build_nusc(dataroot, version)
    scene = nusc.scene[scene_id]
    sample_token = scene['first_sample_token']

    tag = 'scene_{}'.format(scene_id)
    dirs = {}
    for name in ['image', 'lidar', 'radar_points', 'radar_points_reprojected',
                 'ground_truth', 'ground_truth_interp']:
        dirs[name] = os.path.join(output_dirpath, name, tag)
        os.makedirs(dirs[name], exist_ok=True)

    paths = {name: [] for name in dirs}

    idx = 0
    while sample_token != '':
        sample = nusc.get('sample', sample_token)
        camera_token = sample['data']['CAM_FRONT']
        lidar_token = sample['data']['LIDAR_TOP']

        camera_sd = nusc.get('sample_data', camera_token)
        image_path = os.path.join(dataroot, camera_sd['filename'])
        filename = '{:08d}'.format(idx)

        lidar_path = os.path.join(dirs['lidar'], filename + '.png')
        radar_path = os.path.join(dirs['radar_points'], filename + '.npy')
        radar_reproj_path = os.path.join(
            dirs['radar_points_reprojected'], filename + '.npy')
        gt_path = os.path.join(dirs['ground_truth'], filename + '.png')
        gt_interp_path = os.path.join(
            dirs['ground_truth_interp'], filename + '.png')

        if not paths_only:
            h, w = adapter.get_image_shape(nusc, camera_token)

            # single-scan lidar depth
            lidar_depth = adapter.rasterize_sensor_depth(
                nusc, lidar_token, camera_token, 'lidar')
            data_utils.save_depth(lidar_depth, lidar_path)

            # single-frame radar (image-plane x, y + metric z) -> the
            # radar_points/ stream RadarNet trains/infers on (reference
            # setup/setup_dataset_nuscenes.py:1032-1037 saves the n=0
            # merge to radar_points_path at :1084)
            radar_xy_single, radar_z_single = adapter.merge_point_clouds(
                nusc, sample_token, n_forward=0, n_backward=0, sensor='radar')
            np.save(radar_path,
                    np.stack([radar_xy_single[0], radar_xy_single[1],
                              radar_z_single], axis=-1))

            # +-N-frame accumulated radar -> radar_points_reprojected/
            # (reference :1025-1030 saved at :1083)
            radar_xy, radar_z = adapter.merge_point_clouds(
                nusc, sample_token, n_forward=n_forward,
                n_backward=n_backward, sensor='radar')
            np.save(radar_reproj_path,
                    np.stack([radar_xy[0], radar_xy[1], radar_z], axis=-1))

            # multi-frame merged lidar ground truth (mover-filtered)
            gt_xy, gt_z = adapter.merge_point_clouds(
                nusc, sample_token, n_forward=n_forward,
                n_backward=n_backward, sensor='lidar',
                use_mover_boxes=True, panoptic_dirpath=panoptic_dirpath)
            gt_map = np.zeros((h, w), np.float32)
            xi = np.round(gt_xy[0]).astype(int)
            yi = np.round(gt_xy[1]).astype(int)
            gt_map[yi, xi] = gt_z
            data_utils.save_depth(gt_map, gt_path)

            # interpolated (densified) ground truth
            validity = (gt_map > 0).astype(np.float32)
            gt_interp = data_utils.interpolate_depth(gt_map, validity)
            data_utils.save_depth(gt_interp, gt_interp_path)

        paths['image'].append(image_path)
        paths['lidar'].append(lidar_path)
        paths['radar_points'].append(radar_path)
        paths['radar_points_reprojected'].append(radar_reproj_path)
        paths['ground_truth'].append(gt_path)
        paths['ground_truth_interp'].append(gt_interp_path)

        sample_token = sample['next']
        idx += 1

    return scene_id, paths


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--nuscenes_data_root_dirpath', type=str, required=True)
    parser.add_argument('--nuscenes_data_derived_dirpath', type=str,
                        required=True)
    parser.add_argument('--version', type=str, default='v1.0-trainval')
    parser.add_argument('--n_forward_frames_to_reproject', type=int, default=9)
    parser.add_argument('--n_backward_frames_to_reproject', type=int, default=9)
    parser.add_argument('--data_split_dirpath', type=str, default='data_split')
    parser.add_argument('--panoptic_seg_dirpath', type=str, default=None)
    parser.add_argument('--paths_only', action='store_true')
    parser.add_argument('--n_thread', type=int, default=40)
    parser.add_argument('--debug', action='store_true')
    args = parser.parse_args()

    train_ids, val_ids = get_train_val_split_ids(
        args.data_split_dirpath, debug=args.debug)
    scene_ids = sorted(set(list(train_ids) + list(val_ids)))

    job_args = [
        (scene_id, args.nuscenes_data_root_dirpath, args.version,
         args.nuscenes_data_derived_dirpath,
         args.n_forward_frames_to_reproject,
         args.n_backward_frames_to_reproject,
         args.paths_only, args.panoptic_seg_dirpath)
        for scene_id in scene_ids
    ]

    if args.n_thread > 1 and not args.debug:
        with mp.Pool(args.n_thread) as pool:
            results = pool.map(process_scene, job_args)
    else:
        results = [process_scene(a) for a in job_args]

    # Gather manifests per split
    manifests = {'training': {}, 'validation': {}}
    for scene_id, paths in results:
        split = 'training' if scene_id in train_ids else 'validation'
        for name, plist in paths.items():
            manifests[split].setdefault(name, []).extend(plist)

    name_map = {
        'image': 'image', 'lidar': 'lidar', 'radar_points': 'radar',
        'radar_points_reprojected': 'radar_reprojected',
        'ground_truth': 'ground_truth',
        'ground_truth_interp': 'ground_truth_interp',
    }
    for split, split_dir in [('training', 'training'),
                             ('validation', 'validation')]:
        out_dir = os.path.join(args.nuscenes_data_derived_dirpath,
                               split_dir, 'nuscenes')
        os.makedirs(out_dir, exist_ok=True)
        for name, plist in manifests[split].items():
            manifest_path = os.path.join(
                out_dir, 'nuscenes_{}_{}.txt'.format(
                    'train' if split == 'training' else 'val',
                    name_map[name]))
            data_utils.write_paths(manifest_path, plist)
            if split == 'validation':
                # ::2 subset used during training-time validation
                data_utils.write_paths(
                    manifest_path.replace('.txt', '-subset.txt'), plist[::2])
    print('Done: {} scenes'.format(len(results)))


if __name__ == '__main__':
    main()

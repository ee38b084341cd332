"""Stage-0 preprocessing, dense-GT variant (TPU port of reference
setup/setup_dataset_nuscenes_with_denseGT.py).

Differences from setup_dataset_nuscenes.py (and the canonical config that
bash/setup_dataset_nuscenes.sh actually runs):
  - walks ALL intermediate 20 Hz lidar SWEEPS (the sample_data chain),
    not just the 2 Hz keyframes (reference :337-350)
  - pairs every sweep with its nearest-timestamp CAM_FRONT image
    (get_closest_camera_image_to_lidar_scan_in_a_sample, :1096-1129)
  - removes movers with PANOPTIC MASKS instead of annotation boxes
    (:374-379, :430); masks come from setup/gen_panoptic_seg.py
  - defaults n_forward = n_backward = 80 sweeps
"""

import argparse
import multiprocessing as mp
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcfd_tpu.data import io as data_utils
from rcfd_tpu.geometry import nuscenes_adapter as adapter
from setup_dataset_nuscenes import get_train_val_split_ids


def process_scene(args):
    (scene_id, dataroot, version, output_dirpath, n_forward, n_backward,
     paths_only, panoptic_dirpath) = args

    from nuscenes.nuscenes import NuScenes
    nusc = NuScenes(version=version, dataroot=dataroot, verbose=False)

    scene = nusc.scene[scene_id]
    camera_records = None if paths_only else \
        adapter.scene_camera_records(nusc, scene)
    sample_token = scene['first_sample_token']

    tag = 'scene_{}'.format(scene_id)
    dirs = {}
    for name in ['lidar', 'radar_points', 'radar_points_reprojected',
                 'ground_truth', 'ground_truth_interp']:
        dirs[name] = os.path.join(output_dirpath, name, tag)
        os.makedirs(dirs[name], exist_ok=True)
    paths = {name: [] for name in dirs}
    paths['image'] = []

    idx = 0
    while sample_token != '':
        sample = nusc.get('sample', sample_token)
        camera_token = sample['data']['CAM_FRONT']
        lidar_token = sample['data']['LIDAR_TOP']
        camera_sd = nusc.get('sample_data', camera_token)
        image_path = os.path.join(dataroot, camera_sd['filename'])
        filename = '{:08d}'.format(idx)

        out = {name: os.path.join(
            dirs[name], filename + ('.npy' if 'radar' in name else '.png'))
            for name in dirs}

        if not paths_only:
            h, w = adapter.get_image_shape(nusc, camera_token)

            lidar_depth = adapter.rasterize_sensor_depth(
                nusc, lidar_token, camera_token, 'lidar')
            data_utils.save_depth(lidar_depth, out['lidar'])

            # radar_points/ = single-frame, radar_points_reprojected/ =
            # full +-N keyframe accumulation (reference
            # setup_dataset_nuscenes_with_denseGT.py:1016-1029,1076-1077;
            # its merge_radar_point_clouds at :601 walks keyframes with
            # the full n_forward/n_backward)
            radar_xy_single, radar_z_single = adapter.merge_point_clouds(
                nusc, sample_token, 0, 0, sensor='radar')
            np.save(out['radar_points'],
                    np.stack([radar_xy_single[0], radar_xy_single[1],
                              radar_z_single], axis=-1))

            radar_xy, radar_z = adapter.merge_point_clouds(
                nusc, sample_token, n_forward=n_forward,
                n_backward=n_backward, sensor='radar')
            np.save(out['radar_points_reprojected'],
                    np.stack([radar_xy[0], radar_xy[1], radar_z], axis=-1))

            gt_xy, gt_z = adapter.merge_lidar_sweeps_dense(
                nusc, sample_token, n_forward=n_forward,
                n_backward=n_backward, camera_records=camera_records,
                panoptic_dirpath=panoptic_dirpath)
            gt_map = np.zeros((h, w), np.float32)
            xi = np.round(gt_xy[0]).astype(int)
            yi = np.round(gt_xy[1]).astype(int)
            gt_map[yi, xi] = gt_z
            data_utils.save_depth(gt_map, out['ground_truth'])

            validity = (gt_map > 0).astype(np.float32)
            gt_interp = data_utils.interpolate_depth(gt_map, validity)
            data_utils.save_depth(gt_interp, out['ground_truth_interp'])

        paths['image'].append(image_path)
        for name in dirs:
            paths[name].append(out[name])

        sample_token = sample['next']
        idx += 1

    return scene_id, paths


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--nuscenes_data_root_dirpath', type=str, required=True)
    parser.add_argument('--nuscenes_data_derived_dirpath', type=str,
                        required=True)
    parser.add_argument('--version', type=str, default='v1.0-trainval')
    parser.add_argument('--n_forward_frames_to_reproject', type=int, default=80)
    parser.add_argument('--n_backward_frames_to_reproject', type=int,
                        default=80)
    parser.add_argument('--data_split_dirpath', type=str, default='data_split')
    parser.add_argument('--panoptic_seg_dirpath', type=str, required=True)
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
    for split, prefix in [('training', 'train'), ('validation', 'val')]:
        out_dir = os.path.join(args.nuscenes_data_derived_dirpath, split,
                               'nuscenes')
        os.makedirs(out_dir, exist_ok=True)
        for name, plist in manifests[split].items():
            manifest_path = os.path.join(
                out_dir, 'nuscenes_{}_{}.txt'.format(prefix, name_map[name]))
            data_utils.write_paths(manifest_path, plist)
            if split == 'validation':
                data_utils.write_paths(
                    manifest_path.replace('.txt', '-subset.txt'), plist[::2])
    print('Done: {} scenes'.format(len(results)))


if __name__ == '__main__':
    main()

"""Stage-0 preprocessing for the nuScenes v1.0-test split (TPU port of
reference setup/setup_dataset_nuscenes_test.py): same per-keyframe pipeline
as setup_dataset_nuscenes.py over the 150 test scenes (no train/val split),
writing testing/nuscenes/nuscenes_test_*.txt manifests."""

import argparse
import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcfd_tpu.data import io as data_utils
from setup_dataset_nuscenes import process_scene

MAX_SCENES = 150


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--nuscenes_data_root_dirpath', type=str, required=True)
    parser.add_argument('--nuscenes_data_derived_dirpath', type=str,
                        required=True)
    parser.add_argument('--version', type=str, default='v1.0-test')
    parser.add_argument('--n_forward_frames_to_reproject', type=int, default=9)
    parser.add_argument('--n_backward_frames_to_reproject', type=int, default=9)
    parser.add_argument('--panoptic_seg_dirpath', type=str, default=None)
    parser.add_argument('--paths_only', action='store_true')
    parser.add_argument('--n_thread', type=int, default=40)
    parser.add_argument('--debug', action='store_true')
    args = parser.parse_args()

    scene_ids = [1] if args.debug else list(range(MAX_SCENES))

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

    manifests = {}
    for _, paths in results:
        for name, plist in paths.items():
            manifests.setdefault(name, []).extend(plist)

    name_map = {
        'image': 'image', 'lidar': 'lidar', 'radar_points': 'radar',
        'radar_points_reprojected': 'radar_reprojected',
        'ground_truth': 'ground_truth',
        'ground_truth_interp': 'ground_truth_interp',
    }
    out_dir = os.path.join(args.nuscenes_data_derived_dirpath, 'testing',
                           'nuscenes')
    os.makedirs(out_dir, exist_ok=True)
    for name, plist in manifests.items():
        data_utils.write_paths(
            os.path.join(out_dir,
                         'nuscenes_test_{}.txt'.format(name_map[name])),
            plist)
    print('Done: {} test scenes'.format(len(results)))


if __name__ == '__main__':
    main()

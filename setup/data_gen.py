"""Legacy v0 data generation (TPU port of reference
setup/data_gen_{train,val,test}.py — three near-identical 1267/705/660-line
scripts folded into one CLI with per-split frame-merge defaults).

Per keyframe of every scene in the split:
  - +-N-frame merged radar + lidar (rcfd_tpu.geometry batched kernels
    replace the reference's per-point Python loops)
  - ground-truth depth PNG (x256 codec)          -> ground_truth_{split}/
  - radar->lidar registration (radius query in the (x, z*w) plane) and
    per-radar-point 3-class label PNGs
    (0 too-far lidar / 1 match / 2 invalid)      -> pseudo_ground_truth_{split}/
  - reorganized radar input points (M, 3) .npy   -> radar_points/
  - a pickled dict of Data_Struct-like records (the v0 manifest contract,
    reference setup/data_gen_train.py:1184-1267)

Per-split merge defaults follow the reference: train +-9, val +-6, test +-2.
"""

import argparse
import multiprocessing as mp
import os
import pickle
import sys
from typing import NamedTuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcfd_tpu.data import io as data_utils
from rcfd_tpu.geometry import nuscenes_adapter as adapter
from rcfd_tpu.models.legacy_v0 import (register_points_radius,
                                       reorganize_points)
from setup_dataset_nuscenes import get_train_val_split_ids

N_FRAMES = {'train': 9, 'val': 6, 'test': 2}


class DataStruct(NamedTuple):
    scene_id: int
    sample_idx: int
    image_path: str
    radar_points_path: str
    ground_truth_label_path: str
    ground_truth_depth_path: str


def _build_nusc(dataroot, version):
    from nuscenes.nuscenes import NuScenes
    return NuScenes(version=version, dataroot=dataroot, verbose=False)


def process_scene(args):
    (scene_id, dataroot, version, output_dirpath, split, n_frames,
     num_points, radius, z_weight) = args
    nusc = _build_nusc(dataroot, version)
    scene = nusc.scene[scene_id]
    sample_token = scene['first_sample_token']

    gt_dir = os.path.join(output_dirpath,
                          'ground_truth_{}-scene-id{}'.format(split, scene_id))
    label_dir = os.path.join(
        output_dirpath,
        'pseudo_ground_truth_{}-scene-id{}'.format(split, scene_id))
    radar_dir = os.path.join(output_dirpath,
                             'radar_points-scene-id{}'.format(scene_id))
    for d in (gt_dir, label_dir, radar_dir):
        os.makedirs(d, exist_ok=True)

    records = {}
    sample_id = 0
    while sample_token != '':
        sample = nusc.get('sample', sample_token)
        camera_token = sample['data']['CAM_FRONT']
        camera_sd = nusc.get('sample_data', camera_token)
        h, w = adapter.get_image_shape(nusc, camera_token)
        stem = os.path.splitext(os.path.basename(camera_sd['filename']))[0]

        radar_xy, radar_z = adapter.merge_point_clouds(
            nusc, sample_token, n_forward=n_frames, n_backward=n_frames,
            sensor='radar')
        lidar_xy, lidar_z = adapter.merge_point_clouds(
            nusc, sample_token, n_forward=n_frames, n_backward=n_frames,
            sensor='lidar')

        # ground-truth depth PNG
        gt_map = np.zeros((h, w), np.float32)
        xi = np.clip(np.round(lidar_xy[0]).astype(int), 0, w - 1)
        yi = np.clip(np.round(lidar_xy[1]).astype(int), 0, h - 1)
        gt_map[yi, xi] = lidar_z
        gt_path = os.path.join(gt_dir, stem + '.png')
        data_utils.save_depth(gt_map, gt_path)

        # registration + reorganization
        idx_arrays = register_points_radius(
            lidar_xy[0], lidar_z, radar_xy[0], radar_z,
            radius=radius, z_scaling_factor=z_weight)
        radar_stack = np.stack(
            [radar_xy[0], radar_xy[1], radar_z], axis=0)
        lidar_stack = np.stack([lidar_xy[0], lidar_xy[1]], axis=0)
        input_points, gt_points = reorganize_points(
            radar_stack, lidar_stack, idx_arrays, num_points)
        if input_points.shape[0] == 0:
            sample_token = sample['next']
            sample_id += 1
            continue

        radar_path = os.path.join(
            radar_dir, '{}-{}.npy'.format(stem, sample_id))
        np.save(radar_path, input_points)

        # 3-class labels: base 2 (invalid), 0 at lidar pixels (too far),
        # 1 at each radar point's matched gt pixels — one PNG per point
        # (reference data_gen_train.py:1136-1183)
        base = np.full((h, w), 2, np.uint8)
        base[yi, xi] = 0
        from PIL import Image
        label_paths = []
        gt_q = np.round(gt_points).astype(int)
        for p in range(gt_points.shape[0]):
            lab = base.copy()
            for x, y in gt_q[p]:
                if x > 0 and y > 0:
                    lab[y, x] = 1
            lp = os.path.join(label_dir,
                              '{}-{}.png'.format(stem, p))
            Image.fromarray(lab, mode='L').save(lp)
            label_paths.append(lp)

        records[(scene_id, sample_id)] = [DataStruct(
            scene_id, sample_id, camera_sd['filename'], radar_path,
            os.path.join(label_dir, stem + '-{}.png'), gt_path)]

        sample_token = sample['next']
        sample_id += 1

    return records


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--split', choices=['train', 'val', 'test'],
                        required=True)
    parser.add_argument('--nuscenes_data_root_dirpath', type=str,
                        required=True)
    parser.add_argument('--output_dirpath', type=str, required=True)
    parser.add_argument('--version', type=str, default='v1.0-trainval')
    parser.add_argument('--n_frames', type=int, default=None,
                        help='+-N merge frames; default per split: '
                             'train 9, val 6, test 2')
    parser.add_argument('--num_points', type=int, default=4,
                        help='ground-truth matches kept per radar point')
    parser.add_argument('--kdtree_radius', type=float, default=0.4)
    parser.add_argument('--kdtree_depth_weight', type=float, default=0.6)
    parser.add_argument('--data_split_dirpath', type=str,
                        default='data_split')
    parser.add_argument('--pickle_file_name', type=str, default=None)
    parser.add_argument('--n_thread', type=int, default=40)
    parser.add_argument('--debug', action='store_true')
    args = parser.parse_args()

    n_frames = args.n_frames if args.n_frames is not None \
        else N_FRAMES[args.split]
    if args.split == 'test':
        scene_ids = [1] if args.debug else list(range(150))
    else:
        train_ids, val_ids = get_train_val_split_ids(
            args.data_split_dirpath, debug=args.debug)
        scene_ids = sorted(train_ids if args.split == 'train' else val_ids)

    os.makedirs(args.output_dirpath, exist_ok=True)
    job_args = [
        (sid, args.nuscenes_data_root_dirpath, args.version,
         args.output_dirpath, args.split, n_frames, args.num_points,
         args.kdtree_radius, args.kdtree_depth_weight)
        for sid in scene_ids
    ]
    if args.n_thread > 1 and not args.debug:
        with mp.Pool(args.n_thread) as pool:
            results = pool.map(process_scene, job_args)
    else:
        results = [process_scene(a) for a in job_args]

    data_dict = {}
    idx = 0
    for rec in results:
        for key in rec:
            data_dict[idx] = rec[key]
            idx += 1
    pickle_path = args.pickle_file_name or os.path.join(
        args.output_dirpath, 'data_dict_{}.pkl'.format(args.split))
    with open(pickle_path, 'wb') as f:
        pickle.dump(data_dict, f)
    print('Wrote {} samples to {}'.format(idx, pickle_path))


if __name__ == '__main__':
    main()

"""Tiny synthetic nuScenes-like fixture builder for integration tests."""

import os

import numpy as np

from rcfd_tpu.data import io as data_utils


def make_fusionnet_fixture(root, n_samples=8, height=64, width=96, seed=0):
    rng = np.random.default_rng(seed)
    names = ['image', 'depth', 'response', 'ground_truth', 'lidar']
    dirs = {n: os.path.join(root, n) for n in names}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    paths = {n: [] for n in names}
    for i in range(n_samples):
        image = rng.integers(0, 255, (height, width, 3)).astype(np.uint8)
        from PIL import Image
        p = os.path.join(dirs['image'], f'{i:04d}.png')
        Image.fromarray(image).save(p)
        paths['image'].append(p)

        depth = rng.random((height, width), dtype=np.float32) * 60
        depth[depth < 30] = 0.0
        p = os.path.join(dirs['depth'], f'{i:04d}.png')
        data_utils.save_depth(depth, p)
        paths['depth'].append(p)

        response = rng.random((height, width), dtype=np.float32)
        p = os.path.join(dirs['response'], f'{i:04d}.png')
        data_utils.save_response(response, p)
        paths['response'].append(p)

        gt = rng.random((height, width), dtype=np.float32) * 70 + 1
        gt[rng.random((height, width)) < 0.6] = 0.0
        p = os.path.join(dirs['ground_truth'], f'{i:04d}.png')
        data_utils.save_depth(gt, p)
        paths['ground_truth'].append(p)

        lidar = rng.random((height, width), dtype=np.float32) * 70 + 1
        lidar[rng.random((height, width)) < 0.9] = 0.0
        p = os.path.join(dirs['lidar'], f'{i:04d}.png')
        data_utils.save_depth(lidar, p)
        paths['lidar'].append(p)

    manifests = {}
    for n in names:
        mp = os.path.join(root, f'{n}.txt')
        data_utils.write_paths(mp, paths[n])
        manifests[n] = mp
    return manifests


def make_radarnet_fixture(root, n_samples=8, height=64, width=96,
                          n_points=10, seed=0):
    rng = np.random.default_rng(seed)
    names = ['image', 'radar', 'ground_truth']
    dirs = {n: os.path.join(root, n) for n in names}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    paths = {n: [] for n in names}
    from PIL import Image
    for i in range(n_samples):
        image = rng.integers(0, 255, (height, width, 3)).astype(np.uint8)
        p = os.path.join(dirs['image'], f'{i:04d}.png')
        Image.fromarray(image).save(p)
        paths['image'].append(p)

        radar = np.stack([
            rng.integers(0, width, n_points).astype(np.float32),
            rng.integers(0, height, n_points).astype(np.float32),
            rng.random(n_points, dtype=np.float32) * 70 + 1,
        ], axis=1)
        p = os.path.join(dirs['radar'], f'{i:04d}.npy')
        np.save(p, radar)
        paths['radar'].append(p)

        gt = rng.random((height, width), dtype=np.float32) * 70 + 2
        gt[rng.random((height, width)) < 0.5] = 0.0
        p = os.path.join(dirs['ground_truth'], f'{i:04d}.png')
        data_utils.save_depth(gt, p)
        paths['ground_truth'].append(p)

    manifests = {}
    for n in names:
        mp = os.path.join(root, f'{n}.txt')
        data_utils.write_paths(mp, paths[n])
        manifests[n] = mp
    return manifests

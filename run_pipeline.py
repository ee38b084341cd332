"""CLI: fused two-stage inference (camera + radar -> dense depth) in one
jitted program per frame — no intermediate PNG round trip.

New TPU-native capability (the reference composes its stages through the
filesystem); the file-based path is still available via run_radarnet.py +
run_fusionnet.py for drop-in parity.
"""

import argparse
import os

import numpy as np

from rcfd_tpu.data import io as data_utils
from rcfd_tpu.data.datasets import RadarNetInferenceDataset
from rcfd_tpu.pipeline import TwoStagePipeline
from rcfd_tpu.utils import eval_utils
from rcfd_tpu.utils.log_utils import log

parser = argparse.ArgumentParser()
parser.add_argument('--radarnet_restore_path', type=str, required=True)
parser.add_argument('--fusionnet_restore_path', type=str, required=True)
parser.add_argument('--image_path', type=str, required=True)
parser.add_argument('--radar_path', type=str, required=True)
parser.add_argument('--ground_truth_path', type=str, default=None)
parser.add_argument('--patch_size', nargs='+', type=int, default=[900, 288])
parser.add_argument('--output_dirpath', type=str, required=True)
parser.add_argument('--save_outputs', action='store_true')
parser.add_argument('--keep_input_filenames', action='store_true')
parser.add_argument('--verbose', action='store_true')
parser.add_argument('--min_evaluate_depth', type=float, default=0.0)
parser.add_argument('--max_evaluate_depth', type=float, default=80.0)
parser.add_argument('--max_points_inference', type=int, default=128)


def main():
    import jax.numpy as jnp
    args = parser.parse_args()

    os.makedirs(args.output_dirpath, exist_ok=True)
    log_path = os.path.join(args.output_dirpath, 'results.txt')

    image_paths = data_utils.read_paths(args.image_path)
    radar_paths = data_utils.read_paths(args.radar_path)
    gt_available = (args.ground_truth_path is not None and
                    os.path.exists(args.ground_truth_path))
    gt_paths = data_utils.read_paths(args.ground_truth_path) \
        if gt_available else None

    dataset = RadarNetInferenceDataset(
        image_paths=image_paths, radar_paths=radar_paths,
        ground_truth_paths=gt_paths, max_points=args.max_points_inference)

    sample_image = data_utils.load_image(image_paths[0])
    pipeline = TwoStagePipeline.from_checkpoints(
        args.radarnet_restore_path, args.fusionnet_restore_path,
        image_height=sample_image.shape[0], image_width=sample_image.shape[1],
        patch_size=args.patch_size)

    if args.save_outputs:
        dirs = {name: os.path.join(args.output_dirpath, name)
                for name in ['output_depth_fusion', 'output_depth_radar',
                             'output_response_radar']}
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)

    n_sample = len(image_paths)
    metrics = {k: np.zeros(n_sample) for k in ['mae', 'rmse', 'imae', 'irmse']}

    for idx in range(n_sample):
        data = dataset.get(idx)
        image, points, valid = data[:3]
        dense, quasi, response = pipeline(
            jnp.asarray(image)[None], jnp.asarray(points), jnp.asarray(valid))
        dense = np.asarray(dense)

        if args.verbose:
            print('Processed {}/{} samples'.format(idx + 1, n_sample),
                  end='\r')

        if gt_available:
            gt = data[3][..., 0]
            m = eval_utils.compute_all(dense, gt, args.min_evaluate_depth,
                                       args.max_evaluate_depth)
            for k in metrics:
                metrics[k][idx] = m[k]

        if args.save_outputs:
            filename = (os.path.splitext(os.path.basename(image_paths[idx]))[0]
                        + '.png') if args.keep_input_filenames \
                else '{:010d}.png'.format(idx)
            data_utils.save_depth(dense, os.path.join(
                dirs['output_depth_fusion'], filename))
            data_utils.save_depth(np.asarray(quasi), os.path.join(
                dirs['output_depth_radar'], filename))
            data_utils.save_response(np.asarray(response), os.path.join(
                dirs['output_response_radar'], filename))

    if gt_available:
        log('Two-stage pipeline evaluation:', log_path)
        log('{:>8}  {:>8}  {:>8}  {:>8}'.format('MAE', 'RMSE', 'iMAE',
                                                'iRMSE'), log_path)
        log('{:8.3f}  {:8.3f}  {:8.3f}  {:8.3f}'.format(
            *[np.mean(metrics[k]) for k in ['mae', 'rmse', 'imae', 'irmse']]),
            log_path)


if __name__ == '__main__':
    main()

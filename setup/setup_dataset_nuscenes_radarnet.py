"""Stage 1.5 bridge: run a trained RadarNet over the train/val manifests and
write quasi-dense depth_predicted/ + response_predicted/ PNGs plus the
manifests consumed by FusionNet training (TPU port of reference
setup/setup_dataset_nuscenes_radarnet.py).

Output paths mirror the reference's radar_points -> depth_predicted /
response_predicted string substitution (:227-245) so downstream manifests
line up with the originals.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcfd_tpu import radarnet_main
from rcfd_tpu.data import io as data_utils


def derive_output_path(radar_path: str, kind: str) -> str:
    """radar_points/.../0000.npy -> depth_predicted/.../0000.png"""
    out = radar_path.replace('radar_points_reprojected', kind)
    out = out.replace('radar_points', kind)
    base, _ = os.path.splitext(out)
    return base + '.png'


def process_split(restore_path, image_path, radar_path, ground_truth_path,
                  output_dirpath, tag, net_kwargs, patch_size,
                  max_points_inference, min_evaluate_depth,
                  max_evaluate_depth, paths_only, verbose,
                  run_evaluation=False, eval_batch_size=8):
    image_paths = data_utils.read_paths(image_path)
    radar_paths = data_utils.read_paths(radar_path)
    n_sample = len(image_paths)

    # Absolute radar paths map in place (radar_points -> depth_predicted,
    # the reference's string substitution :227-245); relative ones are
    # rooted under output_dirpath.
    depth_out_paths = [
        derive_output_path(p, 'depth_predicted') if os.path.isabs(p)
        else os.path.join(output_dirpath,
                          derive_output_path(p, 'depth_predicted'))
        for p in radar_paths
    ]
    response_out_paths = [
        derive_output_path(p, 'response_predicted') if os.path.isabs(p)
        else os.path.join(output_dirpath,
                          derive_output_path(p, 'response_predicted'))
        for p in radar_paths
    ]

    if not paths_only:
        from rcfd_tpu.data.datasets import RadarNetInferenceDataset
        from rcfd_tpu.data.transforms import Transforms
        from rcfd_tpu.utils import eval_utils

        gt_available = (ground_truth_path is not None and
                        os.path.exists(ground_truth_path))
        gt_paths = data_utils.read_paths(ground_truth_path) \
            if gt_available else None
        if run_evaluation and not gt_available:
            raise ValueError(
                'bridge evaluation requested but no ground truth manifest '
                'for the {} split'.format(tag))

        dataset = RadarNetInferenceDataset(
            image_paths=image_paths, radar_paths=radar_paths,
            ground_truth_paths=gt_paths,
            max_points=(None if max_points_inference is None or
                        max_points_inference <= 0
                        else max_points_inference))

        model = radarnet_main._build_model(patch_size=patch_size, **net_kwargs)
        params, state, step, _ = model.restore_checkpoint(restore_path)

        sample_image = data_utils.load_image(image_paths[0])
        # production passes (no eval) fetch the outputs already quantized
        # to the 16-bit PNG codec grid — half the D2H bytes over ~34k
        # frames, byte-identical files; eval passes keep float32 outputs
        # so the intersection metrics match the reference's (computed on
        # the unquantized in-memory maps)
        codec_d2h = not run_evaluation
        forward_fn_b = radarnet_main.make_forward_fn_batched(
            model, Transforms(normalized_image_range=[0, 1]),
            sample_image.shape[0], sample_image.shape[1],
            codec_encode=codec_d2h)

        mae_i = np.full(n_sample, np.nan)
        rmse_i = np.full(n_sample, np.nan)
        imae_i = np.full(n_sample, np.nan)
        irmse_i = np.full(n_sample, np.nan)
        n_valid_output = np.zeros(n_sample)
        n_valid_gt = np.zeros(n_sample)
        n_valid_inter = np.zeros(n_sample)

        # frame-batched dispatch: stage 1.5 over ~34k frames is the
        # biggest wall-clock consumer of a full reproduction; per-frame
        # outputs are identical to the batch-1 path (tested)
        for idx, data, output_depth, response_np in \
                radarnet_main.iter_scatter_outputs(
                    forward_fn_b, params, state, dataset, eval_batch_size):
            os.makedirs(os.path.dirname(depth_out_paths[idx]), exist_ok=True)
            os.makedirs(os.path.dirname(response_out_paths[idx]), exist_ok=True)
            if codec_d2h:
                data_utils.save_depth_encoded(output_depth,
                                              depth_out_paths[idx])
                data_utils.save_response_encoded(response_np,
                                                 response_out_paths[idx])
            else:
                data_utils.save_depth(output_depth, depth_out_paths[idx])
                data_utils.save_response(response_np, response_out_paths[idx])

            if run_evaluation:
                # intersection metrics over the predicted quasi-dense maps
                # (reference setup/setup_dataset_nuscenes_radarnet.py:352-415)
                gt = data[3][..., 0]
                v_out = (output_depth > 0).astype(np.int32)
                v_gt = (gt > 0).astype(np.int32)
                v_inter = v_out * v_gt
                n_valid_inter[idx] = v_inter.sum()
                n_valid_output[idx] = v_out.sum()
                n_valid_gt[idx] = v_gt.sum()
                min_max = np.logical_and(gt > min_evaluate_depth,
                                         gt < max_evaluate_depth)
                mask = np.where(np.logical_and(v_inter, min_max) > 0)
                out_m, gt_m = output_depth[mask], gt[mask]
                mae_i[idx] = eval_utils.mean_abs_err(1000. * out_m, 1000. * gt_m)
                rmse_i[idx] = eval_utils.root_mean_sq_err(1000. * out_m,
                                                          1000. * gt_m)
                imae_i[idx] = eval_utils.inv_mean_abs_err(0.001 * out_m,
                                                          0.001 * gt_m)
                irmse_i[idx] = eval_utils.inv_root_mean_sq_err(0.001 * out_m,
                                                               0.001 * gt_m)
            if verbose:
                print('[{}] {}/{}'.format(tag, idx + 1, n_sample), end='\r')

        if run_evaluation:
            radarnet_main.log_evaluation_results(
                'Evaluation results on {} samples from {} set'.format(
                    n_sample, tag),
                float(np.nanmean(mae_i)), float(np.nanmean(rmse_i)),
                float(np.nanmean(imae_i)), float(np.nanmean(irmse_i)),
                float(np.mean(n_valid_output)), float(np.mean(n_valid_inter)),
                float(np.mean(n_valid_gt)), step, None)

    return depth_out_paths, response_out_paths


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument('--restore_path', type=str, required=True)
    parser.add_argument('--train_image_path', type=str, default=None)
    parser.add_argument('--train_radar_path', type=str, default=None)
    parser.add_argument('--train_ground_truth_path', type=str, default=None)
    parser.add_argument('--val_image_path', type=str, default=None)
    parser.add_argument('--val_radar_path', type=str, default=None)
    parser.add_argument('--val_ground_truth_path', type=str, default=None)
    parser.add_argument('--output_dirpath', type=str, required=True)
    # Network settings (reference canonical defaults)
    parser.add_argument('--patch_size', nargs='+', type=int,
                        default=[900, 288])
    parser.add_argument('--input_channels_image', type=int, default=3)
    parser.add_argument('--input_channels_depth', type=int, default=3)
    parser.add_argument('--encoder_type', nargs='+', type=str,
                        default=['radarnetv1', 'batch_norm'])
    parser.add_argument('--n_filters_encoder_image', nargs='+', type=int,
                        default=[32, 64, 128, 128, 128])
    parser.add_argument('--n_neurons_encoder_depth', nargs='+', type=int,
                        default=[32, 64, 128, 128, 128])
    parser.add_argument('--decoder_type', nargs='+', type=str,
                        default=['multiscale', 'batch_norm'])
    parser.add_argument('--n_filters_decoder', nargs='+', type=int,
                        default=[256, 128, 64, 32, 16])
    parser.add_argument('--weight_initializer', type=str,
                        default='kaiming_uniform')
    parser.add_argument('--activation_func', type=str, default='leaky_relu')
    parser.add_argument('--min_evaluate_depth', type=float, default=0.0)
    parser.add_argument('--max_evaluate_depth', type=float, default=100.0)
    parser.add_argument('--max_points_inference', type=int, default=0,
                    help='static point-axis size; the default (<= 0) '
                         'auto-sizes from the radar manifest so no frame '
                         'is truncated (the reference processes every '
                         'point); pass a positive cap to opt in to a '
                         'fixed size')
    parser.add_argument('--eval_batch_size', type=int, default=8,
                        help='frames per device dispatch (identical '
                             'per-frame outputs at any value)')
    parser.add_argument('--run_evaluation', action='store_true',
                        help='evaluate predicted quasi-dense maps against '
                             'the ground-truth manifests (intersection '
                             'metrics, reference :352-415)')
    parser.add_argument('--paths_only', action='store_true')
    parser.add_argument('--verbose', action='store_true')
    return parser


def main():
    args = build_parser().parse_args()

    net_kwargs = dict(
        input_channels_image=args.input_channels_image,
        input_channels_depth=args.input_channels_depth,
        encoder_type='-'.join(args.encoder_type),
        n_filters_encoder_image=args.n_filters_encoder_image,
        n_neurons_encoder_depth=args.n_neurons_encoder_depth,
        decoder_type='-'.join(args.decoder_type),
        n_filters_decoder=args.n_filters_decoder,
        weight_initializer=args.weight_initializer,
        activation_func=args.activation_func)

    os.makedirs(args.output_dirpath, exist_ok=True)

    for tag, image_p, radar_p, gt_p in [
            ('train', args.train_image_path, args.train_radar_path,
             args.train_ground_truth_path),
            ('val', args.val_image_path, args.val_radar_path,
             args.val_ground_truth_path)]:
        if image_p is None or radar_p is None:
            continue
        depth_paths, response_paths = process_split(
            args.restore_path, image_p, radar_p, gt_p, args.output_dirpath,
            tag, net_kwargs, args.patch_size, args.max_points_inference,
            args.min_evaluate_depth, args.max_evaluate_depth,
            args.paths_only, args.verbose,
            run_evaluation=args.run_evaluation,
            eval_batch_size=args.eval_batch_size)

        manifest_dir = os.path.join(
            args.output_dirpath,
            'training' if tag == 'train' else 'validation', 'nuscenes')
        os.makedirs(manifest_dir, exist_ok=True)
        dp = os.path.join(manifest_dir,
                          'nuscenes_{}_depth_predicted.txt'.format(tag))
        rp = os.path.join(manifest_dir,
                          'nuscenes_{}_response_predicted.txt'.format(tag))
        data_utils.write_paths(dp, depth_paths)
        data_utils.write_paths(rp, response_paths)
        if tag == 'val':
            data_utils.write_paths(dp.replace('.txt', '-subset.txt'),
                                   depth_paths[::2])
            data_utils.write_paths(rp.replace('.txt', '-subset.txt'),
                                   response_paths[::2])
        print('[{}] wrote {} outputs'.format(tag, len(depth_paths)))


if __name__ == '__main__':
    main()

"""Stage 1.5 bridge for the test split (TPU port of reference
setup/setup_dataset_nuscenes_radarnet_test.py): run a trained RadarNet over
the nuScenes test manifests and write depth_predicted/response_predicted
PNGs + testing manifests."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rcfd_tpu.data import io as data_utils
from setup_dataset_nuscenes_radarnet import process_split


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--restore_path', type=str, required=True)
    parser.add_argument('--test_image_path', type=str, required=True)
    parser.add_argument('--test_radar_path', type=str, required=True)
    parser.add_argument('--test_ground_truth_path', type=str, default=None)
    parser.add_argument('--output_dirpath', type=str, required=True)
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
    parser.add_argument('--max_points_inference', type=int, default=128,
                    help='static point-axis size; <= 0 auto-sizes '
                         'from the radar manifest (no truncation)')
    parser.add_argument('--run_evaluation', action='store_true')
    parser.add_argument('--paths_only', action='store_true')
    parser.add_argument('--verbose', action='store_true')
    args = parser.parse_args()

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
    depth_paths, response_paths = process_split(
        args.restore_path, args.test_image_path, args.test_radar_path,
        args.test_ground_truth_path, args.output_dirpath, 'test',
        net_kwargs, args.patch_size, args.max_points_inference,
        args.min_evaluate_depth, args.max_evaluate_depth,
        args.paths_only, args.verbose, run_evaluation=args.run_evaluation)

    manifest_dir = os.path.join(args.output_dirpath, 'testing', 'nuscenes')
    os.makedirs(manifest_dir, exist_ok=True)
    data_utils.write_paths(
        os.path.join(manifest_dir, 'nuscenes_test_depth_predicted.txt'),
        depth_paths)
    data_utils.write_paths(
        os.path.join(manifest_dir, 'nuscenes_test_response_predicted.txt'),
        response_paths)
    print('[test] wrote {} outputs'.format(len(depth_paths)))


if __name__ == '__main__':
    main()

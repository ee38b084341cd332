"""CLI: run RadarNet scatter inference (drop-in for reference
src/run_radarnet.py)."""

import argparse

from rcfd_tpu import radarnet_main

parser = argparse.ArgumentParser()

parser.add_argument('--restore_path', type=str, required=True)
parser.add_argument('--image_path', type=str, required=True)
parser.add_argument('--radar_path', type=str, required=True)
parser.add_argument('--ground_truth_path', type=str, default=None)
# Input settings
parser.add_argument('--patch_size', nargs='+', type=int, default=[900, 288])
parser.add_argument('--input_channels_image', type=int, default=3)
parser.add_argument('--input_channels_depth', type=int, default=3)
parser.add_argument('--normalized_image_range', nargs='+', type=float,
                    default=[0, 1])
# Network settings
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
# Weight settings
parser.add_argument('--weight_initializer', type=str, default='kaiming_uniform')
parser.add_argument('--activation_func', type=str, default='leaky_relu')
# Output settings
parser.add_argument('--output_dirpath', type=str, required=True)
parser.add_argument('--save_outputs', action='store_true')
parser.add_argument('--keep_input_filenames', action='store_true')
parser.add_argument('--verbose', action='store_true')
# Evaluation settings
parser.add_argument('--min_evaluate_depth', type=float, default=0)
parser.add_argument('--max_evaluate_depth', type=float, default=100)
parser.add_argument('--eval_batch_size', type=int, default=8,
                    help='frames per device dispatch (identical '
                         'per-frame outputs at any value)')
parser.add_argument('--max_points_inference', type=int, default=0,
                    help='static point-axis size; the default (<= 0) '
                         'auto-sizes from the radar manifest so no frame '
                         'is truncated (the reference processes every '
                         'point); pass a positive cap to opt in to a '
                         'fixed size')


if __name__ == '__main__':
    args = parser.parse_args()
    args.encoder_type = '-'.join(args.encoder_type)
    args.decoder_type = '-'.join(args.decoder_type)

    radarnet_main.run(
        restore_path=args.restore_path,
        image_path=args.image_path,
        radar_path=args.radar_path,
        ground_truth_path=args.ground_truth_path,
        patch_size=args.patch_size,
        input_channels_image=args.input_channels_image,
        input_channels_depth=args.input_channels_depth,
        normalized_image_range=args.normalized_image_range,
        encoder_type=args.encoder_type,
        n_filters_encoder_image=args.n_filters_encoder_image,
        n_neurons_encoder_depth=args.n_neurons_encoder_depth,
        decoder_type=args.decoder_type,
        n_filters_decoder=args.n_filters_decoder,
        weight_initializer=args.weight_initializer,
        activation_func=args.activation_func,
        output_dirpath=args.output_dirpath,
        save_outputs=args.save_outputs,
        keep_input_filenames=args.keep_input_filenames,
        verbose=args.verbose,
        min_evaluate_depth=args.min_evaluate_depth,
        max_evaluate_depth=args.max_evaluate_depth,
        max_points_inference=args.max_points_inference,
        eval_batch_size=args.eval_batch_size)

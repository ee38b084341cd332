"""CLI: run FusionNet inference/eval (drop-in for reference
src/run_fusionnet.py)."""

import argparse

from rcfd_tpu import fusionnet_main

parser = argparse.ArgumentParser()

parser.add_argument('--restore_path', type=str, required=True)
parser.add_argument('--image_path', type=str, required=True)
parser.add_argument('--depth_path', type=str, required=True)
parser.add_argument('--response_path', type=str, required=True)
parser.add_argument('--ground_truth_path', type=str, default=None)
# Input settings
parser.add_argument('--input_channels_image', type=int, default=3)
parser.add_argument('--input_channels_depth', type=int, default=2)
parser.add_argument('--normalized_image_range', nargs='+', type=float,
                    default=[0, 1])
# Network settings
parser.add_argument('--encoder_type', nargs='+', type=str,
                    default=['fusionnet18', 'batch_norm'])
parser.add_argument('--n_filters_encoder_image', nargs='+', type=int,
                    default=[32, 64, 128, 256, 256, 256])
parser.add_argument('--n_filters_encoder_depth', nargs='+', type=int,
                    default=[16, 32, 64, 128, 128, 128])
parser.add_argument('--fusion_type', type=str, default='add')
parser.add_argument('--decoder_type', nargs='+', type=str,
                    default=['multiscale', 'batch_norm'])
parser.add_argument('--n_filters_decoder', nargs='+', type=int,
                    default=[256, 256, 128, 64, 64, 32])
parser.add_argument('--n_resolutions_decoder', type=int, default=0)
parser.add_argument('--min_predict_depth', type=float, default=0)
parser.add_argument('--max_predict_depth', type=float, default=100)
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
                    help='Batch frames per dispatch (identical metrics)')


if __name__ == '__main__':
    args = parser.parse_args()
    args.encoder_type = '-'.join(args.encoder_type)
    args.decoder_type = '-'.join(args.decoder_type)

    fusionnet_main.run(
        restore_path=args.restore_path,
        image_path=args.image_path,
        depth_path=args.depth_path,
        response_path=args.response_path,
        ground_truth_path=args.ground_truth_path,
        input_channels_image=args.input_channels_image,
        input_channels_depth=args.input_channels_depth,
        normalized_image_range=args.normalized_image_range,
        encoder_type=args.encoder_type,
        n_filters_encoder_image=args.n_filters_encoder_image,
        n_filters_encoder_depth=args.n_filters_encoder_depth,
        fusion_type=args.fusion_type,
        decoder_type=args.decoder_type,
        n_filters_decoder=args.n_filters_decoder,
        n_resolutions_decoder=max(args.n_resolutions_decoder, 1),
        min_predict_depth=args.min_predict_depth,
        max_predict_depth=args.max_predict_depth,
        weight_initializer=args.weight_initializer,
        activation_func=args.activation_func,
        output_dirpath=args.output_dirpath,
        save_outputs=args.save_outputs,
        keep_input_filenames=args.keep_input_filenames,
        verbose=args.verbose,
        min_evaluate_depth=args.min_evaluate_depth,
        max_evaluate_depth=args.max_evaluate_depth,
        eval_batch_size=args.eval_batch_size)

"""Convert checkpoints between the reference .pth format and the native
.npz format (both directions), for either model family.

Examples:
  python tools/convert_checkpoint.py --model fusionnet \
      --input model-355000.pth --output model-355000.npz
  python tools/convert_checkpoint.py --model radarnet \
      --input model.npz --output model.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcfd_tpu.models import FusionNetModel, RadarNetModel


def build_model(args):
    if args.model == 'fusionnet':
        return FusionNetModel(
            input_channels_image=args.input_channels_image,
            input_channels_depth=args.input_channels_depth,
            encoder_type='-'.join(args.encoder_type),
            n_filters_encoder_image=args.n_filters_encoder_image,
            n_filters_encoder_depth=args.n_filters_encoder_depth,
            fusion_type=args.fusion_type,
            decoder_type='-'.join(args.decoder_type),
            n_resolution_decoder=args.n_resolutions_decoder,
            n_filters_decoder=args.n_filters_decoder,
            min_predict_depth=args.min_predict_depth,
            max_predict_depth=args.max_predict_depth)
    return RadarNetModel(
        input_channels_image=args.input_channels_image,
        input_channels_depth=3,
        input_patch_size_image=tuple(args.patch_size),
        encoder_type='-'.join(args.encoder_type_radarnet),
        n_filters_encoder_image=args.n_filters_encoder_image_radarnet,
        n_neurons_encoder_depth=args.n_neurons_encoder_depth,
        decoder_type='-'.join(args.decoder_type),
        n_filters_decoder=args.n_filters_decoder_radarnet)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--model', choices=['fusionnet', 'radarnet'],
                        required=True)
    parser.add_argument('--input', type=str, required=True)
    parser.add_argument('--output', type=str, required=True)
    # fusionnet config (canonical defaults)
    parser.add_argument('--input_channels_image', type=int, default=3)
    parser.add_argument('--input_channels_depth', type=int, default=2)
    parser.add_argument('--encoder_type', nargs='+', type=str,
                        default=['fusionnet18', 'batch_norm'])
    parser.add_argument('--n_filters_encoder_image', nargs='+', type=int,
                        default=[32, 64, 128, 256, 256, 256])
    parser.add_argument('--n_filters_encoder_depth', nargs='+', type=int,
                        default=[16, 32, 64, 128, 128, 128])
    parser.add_argument('--fusion_type', type=str, default='weight_and_project')
    parser.add_argument('--decoder_type', nargs='+', type=str,
                        default=['multiscale', 'batch_norm'])
    parser.add_argument('--n_filters_decoder', nargs='+', type=int,
                        default=[256, 256, 128, 64, 64, 32])
    parser.add_argument('--n_resolutions_decoder', type=int, default=1)
    parser.add_argument('--min_predict_depth', type=float, default=1.0)
    parser.add_argument('--max_predict_depth', type=float, default=100.0)
    # radarnet config
    parser.add_argument('--patch_size', nargs='+', type=int, default=[900, 288])
    parser.add_argument('--encoder_type_radarnet', nargs='+', type=str,
                        default=['radarnetv1', 'batch_norm'])
    parser.add_argument('--n_filters_encoder_image_radarnet', nargs='+',
                        type=int, default=[32, 64, 128, 128, 128])
    parser.add_argument('--n_neurons_encoder_depth', nargs='+', type=int,
                        default=[32, 64, 128, 128, 128])
    parser.add_argument('--n_filters_decoder_radarnet', nargs='+', type=int,
                        default=[256, 128, 64, 32, 16])
    args = parser.parse_args()

    model = build_model(args)
    params, state, step, opt_sd = model.restore_checkpoint(args.input)
    model.save_checkpoint(args.output, params, state, step=step,
                          optimizer_state_dict=opt_sd
                          if args.output.endswith('.pth') else None)
    print('converted {} -> {} (step {})'.format(args.input, args.output, step))


if __name__ == '__main__':
    main()

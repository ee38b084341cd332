"""CLI: train FusionNet (drop-in for reference src/train_fusionnet.py)."""

import argparse

from rcfd_tpu import fusionnet_main

parser = argparse.ArgumentParser()

# Training and validation input filepaths
parser.add_argument('--train_image_path', type=str, required=True)
parser.add_argument('--train_depth_path', type=str, required=True)
parser.add_argument('--train_response_path', type=str, required=True)
parser.add_argument('--train_ground_truth_path', type=str, required=True)
parser.add_argument('--train_lidar_map_path', type=str, required=True)
parser.add_argument('--val_image_path', type=str, required=True)
parser.add_argument('--val_depth_path', type=str, required=True)
parser.add_argument('--val_response_path', type=str, required=True)
parser.add_argument('--val_ground_truth_path', type=str, required=True)
# Batch settings
parser.add_argument('--batch_size', type=int, default=64)
parser.add_argument('--n_height', type=int, default=900)
parser.add_argument('--n_width', type=int, default=1600)
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
# Training settings
parser.add_argument('--learning_rates', nargs='+', type=float,
                    default=[5e-4, 1e-4])
parser.add_argument('--learning_schedule', nargs='+', type=int,
                    default=[300, 450])
# Loss settings
parser.add_argument('--loss_func', type=str, default='l1')
parser.add_argument('--w_smoothness', type=float, default=0.0)
parser.add_argument('--w_lidar_loss', type=float, default=0.0)
parser.add_argument('--w_weight_decay', type=float, default=0.0)
parser.add_argument('--loss_smoothness_kernel_size', type=int, default=-1)
parser.add_argument('--outlier_removal_kernel_size', type=int, default=-1)
parser.add_argument('--outlier_removal_threshold', type=float, default=-1)
parser.add_argument('--ground_truth_dilation_kernel_size', type=int, default=-1)
# Augmentation settings
parser.add_argument('--augmentation_probabilities', nargs='+', type=float,
                    default=[1.00])
parser.add_argument('--augmentation_schedule', nargs='+', type=int,
                    default=[-1])
parser.add_argument('--augmentation_random_crop_type', nargs='+', type=str,
                    default=['none'])
parser.add_argument('--augmentation_random_brightness', nargs='+', type=float,
                    default=[-1, -1])
parser.add_argument('--augmentation_random_contrast', nargs='+', type=float,
                    default=[-1, -1])
parser.add_argument('--augmentation_random_saturation', nargs='+', type=float,
                    default=[-1, -1])
parser.add_argument('--augmentation_random_flip_type', nargs='+', type=str,
                    default=['none'])
# Evaluation settings
parser.add_argument('--min_evaluate_depth', type=float, default=0)
parser.add_argument('--max_evaluate_depth', type=float, default=100)
# Checkpoint settings
parser.add_argument('--checkpoint_dirpath', type=str, required=True)
parser.add_argument('--n_step_per_checkpoint', type=int, default=100)
parser.add_argument('--n_step_per_summary', type=int, default=100)
parser.add_argument('--start_step_validation', type=int, default=100)
parser.add_argument('--restore_path', type=str, default=None)
# Hardware settings
parser.add_argument('--device', type=str, default='tpu')
parser.add_argument('--n_thread', type=int, default=10)
parser.add_argument('--n_data_parallel', type=int, default=None,
                    help='Number of devices on the data mesh axis '
                         '(default: all)')
parser.add_argument('--eval_batch_size', type=int, default=1,
                    help='validation frames per dispatch (identical '
                         'metrics at any value)')
parser.add_argument('--seed', type=int, default=0)
parser.add_argument('--raw_cache_dirpath', type=str, default=None,
                    help='decode-once raw cache dir (mmap raw PNG '
                         'integers after the first epoch — 19x loader '
                         'throughput per core, ~16 MB/frame of disk; '
                         'see rcfd_tpu/data/raw_cache.py)')


if __name__ == '__main__':
    args = parser.parse_args()
    if args.raw_cache_dirpath:
        from rcfd_tpu.data.raw_cache import set_raw_cache
        set_raw_cache(args.raw_cache_dirpath)
    args.encoder_type = '-'.join(args.encoder_type) \
        if isinstance(args.encoder_type, list) else args.encoder_type
    args.decoder_type = '-'.join(args.decoder_type) \
        if isinstance(args.decoder_type, list) else args.decoder_type

    fusionnet_main.train(
        train_image_path=args.train_image_path,
        train_depth_path=args.train_depth_path,
        train_response_path=args.train_response_path,
        train_ground_truth_path=args.train_ground_truth_path,
        train_lidar_map_path=args.train_lidar_map_path,
        val_image_path=args.val_image_path,
        val_depth_path=args.val_depth_path,
        val_response_path=args.val_response_path,
        val_ground_truth_path=args.val_ground_truth_path,
        batch_size=args.batch_size,
        n_height=args.n_height,
        n_width=args.n_width,
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
        learning_rates=args.learning_rates,
        learning_schedule=args.learning_schedule,
        loss_func=args.loss_func,
        w_smoothness=args.w_smoothness,
        w_lidar_loss=args.w_lidar_loss,
        w_weight_decay=args.w_weight_decay,
        loss_smoothness_kernel_size=args.loss_smoothness_kernel_size,
        outlier_removal_kernel_size=args.outlier_removal_kernel_size,
        outlier_removal_threshold=args.outlier_removal_threshold,
        ground_truth_dilation_kernel_size=args.ground_truth_dilation_kernel_size,
        augmentation_probabilities=args.augmentation_probabilities,
        augmentation_schedule=args.augmentation_schedule,
        augmentation_random_crop_type=args.augmentation_random_crop_type,
        augmentation_random_brightness=args.augmentation_random_brightness,
        augmentation_random_contrast=args.augmentation_random_contrast,
        augmentation_random_saturation=args.augmentation_random_saturation,
        augmentation_random_flip_type=args.augmentation_random_flip_type,
        min_evaluate_depth=args.min_evaluate_depth,
        max_evaluate_depth=args.max_evaluate_depth,
        checkpoint_dirpath=args.checkpoint_dirpath,
        n_step_per_checkpoint=args.n_step_per_checkpoint,
        n_step_per_summary=args.n_step_per_summary,
        start_step_validation=args.start_step_validation,
        restore_path=args.restore_path,
        device=args.device,
        n_thread=args.n_thread,
        n_data_parallel=args.n_data_parallel,
        eval_batch_size=args.eval_batch_size,
        seed=args.seed)

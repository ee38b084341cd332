"""CLI: train RadarNet (drop-in for reference src/train_radarnet.py)."""

import argparse

from rcfd_tpu import radarnet_main

parser = argparse.ArgumentParser()

parser.add_argument('--train_image_path', type=str, required=True)
parser.add_argument('--train_radar_path', type=str, required=True)
parser.add_argument('--train_ground_truth_path', type=str, required=True)
parser.add_argument('--val_image_path', type=str, required=True)
parser.add_argument('--val_radar_path', type=str, required=True)
parser.add_argument('--val_ground_truth_path', type=str, required=True)
# Batch settings
parser.add_argument('--batch_size', type=int, default=64)
parser.add_argument('--patch_size', nargs='+', type=int, default=[900, 288])
parser.add_argument('--total_points_sampled', type=int, default=4)
parser.add_argument('--sample_probability_lidar', type=float, default=0.0)
# Input settings
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
# Training settings
parser.add_argument('--learning_rates', nargs='+', type=float, default=[2e-4])
parser.add_argument('--learning_schedule', nargs='+', type=int, default=[200])
# Augmentation settings
parser.add_argument('--augmentation_probabilities', nargs='+', type=float,
                    default=[1.00])
parser.add_argument('--augmentation_schedule', nargs='+', type=int,
                    default=[-1])
parser.add_argument('--augmentation_random_brightness', nargs='+', type=float,
                    default=[-1, -1])
parser.add_argument('--augmentation_random_contrast', nargs='+', type=float,
                    default=[-1, -1])
parser.add_argument('--augmentation_random_saturation', nargs='+', type=float,
                    default=[-1, -1])
parser.add_argument('--augmentation_random_noise_type', type=str,
                    default='none')
parser.add_argument('--augmentation_random_noise_spread', type=float,
                    default=-1)
parser.add_argument('--augmentation_random_flip_type', nargs='+', type=str,
                    default=['none'])
# Loss settings
parser.add_argument('--w_weight_decay', type=float, default=0.0)
parser.add_argument('--w_positive_class', type=float, default=1.0)
parser.add_argument('--max_distance_correspondence', type=float, default=0.4)
parser.add_argument('--set_invalid_to_negative_class', action='store_true')
# Checkpoint settings
parser.add_argument('--checkpoint_dirpath', type=str, required=True)
parser.add_argument('--n_step_per_checkpoint', type=int, default=100)
parser.add_argument('--n_step_per_summary', type=int, default=100)
parser.add_argument('--start_step_validation', type=int, default=100)
parser.add_argument('--restore_path', type=str, default=None)
# Evaluation settings
parser.add_argument('--min_evaluate_depth', type=float, default=0)
parser.add_argument('--max_evaluate_depth', type=float, default=100)
# Hardware settings
parser.add_argument('--n_thread', type=int, default=10)
parser.add_argument('--n_data_parallel', type=int, default=None)
parser.add_argument('--max_points_inference', type=int, default=0)
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
    args.encoder_type = '-'.join(args.encoder_type)
    args.decoder_type = '-'.join(args.decoder_type)

    radarnet_main.train(
        train_image_path=args.train_image_path,
        train_radar_path=args.train_radar_path,
        train_ground_truth_path=args.train_ground_truth_path,
        val_image_path=args.val_image_path,
        val_radar_path=args.val_radar_path,
        val_ground_truth_path=args.val_ground_truth_path,
        batch_size=args.batch_size,
        patch_size=args.patch_size,
        total_points_sampled=args.total_points_sampled,
        sample_probability_of_lidar=args.sample_probability_lidar,
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
        learning_rates=args.learning_rates,
        learning_schedule=args.learning_schedule,
        augmentation_probabilities=args.augmentation_probabilities,
        augmentation_schedule=args.augmentation_schedule,
        augmentation_random_brightness=args.augmentation_random_brightness,
        augmentation_random_contrast=args.augmentation_random_contrast,
        augmentation_random_saturation=args.augmentation_random_saturation,
        augmentation_random_noise_type=args.augmentation_random_noise_type,
        augmentation_random_noise_spread=args.augmentation_random_noise_spread,
        augmentation_random_flip_type=args.augmentation_random_flip_type,
        w_weight_decay=args.w_weight_decay,
        w_positive_class=args.w_positive_class,
        max_distance_correspondence=args.max_distance_correspondence,
        set_invalid_to_negative_class=args.set_invalid_to_negative_class,
        checkpoint_dirpath=args.checkpoint_dirpath,
        n_step_per_checkpoint=args.n_step_per_checkpoint,
        n_step_per_summary=args.n_step_per_summary,
        start_step_validation=args.start_step_validation,
        restore_path=args.restore_path,
        min_evaluate_depth=args.min_evaluate_depth,
        max_evaluate_depth=args.max_evaluate_depth,
        n_thread=args.n_thread,
        n_data_parallel=args.n_data_parallel,
        max_points_inference=args.max_points_inference,
        eval_batch_size=args.eval_batch_size,
        seed=args.seed)

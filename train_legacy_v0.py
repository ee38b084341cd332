"""CLI: train the legacy v0 single-point correspondence model
(drop-in for reference src/train.py -> src/main.py:26-505)."""

import argparse

from rcfd_tpu import legacy_main

parser = argparse.ArgumentParser()

parser.add_argument('--path_to_pickle_file_gt_train_paths', type=str,
                    required=True)
parser.add_argument('--path_to_pickle_file_radar_train_numpys', type=str,
                    required=True)
parser.add_argument('--path_to_pickle_file_gt_val_paths', type=str,
                    required=True)
parser.add_argument('--path_to_pickle_file_radar_val_numpys', type=str,
                    required=True)
parser.add_argument('--data_path', type=str, default='')
parser.add_argument('--image_path', type=str, required=True)
parser.add_argument('--epsilon', type=float, default=0.4)
# Input settings
parser.add_argument('--batch_size', type=int, default=6)
parser.add_argument('--patch_size', nargs='+', type=int, default=[900, 288])
parser.add_argument('--normalized_image_range', nargs='+', type=float,
                    default=[0, 1])
# Training settings
parser.add_argument('--learning_rates', nargs='+', type=float, default=[2e-4])
parser.add_argument('--learning_schedule', nargs='+', type=int, default=[200])
parser.add_argument('--augmentation_probabilities', nargs='+', type=float,
                    default=[1.0])
parser.add_argument('--augmentation_schedule', nargs='+', type=int,
                    default=[-1])
parser.add_argument('--augmentation_random_brightness', nargs='+', type=float,
                    default=[-1, -1])
parser.add_argument('--augmentation_random_noise_type', type=str,
                    default='none')
parser.add_argument('--augmentation_random_noise_spread', type=float,
                    default=-1)
parser.add_argument('--augmentation_random_flip_type', nargs='+', type=str,
                    default=['none'])
# Loss settings
parser.add_argument('--w_cross_entropy', type=float, default=1.0)
parser.add_argument('--w_smoothness', type=float, default=0.0)
parser.add_argument('--w_weight_decay', type=float, default=0.0)
parser.add_argument('--kernel_size_smoothness', nargs='+', type=int,
                    default=[7, 7])
parser.add_argument('--set_invalid_to_negative', action='store_true')
parser.add_argument('--w_positive_class', type=float, default=1.0)
# Checkpoint settings
parser.add_argument('--checkpoint_dirpath', type=str, required=True)
parser.add_argument('--num_step_per_checkpoint', type=int, default=5000)
parser.add_argument('--num_step_per_summary', type=int, default=1000)
parser.add_argument('--start_step_validation', type=int, default=5000)
parser.add_argument('--restore_path', type=str, default=None)
parser.add_argument('--min_evaluate_depth', type=float, default=0)
parser.add_argument('--max_evaluate_depth', type=float, default=100)
parser.add_argument('--max_points_inference', type=int, default=128)
# Hardware and debugging
parser.add_argument('--debug', action='store_true')
parser.add_argument('--num_workers', type=int, default=10)
parser.add_argument('--seed', type=int, default=0)


if __name__ == '__main__':
    args = parser.parse_args()
    legacy_main.train(
        path_to_pickle_file_gt_train_paths=args.path_to_pickle_file_gt_train_paths,
        path_to_pickle_file_radar_train_numpys=args.path_to_pickle_file_radar_train_numpys,
        path_to_pickle_file_gt_val_paths=args.path_to_pickle_file_gt_val_paths,
        path_to_pickle_file_radar_val_numpys=args.path_to_pickle_file_radar_val_numpys,
        data_path=args.data_path,
        image_path=args.image_path,
        epsilon=args.epsilon,
        batch_size=args.batch_size,
        patch_size=args.patch_size,
        normalized_image_range=args.normalized_image_range,
        learning_rates=args.learning_rates,
        learning_schedule=args.learning_schedule,
        augmentation_probabilities=args.augmentation_probabilities,
        augmentation_schedule=args.augmentation_schedule,
        augmentation_random_brightness=args.augmentation_random_brightness,
        augmentation_random_noise_type=args.augmentation_random_noise_type,
        augmentation_random_noise_spread=args.augmentation_random_noise_spread,
        augmentation_random_flip_type=args.augmentation_random_flip_type,
        w_cross_entropy=args.w_cross_entropy,
        w_smoothness=args.w_smoothness,
        w_weight_decay=args.w_weight_decay,
        kernel_size_smoothness=args.kernel_size_smoothness,
        set_invalid_to_negative=args.set_invalid_to_negative,
        w_positive_class=args.w_positive_class,
        checkpoint_dirpath=args.checkpoint_dirpath,
        num_step_per_summary=args.num_step_per_summary,
        num_step_per_checkpoint=args.num_step_per_checkpoint,
        start_step_validation=args.start_step_validation,
        restore_path=args.restore_path,
        min_evaluate_depth=args.min_evaluate_depth,
        max_evaluate_depth=args.max_evaluate_depth,
        max_points_inference=args.max_points_inference,
        debug=args.debug,
        num_workers=args.num_workers,
        seed=args.seed)

"""CLI: evaluate saved legacy stage-1 quasi-dense depth maps against
ground truth (drop-in for reference src/eval_stage_1_depth.py)."""

import argparse

from rcfd_tpu import legacy_main

parser = argparse.ArgumentParser()
parser.add_argument('--path_to_pickle_file_output_paths', type=str,
                    required=True)
parser.add_argument('--path_to_pickle_file_gt_paths', type=str, required=True)
parser.add_argument('--data_path', type=str, default='')
parser.add_argument('--min_evaluate_depth', type=float, default=0.0)
parser.add_argument('--max_evaluate_depth', type=float, default=100.0)

if __name__ == '__main__':
    args = parser.parse_args()
    legacy_main.eval_stage_1(
        path_to_pickle_file_output_paths=args.path_to_pickle_file_output_paths,
        path_to_pickle_file_gt_paths=args.path_to_pickle_file_gt_paths,
        data_path=args.data_path,
        min_evaluate_depth=args.min_evaluate_depth,
        max_evaluate_depth=args.max_evaluate_depth)

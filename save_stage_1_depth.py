"""CLI: run the trained legacy v0 model over a split, saving quasi-dense
depth/response PNGs + pickled output manifests (drop-in for reference
src/save_stage_1_depth.py / save_stage_1_utils.run; flags replace its
hard-coded module constants)."""

import argparse

from rcfd_tpu import legacy_main

parser = argparse.ArgumentParser()
parser.add_argument('--restore_path', type=str, required=True)
parser.add_argument('--path_to_pickle_file_gt_paths', type=str, required=True)
parser.add_argument('--path_to_pickle_file_radar_numpy_paths', type=str,
                    required=True)
parser.add_argument('--image_dirpath', type=str, required=True)
parser.add_argument('--output_dirpath', type=str, required=True)
parser.add_argument('--data_path', type=str, default='')
parser.add_argument('--patch_size', nargs='+', type=int, default=[900, 288])
parser.add_argument('--normalized_image_range', nargs='+', type=float,
                    default=[0, 1])
parser.add_argument('--max_points_inference', type=int, default=128)
parser.add_argument('--file_to_save_radar_output_paths', type=str,
                    default=None)
parser.add_argument('--file_to_save_radar_response_paths', type=str,
                    default=None)
parser.add_argument('--verbose', action='store_true')

if __name__ == '__main__':
    args = parser.parse_args()
    legacy_main.save_stage_1(
        restore_path=args.restore_path,
        path_to_pickle_file_gt_paths=args.path_to_pickle_file_gt_paths,
        path_to_pickle_file_radar_numpy_paths=args.path_to_pickle_file_radar_numpy_paths,
        image_dirpath=args.image_dirpath,
        output_dirpath=args.output_dirpath,
        patch_size=tuple(args.patch_size),
        data_path=args.data_path,
        max_points_inference=args.max_points_inference,
        normalized_image_range=args.normalized_image_range,
        file_to_save_radar_output_paths=args.file_to_save_radar_output_paths,
        file_to_save_radar_response_paths=args.file_to_save_radar_response_paths,
        verbose=args.verbose)

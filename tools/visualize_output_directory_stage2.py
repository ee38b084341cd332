"""Visualize a directory of FusionNet (stage 2) dense depth outputs
(TPU port of reference tools/visualize_output_directory_stage2.py)."""

import argparse
import os
import sys

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcfd_tpu.data import io as data_utils


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--image_dirpath', type=str, default=None)
    parser.add_argument('--depth_dirpath', type=str, required=True)
    parser.add_argument('--output_dirpath', type=str, required=True)
    parser.add_argument('--max_depth', type=float, default=80.0)
    parser.add_argument('--n_sample', type=int, default=-1)
    args = parser.parse_args()

    depth_files = sorted(os.listdir(args.depth_dirpath))
    os.makedirs(args.output_dirpath, exist_ok=True)
    n = len(depth_files) if args.n_sample < 0 else args.n_sample

    for idx, fname in enumerate(depth_files[:n]):
        depth = data_utils.load_depth(os.path.join(args.depth_dirpath, fname))
        has_image = args.image_dirpath is not None and os.path.exists(
            os.path.join(args.image_dirpath, fname))
        n_rows = 2 if has_image else 1
        fig, axes = plt.subplots(n_rows, 1, figsize=(12, 4 * n_rows),
                                 squeeze=False)
        row = 0
        if has_image:
            image = data_utils.load_image(
                os.path.join(args.image_dirpath, fname), normalize=True)
            axes[row][0].imshow(image)
            axes[row][0].set_title('image')
            row += 1
        axes[row][0].imshow(depth, cmap='viridis', vmin=0, vmax=args.max_depth)
        axes[row][0].set_title('dense depth')
        for r in axes:
            r[0].axis('off')
        fig.tight_layout()
        fig.savefig(os.path.join(args.output_dirpath, fname), dpi=100)
        plt.close(fig)
        print('visualized {}/{}'.format(idx + 1, n), end='\r')


if __name__ == '__main__':
    main()

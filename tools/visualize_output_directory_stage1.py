"""Visualize a directory of RadarNet (stage 1) outputs: quasi-dense depth +
response maps (TPU port of reference tools/visualize_output_directory_stage1.py)."""

import argparse
import os
import sys

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcfd_tpu.data import io as data_utils


def dilate(depth, k=3):
    """Max-dilate sparse maps for display."""
    from scipy.ndimage import grey_dilation
    return grey_dilation(depth, size=(k, k))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--depth_dirpath', type=str, required=True)
    parser.add_argument('--response_dirpath', type=str, required=True)
    parser.add_argument('--output_dirpath', type=str, required=True)
    parser.add_argument('--max_depth', type=float, default=100.0)
    parser.add_argument('--n_sample', type=int, default=-1)
    args = parser.parse_args()

    depth_files = sorted(os.listdir(args.depth_dirpath))
    os.makedirs(args.output_dirpath, exist_ok=True)
    n = len(depth_files) if args.n_sample < 0 else args.n_sample

    for idx, fname in enumerate(depth_files[:n]):
        depth = data_utils.load_depth(
            os.path.join(args.depth_dirpath, fname))
        response = data_utils.load_response(
            os.path.join(args.response_dirpath, fname))

        fig, axes = plt.subplots(2, 1, figsize=(12, 8))
        axes[0].imshow(dilate(depth), cmap='viridis', vmin=0,
                       vmax=args.max_depth)
        axes[0].set_title('quasi-dense depth')
        axes[1].imshow(dilate(response), cmap='inferno', vmin=0, vmax=1)
        axes[1].set_title('response')
        for ax in axes:
            ax.axis('off')
        fig.tight_layout()
        fig.savefig(os.path.join(args.output_dirpath, fname), dpi=100)
        plt.close(fig)
        print('visualized {}/{}'.format(idx + 1, n), end='\r')


if __name__ == '__main__':
    main()

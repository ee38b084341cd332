"""Side-by-side visualization of image / sparse input / output depth
(TPU port of reference tools/visualize_output.py)."""

import argparse
import os
import sys

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcfd_tpu.data import io as data_utils


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--image_path', type=str, required=True,
                        help='Manifest of image paths')
    parser.add_argument('--input_depth_path', type=str, default=None,
                        help='Manifest of sparse/quasi-dense input depth')
    parser.add_argument('--output_depth_path', type=str, required=True,
                        help='Manifest of output depth paths')
    parser.add_argument('--output_dirpath', type=str, required=True)
    parser.add_argument('--max_depth', type=float, default=80.0)
    parser.add_argument('--colormap', type=str, default='viridis')
    parser.add_argument('--n_sample', type=int, default=-1)
    args = parser.parse_args()

    image_paths = data_utils.read_paths(args.image_path)
    output_paths = data_utils.read_paths(args.output_depth_path)
    input_paths = data_utils.read_paths(args.input_depth_path) \
        if args.input_depth_path else None

    os.makedirs(args.output_dirpath, exist_ok=True)
    n = len(image_paths) if args.n_sample < 0 else args.n_sample

    for idx in range(min(n, len(image_paths))):
        image = data_utils.load_image(image_paths[idx], normalize=True)
        output = data_utils.load_depth(output_paths[idx])

        n_rows = 3 if input_paths else 2
        fig, axes = plt.subplots(n_rows, 1, figsize=(12, 4 * n_rows))
        axes[0].imshow(image)
        axes[0].set_title('image')
        row = 1
        if input_paths:
            input_depth = data_utils.load_depth(input_paths[idx])
            axes[row].imshow(np.where(input_depth > 0, input_depth, np.nan),
                             cmap=args.colormap, vmin=0, vmax=args.max_depth)
            axes[row].set_title('input depth')
            row += 1
        axes[row].imshow(output, cmap=args.colormap, vmin=0,
                         vmax=args.max_depth)
        axes[row].set_title('output depth')
        for ax in axes:
            ax.axis('off')
        fig.tight_layout()
        fig.savefig(os.path.join(args.output_dirpath,
                                 '{:010d}.png'.format(idx)), dpi=100)
        plt.close(fig)
        print('visualized {}/{}'.format(idx + 1, n), end='\r')


if __name__ == '__main__':
    main()

"""Real-data accuracy-parity protocol: reference (torch CPU) vs this
framework on the SAME checkpoint and the SAME frames, side by side.

This is the runbook that fills BASELINE.md's measured table once the
released checkpoints (reference README.md:87-91, Google Drive) and a
prepared nuScenes split are on disk. It executes, in one invocation:

  1. reference eval — the PyTorch FusionNetModel from /root/reference
     run under the reference protocol (src/fusionnet_main.py:608-896:
     load_depth-quirk response decode, [0,1] image normalization,
     gt>0 ∧ (min,max) validity mask, mm / 1/km metric scaling);
  2. checkpoint transfer — the same .pth restored into our model
     (rcfd_tpu reads reference .pth natively; tools/convert_checkpoint.py
     is the offline equivalent);
  3. our eval — rcfd_tpu.fusionnet_main.run over the same manifests;
  4. a side-by-side MAE/RMSE/iMAE/iRMSE table with deltas and a
     PASS/FAIL verdict against --tolerance_* .

Protocol values (bash/run_fusionnet_nuscenes.sh): val GT = single-scan
lidar manifest, --max_evaluate_depth 80; test protocol uses 70.

Example (val split, released checkpoint):
  python tools/parity_protocol.py \
      --fusionnet_checkpoint fusionnet-nuscenes.pth \
      --image_path    testing/nuscenes/nuscenes_val_image.txt \
      --depth_path    testing/nuscenes/nuscenes_val_depth_predicted.txt \
      --response_path testing/nuscenes/nuscenes_val_response_predicted.txt \
      --ground_truth_path testing/nuscenes/nuscenes_val_lidar.txt \
      --max_evaluate_depth 80 --output_dirpath parity_out

The harness itself is smoke-tested over a synthetic fixture + random
weights in tests/test_parity_protocol.py (no nuScenes data needed).
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

from rcfd_tpu.data import io as data_utils
from rcfd_tpu.utils import eval_utils


def load_reference_fusionnet_module():
    """Import the reference's fusionnet_model (torch CPU) in place, with
    the torchvision stub from tests/reference_import. Returns None when
    the reference tree or torch is unavailable."""
    try:
        from reference_import import REFERENCE_SRC, install_torchvision_stub
        if not os.path.isdir(REFERENCE_SRC):
            return None
        install_torchvision_stub()
        if REFERENCE_SRC not in sys.path:
            sys.path.insert(0, REFERENCE_SRC)
        import importlib
        return importlib.import_module('fusionnet_model')
    except ImportError:
        return None


def reference_eval(checkpoint_path, image_paths, depth_paths, response_paths,
                   ground_truth_paths, net, min_evaluate_depth,
                   max_evaluate_depth, normalized_image_range, verbose):
    """Reference-protocol evaluation with the reference's own model code
    (mirrors src/fusionnet_main.py:608-896 without its DataLoader)."""
    try:
        import torch
    except ImportError:
        return None

    fusionnet_model = load_reference_fusionnet_module()
    if fusionnet_model is None:
        return None

    model = fusionnet_model.FusionNetModel(
        input_channels_image=net['input_channels_image'],
        input_channels_depth=net['input_channels_depth'],
        encoder_type=net['encoder_type'],
        n_filters_encoder_image=net['n_filters_encoder_image'],
        n_filters_encoder_depth=net['n_filters_encoder_depth'],
        fusion_type=net['fusion_type'],
        decoder_type=net['decoder_type'],
        n_resolution_decoder=net['n_resolutions_decoder'],
        n_filters_decoder=net['n_filters_decoder'],
        deconv_type='up',
        activation_func=net['activation_func'],
        weight_initializer=net['weight_initializer'],
        min_predict_depth=net['min_predict_depth'],
        max_predict_depth=net['max_predict_depth'],
        device=torch.device('cpu'))
    model.restore_model(checkpoint_path)
    model.eval()

    lo, hi = normalized_image_range
    n_sample = len(image_paths)
    mae = np.zeros(n_sample)
    rmse = np.zeros(n_sample)
    imae = np.zeros(n_sample)
    irmse = np.zeros(n_sample)

    for idx in range(n_sample):
        image = data_utils.load_image(image_paths[idx], normalize=False,
                                      data_format='CHW')
        depth = data_utils.load_depth(depth_paths[idx], data_format='CHW')
        # the reference reads responses back with load_depth (x256), not
        # load_response (src/datasets.py:505-507) — keep the quirk
        response = data_utils.load_depth(response_paths[idx],
                                         data_format='CHW')
        gt = data_utils.load_depth(ground_truth_paths[idx],
                                   data_format='CHW')[0]

        image = image.astype(np.float32) / 255.0 * (hi - lo) + lo
        input_depth = np.concatenate([depth, response], axis=0)

        with torch.no_grad():
            output = model.forward(
                image=torch.from_numpy(image[None].astype(np.float32)),
                input_depth=torch.from_numpy(
                    input_depth[None].astype(np.float32)))
        output = output.numpy()[0, 0]

        mask = np.where(np.logical_and(
            gt > 0,
            np.logical_and(gt > min_evaluate_depth,
                           gt < max_evaluate_depth)) > 0)
        out_m, gt_m = output[mask], gt[mask]
        mae[idx] = eval_utils.mean_abs_err(1000.0 * out_m, 1000.0 * gt_m)
        rmse[idx] = eval_utils.root_mean_sq_err(1000.0 * out_m, 1000.0 * gt_m)
        imae[idx] = eval_utils.inv_mean_abs_err(0.001 * out_m, 0.001 * gt_m)
        irmse[idx] = eval_utils.inv_root_mean_sq_err(0.001 * out_m,
                                                     0.001 * gt_m)
        if verbose:
            print('[reference] {}/{}'.format(idx + 1, n_sample), end='\r')

    return {'mae': float(np.mean(mae)), 'rmse': float(np.mean(rmse)),
            'imae': float(np.mean(imae)), 'irmse': float(np.mean(irmse))}


def ours_eval(checkpoint_path, args, net, output_dirpath):
    """Our stack under the same protocol (rcfd_tpu.fusionnet_main.run)."""
    from rcfd_tpu import fusionnet_main
    results = fusionnet_main.run(
        restore_path=checkpoint_path,
        image_path=args.image_path,
        depth_path=args.depth_path,
        response_path=args.response_path,
        ground_truth_path=args.ground_truth_path,
        input_channels_image=net['input_channels_image'],
        input_channels_depth=net['input_channels_depth'],
        normalized_image_range=list(args.normalized_image_range),
        encoder_type=net['encoder_type'],
        n_filters_encoder_image=net['n_filters_encoder_image'],
        n_filters_encoder_depth=net['n_filters_encoder_depth'],
        fusion_type=net['fusion_type'],
        decoder_type=net['decoder_type'],
        n_filters_decoder=net['n_filters_decoder'],
        n_resolutions_decoder=net['n_resolutions_decoder'],
        min_predict_depth=net['min_predict_depth'],
        max_predict_depth=net['max_predict_depth'],
        weight_initializer=net['weight_initializer'],
        activation_func=net['activation_func'],
        output_dirpath=output_dirpath,
        save_outputs=False,
        keep_input_filenames=False,
        verbose=args.verbose,
        min_evaluate_depth=args.min_evaluate_depth,
        max_evaluate_depth=args.max_evaluate_depth,
        eval_batch_size=args.eval_batch_size)
    return results


def format_table(ref, ours, tol_mm, tol_inv, tol_rel=1e-3):
    """Markdown-ready side-by-side table + PASS/FAIL. ref may be None
    (reference unavailable) — then only our numbers print.

    The per-metric tolerance is absolute + relative:
    ``tol_abs + tol_rel * |ref|``. The relative term keeps the verdict
    meaningful when the metric's magnitude is far from the trained-
    checkpoint regime the absolute defaults were calibrated for (e.g. a
    random-init synthetic smoke, where iMAE is ~460 1/km instead of ~4 —
    conv-algorithm noise alone then exceeds a bare 0.05 1/km)."""
    units = {'mae': 'mm', 'rmse': 'mm', 'imae': '1/km', 'irmse': '1/km'}
    tols = {'mae': tol_mm, 'rmse': tol_mm, 'imae': tol_inv, 'irmse': tol_inv}
    lines = ['| metric | reference (torch CPU) | rcfd_tpu | delta | '
             'tolerance | verdict |',
             '|---|---|---|---|---|---|']
    all_pass = True
    for k in ['mae', 'rmse', 'imae', 'irmse']:
        if ref is None:
            lines.append('| {} ({}) | n/a | {:.3f} | — | — | — |'.format(
                k.upper(), units[k], ours[k]))
            continue
        delta = abs(ours[k] - ref[k])
        tol = tols[k] + tol_rel * abs(ref[k])
        ok = delta <= tol
        all_pass = all_pass and ok
        lines.append(
            '| {} ({}) | {:.3f} | {:.3f} | {:.3f} | {:.3f} | {} |'.format(
                k.upper(), units[k], ref[k], ours[k], delta, tol,
                'PASS' if ok else 'FAIL'))
    verdict = ('PARITY PASS' if ref is not None and all_pass else
               'PARITY FAIL' if ref is not None else
               'REFERENCE UNAVAILABLE (our metrics only)')
    return '\n'.join(lines), verdict


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument('--synthetic', action='store_true',
                        help='CI smoke: generate a tiny synthetic fixture '
                             '+ random-init checkpoint and run the FULL '
                             'report path (tiny net config overrides the '
                             'release defaults); the real-data run is then '
                             'a data-swap away')
    parser.add_argument('--fusionnet_checkpoint', type=str, default=None,
                        help='reference-format .pth (released weights) or '
                             'native .npz')
    parser.add_argument('--image_path', type=str, default=None)
    parser.add_argument('--depth_path', type=str, default=None)
    parser.add_argument('--response_path', type=str, default=None)
    parser.add_argument('--ground_truth_path', type=str, default=None)
    parser.add_argument('--normalized_image_range', nargs='+', type=float,
                        default=[0, 1])
    # network settings (canonical release config)
    parser.add_argument('--input_channels_image', type=int, default=3)
    parser.add_argument('--input_channels_depth', type=int, default=2)
    parser.add_argument('--encoder_type', nargs='+', type=str,
                        default=['fusionnet18', 'batch_norm'])
    parser.add_argument('--n_filters_encoder_image', nargs='+', type=int,
                        default=[32, 64, 128, 256, 256, 256])
    parser.add_argument('--n_filters_encoder_depth', nargs='+', type=int,
                        default=[16, 32, 64, 128, 128, 128])
    parser.add_argument('--fusion_type', type=str,
                        default='weight_and_project')
    parser.add_argument('--decoder_type', nargs='+', type=str,
                        default=['multiscale', 'batch_norm'])
    parser.add_argument('--n_filters_decoder', nargs='+', type=int,
                        default=[256, 256, 128, 64, 64, 32])
    parser.add_argument('--n_resolutions_decoder', type=int, default=1)
    parser.add_argument('--min_predict_depth', type=float, default=1.0)
    parser.add_argument('--max_predict_depth', type=float, default=100.0)
    parser.add_argument('--weight_initializer', type=str,
                        default='kaiming_uniform')
    parser.add_argument('--activation_func', type=str, default='leaky_relu')
    # protocol
    parser.add_argument('--min_evaluate_depth', type=float, default=0.0)
    parser.add_argument('--max_evaluate_depth', type=float, default=80.0,
                        help='80 = val protocol, 70 = test protocol')
    parser.add_argument('--eval_batch_size', type=int, default=8)
    parser.add_argument('--tolerance_mm', type=float, default=10.0,
                        help='max |delta| for MAE/RMSE (mm)')
    parser.add_argument('--tolerance_inv', type=float, default=0.05,
                        help='max |delta| for iMAE/iRMSE (1/km)')
    parser.add_argument('--tolerance_rel', type=float, default=1e-3,
                        help='relative tolerance added per metric: the '
                             'effective bound is tol_abs + tol_rel*|ref| '
                             '(keeps the verdict calibrated when metric '
                             'magnitudes are far from the trained regime)')
    parser.add_argument('--skip_reference', action='store_true',
                        help='only run our stack (when torch or the '
                             'reference tree is absent)')
    parser.add_argument('--output_dirpath', type=str, required=True)
    parser.add_argument('--verbose', action='store_true')
    return parser


def _setup_synthetic(args):
    """--synthetic: build the fixture + random-init tiny checkpoint inside
    the output dir and rewrite args to point at them."""
    import jax

    from fixtures import make_fusionnet_fixture
    from rcfd_tpu.models import FusionNetModel

    tiny = dict(
        image=[8, 12, 16, 16, 16], depth=[4, 6, 8, 8, 8],
        decoder=[16, 12, 8, 8, 8])
    data_dir = os.path.join(args.output_dirpath, 'synthetic_data')
    manifests = make_fusionnet_fixture(data_dir, n_samples=2,
                                       height=32, width=48)
    model = FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=tiny['image'],
        n_filters_encoder_depth=tiny['depth'],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=1, n_filters_decoder=tiny['decoder'],
        min_predict_depth=1.0, max_predict_depth=100.0)
    params, state = model.init(jax.random.PRNGKey(0))
    ckpt = os.path.join(args.output_dirpath, 'synthetic-model-0.pth')
    model.save_checkpoint(ckpt, params, state, step=0)

    args.fusionnet_checkpoint = ckpt
    args.image_path = manifests['image']
    args.depth_path = manifests['depth']
    args.response_path = manifests['response']
    args.ground_truth_path = manifests['ground_truth']
    args.n_filters_encoder_image = tiny['image']
    args.n_filters_encoder_depth = tiny['depth']
    args.n_filters_decoder = tiny['decoder']
    return args


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dirpath, exist_ok=True)
    if args.synthetic:
        args = _setup_synthetic(args)
    missing = [n for n in ('fusionnet_checkpoint', 'image_path',
                           'depth_path', 'response_path',
                           'ground_truth_path')
               if getattr(args, n) is None]
    if missing:
        build_parser().error(
            'the following arguments are required (or pass --synthetic): '
            + ', '.join('--' + m for m in missing))

    net = dict(
        input_channels_image=args.input_channels_image,
        input_channels_depth=args.input_channels_depth,
        encoder_type='-'.join(args.encoder_type),
        n_filters_encoder_image=args.n_filters_encoder_image,
        n_filters_encoder_depth=args.n_filters_encoder_depth,
        fusion_type=args.fusion_type,
        decoder_type='-'.join(args.decoder_type),
        n_filters_decoder=args.n_filters_decoder,
        n_resolutions_decoder=args.n_resolutions_decoder,
        min_predict_depth=args.min_predict_depth,
        max_predict_depth=args.max_predict_depth,
        weight_initializer=args.weight_initializer,
        activation_func=args.activation_func)

    image_paths = data_utils.read_paths(args.image_path)
    depth_paths = data_utils.read_paths(args.depth_path)
    response_paths = data_utils.read_paths(args.response_path)
    gt_paths = data_utils.read_paths(args.ground_truth_path)
    assert len(image_paths) == len(depth_paths) == len(response_paths) \
        == len(gt_paths)

    ref_results = None
    if not args.skip_reference:
        ref_results = reference_eval(
            args.fusionnet_checkpoint, image_paths, depth_paths,
            response_paths, gt_paths, net, args.min_evaluate_depth,
            args.max_evaluate_depth, args.normalized_image_range,
            args.verbose)
        if ref_results is None:
            print('reference tree / torch unavailable — running our '
                  'stack only (pass --skip_reference to silence)')

    our_results = ours_eval(args.fusionnet_checkpoint, args, net,
                            args.output_dirpath)

    table, verdict = format_table(ref_results, our_results,
                                  args.tolerance_mm, args.tolerance_inv,
                                  args.tolerance_rel)
    report = ('# Parity protocol report\n\n'
              'checkpoint: {}\nframes: {}\nprotocol: depth in ({}, {}) m, '
              'GT > 0\n\n{}\n\n**{}**\n'.format(
                  args.fusionnet_checkpoint, len(image_paths),
                  args.min_evaluate_depth, args.max_evaluate_depth, table,
                  verdict))
    print(report)
    report_path = os.path.join(args.output_dirpath, 'parity_report.md')
    with open(report_path, 'w') as f:
        f.write(report)
    print('wrote {}'.format(report_path))
    return ref_results, our_results, verdict


if __name__ == '__main__':
    main()

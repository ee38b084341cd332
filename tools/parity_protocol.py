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


def load_reference_module(name='fusionnet_model'):
    """Import a reference src module (torch CPU) in place, with the
    torchvision stub from tests/reference_import. Returns None when the
    reference tree or torch is unavailable."""
    try:
        from reference_import import REFERENCE_SRC, install_torchvision_stub
        if not os.path.isdir(REFERENCE_SRC):
            return None
        install_torchvision_stub()
        if REFERENCE_SRC not in sys.path:
            sys.path.insert(0, REFERENCE_SRC)
        import importlib
        return importlib.import_module(name)
    except ImportError:
        return None


def load_reference_fusionnet_module():
    return load_reference_module('fusionnet_model')


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


def _metric_row(out_m, gt_m):
    return (eval_utils.mean_abs_err(1000.0 * out_m, 1000.0 * gt_m),
            eval_utils.root_mean_sq_err(1000.0 * out_m, 1000.0 * gt_m),
            eval_utils.inv_mean_abs_err(0.001 * out_m, 0.001 * gt_m),
            eval_utils.inv_root_mean_sq_err(0.001 * out_m, 0.001 * gt_m))


def reference_two_stage_eval(args, rn_net, fn_net, image_paths, radar_paths,
                             gt_paths, bridge_dir, verbose):
    """The reference's FULL evaluation chain, with the reference's own
    model code: trained RadarNet scatter inference
    (src/radarnet_main.py:534-591) -> real 16-bit PNG bridge write/read
    (setup/setup_dataset_nuscenes_radarnet.py:344-345; BOTH streams
    re-read through load_depth x256 per src/datasets.py:412-415) ->
    FusionNet eval (src/fusionnet_main.py:608-896).

    Returns {'stage1': intersection metrics, 'stage2': metrics} or None
    when torch / the reference tree is unavailable."""
    try:
        import torch
    except ImportError:
        return None
    ref_rn_model_mod = load_reference_module('radarnet_model')
    ref_rn_main = load_reference_module('radarnet_main')
    ref_fn_model_mod = load_reference_module('fusionnet_model')
    ref_du = load_reference_module('data_utils')
    if None in (ref_rn_model_mod, ref_rn_main, ref_fn_model_mod, ref_du):
        return None

    device = torch.device('cpu')
    ref_rn = ref_rn_model_mod.RadarNetModel(
        input_channels_image=rn_net['input_channels_image'],
        input_channels_depth=rn_net['input_channels_depth'],
        input_patch_size_image=tuple(rn_net['patch_size']),
        encoder_type=rn_net['encoder_type'],
        n_filters_encoder_image=rn_net['n_filters_encoder_image'],
        n_neurons_encoder_depth=rn_net['n_neurons_encoder_depth'],
        decoder_type=rn_net['decoder_type'],
        n_filters_decoder=rn_net['n_filters_decoder'],
        weight_initializer=rn_net['weight_initializer'],
        activation_func=rn_net['activation_func'], device=device)
    ref_rn.restore_model(args.radarnet_checkpoint)
    ref_rn.eval()
    ref_fn = ref_fn_model_mod.FusionNetModel(
        input_channels_image=fn_net['input_channels_image'],
        input_channels_depth=fn_net['input_channels_depth'],
        encoder_type=fn_net['encoder_type'],
        n_filters_encoder_image=fn_net['n_filters_encoder_image'],
        n_filters_encoder_depth=fn_net['n_filters_encoder_depth'],
        fusion_type=fn_net['fusion_type'],
        decoder_type=fn_net['decoder_type'],
        n_resolution_decoder=fn_net['n_resolutions_decoder'],
        n_filters_decoder=fn_net['n_filters_decoder'],
        deconv_type='up', activation_func=fn_net['activation_func'],
        weight_initializer=fn_net['weight_initializer'],
        min_predict_depth=fn_net['min_predict_depth'],
        max_predict_depth=fn_net['max_predict_depth'], device=device)
    ref_fn.restore_model(args.fusionnet_checkpoint)
    ref_fn.eval()

    os.makedirs(os.path.join(bridge_dir, 'depth_predicted'), exist_ok=True)
    os.makedirs(os.path.join(bridge_dir, 'response_predicted'),
                exist_ok=True)

    lo, hi = args.normalized_image_range
    pad = rn_net['patch_size'][1] // 2
    n_sample = len(image_paths)
    s1 = np.full((n_sample, 4), np.nan)
    s2 = np.zeros((n_sample, 4))
    for idx in range(n_sample):
        image = data_utils.load_image(image_paths[idx], normalize=False,
                                      data_format='CHW')
        image = image.astype(np.float32) / 255.0 * (hi - lo) + lo
        points = np.load(radar_paths[idx]).astype(np.float32)
        if points.ndim == 1:
            points = points[None]
        gt = data_utils.load_depth(gt_paths[idx], data_format='CHW')[0]
        h = image.shape[1]

        with torch.no_grad():
            t_image = torch.from_numpy(image[None])
            t_points = torch.from_numpy(points.copy())
            t_points[:, 0] += pad
            boxes = [torch.stack([
                torch.stack([x - pad, torch.tensor(0.0), x + pad,
                             torch.tensor(float(h))])
                for x in t_points[:, 0]], dim=0)]
            quasi_depth, quasi_response = ref_rn_main.forward(
                model=ref_rn, image=t_image, radar_points=t_points,
                bounding_boxes_list=boxes, device=device)
        quasi_depth = quasi_depth.numpy()[0]
        quasi_response = quasi_response.numpy()[0]

        # the REAL PNG bridge, reference codecs both directions
        depth_png = os.path.join(bridge_dir, 'depth_predicted',
                                 '{:010d}.png'.format(idx))
        response_png = os.path.join(bridge_dir, 'response_predicted',
                                    '{:010d}.png'.format(idx))
        ref_du.save_depth(quasi_depth, depth_png)
        ref_du.save_response(quasi_response, response_png)
        depth_rt = ref_du.load_depth(depth_png)
        response_rt = ref_du.load_depth(response_png)  # x256 quirk

        # stage-1 intersection metrics (radarnet eval protocol,
        # src/radarnet_main.py:1013-1038)
        v_inter = (depth_rt > 0) & (gt > 0)
        rn_mask = np.where(v_inter & (gt > args.radarnet_min_evaluate_depth)
                           & (gt < args.radarnet_max_evaluate_depth))
        if rn_mask[0].size:
            s1[idx] = _metric_row(depth_rt[rn_mask], gt[rn_mask])

        with torch.no_grad():
            t_input_depth = torch.from_numpy(np.stack(
                [depth_rt, response_rt], axis=0)[None].astype(np.float32))
            output = ref_fn.forward(image=t_image,
                                    input_depth=t_input_depth)
        output = output.numpy()[0, 0]
        fn_mask = np.where((gt > 0) & (gt > args.min_evaluate_depth)
                           & (gt < args.max_evaluate_depth))
        s2[idx] = _metric_row(output[fn_mask], gt[fn_mask])
        if verbose:
            print('[reference 2-stage] {}/{}'.format(idx + 1, n_sample),
                  end='\r')

    keys = ['mae', 'rmse', 'imae', 'irmse']
    return {
        'stage1': dict(zip(keys, np.nanmean(s1, axis=0).tolist())),
        'stage2': dict(zip(keys, np.mean(s2, axis=0).tolist())),
    }


def ours_two_stage_eval(args, rn_net, fn_net, output_dirpath):
    """Our CLI chain under the same protocol: rcfd_tpu.radarnet_main.run
    (writes the real PNG bridge) -> manifests -> fusionnet_main.run; plus
    the fused TwoStagePipeline (quantize_bridge=True) over the same
    frames. Returns {'stage1', 'stage2', 'fused'} metric dicts."""
    from rcfd_tpu import fusionnet_main, radarnet_main

    bridge_dir = os.path.join(output_dirpath, 'ours_bridge')
    s1_results, depth_paths, response_paths = radarnet_main.run(
        restore_path=args.radarnet_checkpoint,
        image_path=args.image_path,
        radar_path=args.radar_path,
        ground_truth_path=args.ground_truth_path,
        patch_size=rn_net['patch_size'],
        input_channels_image=rn_net['input_channels_image'],
        input_channels_depth=rn_net['input_channels_depth'],
        normalized_image_range=list(args.normalized_image_range),
        encoder_type=rn_net['encoder_type'],
        n_filters_encoder_image=rn_net['n_filters_encoder_image'],
        n_neurons_encoder_depth=rn_net['n_neurons_encoder_depth'],
        decoder_type=rn_net['decoder_type'],
        n_filters_decoder=rn_net['n_filters_decoder'],
        weight_initializer=rn_net['weight_initializer'],
        activation_func=rn_net['activation_func'],
        output_dirpath=bridge_dir,
        save_outputs=True, keep_input_filenames=False,
        verbose=args.verbose,
        min_evaluate_depth=args.radarnet_min_evaluate_depth,
        max_evaluate_depth=args.radarnet_max_evaluate_depth,
        max_points_inference=args.max_points_inference,
        eval_batch_size=args.eval_batch_size)

    depth_manifest = os.path.join(bridge_dir, 'depth_predicted.txt')
    response_manifest = os.path.join(bridge_dir, 'response_predicted.txt')
    data_utils.write_paths(depth_manifest, depth_paths)
    data_utils.write_paths(response_manifest, response_paths)

    class _Stage2Args:
        pass

    a2 = _Stage2Args()
    for k, v in vars(args).items():
        setattr(a2, k, v)
    a2.depth_path = depth_manifest
    a2.response_path = response_manifest
    s2_results = ours_eval(args.fusionnet_checkpoint, a2, fn_net,
                           os.path.join(output_dirpath, 'ours_stage2'))

    fused_results = _ours_fused_eval(args, rn_net, fn_net)
    out = {'stage2': s2_results, 'fused': fused_results}
    if s1_results is not None:
        out['stage1'] = {k.replace('_intersection', ''): v
                         for k, v in s1_results.items()}
    return out


def _ours_fused_eval(args, rn_net, fn_net):
    """TwoStagePipeline (one jitted program, quantize_bridge=True) over
    the same manifests — the serving-path counterpart of the CLI chain."""
    from rcfd_tpu.data.datasets import RadarNetInferenceDataset
    from rcfd_tpu.data.loader import iter_device_batches
    from rcfd_tpu.data.transport import decode_np
    from rcfd_tpu.pipeline import TwoStagePipeline

    image_paths = data_utils.read_paths(args.image_path)
    radar_paths = data_utils.read_paths(args.radar_path)
    gt_paths = data_utils.read_paths(args.ground_truth_path)
    dataset = RadarNetInferenceDataset(
        image_paths=image_paths, radar_paths=radar_paths,
        ground_truth_paths=gt_paths,
        max_points=(None if args.max_points_inference <= 0
                    else args.max_points_inference))
    sample_image = data_utils.load_image(image_paths[0])
    pipeline = TwoStagePipeline.from_checkpoints(
        args.radarnet_checkpoint, args.fusionnet_checkpoint,
        image_height=sample_image.shape[0],
        image_width=sample_image.shape[1],
        patch_size=rn_net['patch_size'],
        radarnet_kwargs=dict(
            encoder_type=rn_net['encoder_type'],
            n_filters_encoder_image=rn_net['n_filters_encoder_image'],
            n_neurons_encoder_depth=rn_net['n_neurons_encoder_depth'],
            decoder_type=rn_net['decoder_type'],
            n_filters_decoder=rn_net['n_filters_decoder']),
        fusionnet_kwargs=dict(
            encoder_type=fn_net['encoder_type'],
            n_filters_encoder_image=fn_net['n_filters_encoder_image'],
            n_filters_encoder_depth=fn_net['n_filters_encoder_depth'],
            fusion_type=fn_net['fusion_type'],
            decoder_type=fn_net['decoder_type'],
            n_resolution_decoder=fn_net['n_resolutions_decoder'],
            n_filters_decoder=fn_net['n_filters_decoder'],
            min_predict_depth=fn_net['min_predict_depth'],
            max_predict_depth=fn_net['max_predict_depth']),
        normalized_image_range=tuple(args.normalized_image_range),
        quantize_bridge=True)

    rows = np.zeros((len(dataset), 4))
    for idxs, samples, (images, points, valid) in iter_device_batches(
            dataset, args.eval_batch_size, fields=(0, 1, 2)):
        dense_b, _, _ = pipeline.forward_batched(images, points, valid)
        dense_b = np.asarray(dense_b)
        for j, idx in enumerate(idxs):
            gt = decode_np(samples[j][3])[..., 0]
            mask = np.where((gt > 0) & (gt > args.min_evaluate_depth)
                            & (gt < args.max_evaluate_depth))
            rows[idx] = _metric_row(dense_b[j][mask], gt[mask])
    keys = ['mae', 'rmse', 'imae', 'irmse']
    return dict(zip(keys, np.mean(rows, axis=0).tolist()))


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
    # ---- two-stage chain mode (VERDICT r4 #3): trained RadarNet ->
    # real PNG bridge -> FusionNet eval, reference vs ours vs fused ----
    parser.add_argument('--two_stage', action='store_true',
                        help='run the FULL chain (RadarNet -> bridge -> '
                             'FusionNet); implied by --radarnet_checkpoint')
    parser.add_argument('--radarnet_checkpoint', type=str, default=None,
                        help='stage-1 .pth; enables the two-stage chain '
                             '(the depth/response manifests are then '
                             'produced by the bridge, not inputs)')
    parser.add_argument('--radar_path', type=str, default=None,
                        help='radar .npy manifest (two-stage mode)')
    parser.add_argument('--patch_size', nargs='+', type=int,
                        default=[900, 288])
    parser.add_argument('--radarnet_encoder_type', nargs='+', type=str,
                        default=['radarnetv1', 'batch_norm'])
    parser.add_argument('--radarnet_n_filters_encoder_image', nargs='+',
                        type=int, default=[32, 64, 128, 128, 128])
    parser.add_argument('--radarnet_n_neurons_encoder_depth', nargs='+',
                        type=int, default=[32, 64, 128, 128, 128])
    parser.add_argument('--radarnet_decoder_type', nargs='+', type=str,
                        default=['multiscale', 'batch_norm'])
    parser.add_argument('--radarnet_n_filters_decoder', nargs='+', type=int,
                        default=[256, 128, 64, 32, 16])
    parser.add_argument('--max_points_inference', type=int, default=0,
                        help='static point-axis cap (0 = auto-size from '
                             'the manifest)')
    parser.add_argument('--radarnet_min_evaluate_depth', type=float,
                        default=0.0)
    parser.add_argument('--tolerance_rel_stage1', type=float, default=5e-3,
                        help='relative tolerance for the stage-1 '
                             'INTERSECTION metrics. Wider than '
                             '--tolerance_rel because near-tie scatter '
                             'argmax winners (torch-CPU vs XLA conv '
                             'noise) change the intersection pixel SET, '
                             'not just values — a set-membership effect '
                             'that shrinks as checkpoints sharpen '
                             'responses away from the 0.5 threshold')
    parser.add_argument('--radarnet_max_evaluate_depth', type=float,
                        default=100.0,
                        help='radarnet eval protocol depth cap '
                             '(bash/run_radarnet_nuscenes.sh)')
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


def _setup_synthetic_two_stage(args):
    """--synthetic --two_stage: radarnet fixture + tiny random-init
    checkpoints for BOTH stages inside the output dir."""
    import jax

    from fixtures import make_radarnet_fixture
    from rcfd_tpu.models import FusionNetModel, RadarNetModel

    data_dir = os.path.join(args.output_dirpath, 'synthetic_data')
    manifests = make_radarnet_fixture(data_dir, n_samples=2,
                                      height=64, width=96, n_points=5)
    args.patch_size = [32, 32]
    args.radarnet_n_filters_encoder_image = [4, 8, 8, 8, 8]
    args.radarnet_n_neurons_encoder_depth = [4, 8, 8, 8, 8]
    args.radarnet_n_filters_decoder = [8, 8, 8, 8, 8]
    rn = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=tuple(args.patch_size),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=args.radarnet_n_filters_encoder_image,
        n_neurons_encoder_depth=args.radarnet_n_neurons_encoder_depth,
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=args.radarnet_n_filters_decoder)
    rn_params, rn_state = rn.init(jax.random.PRNGKey(0))
    # decondition near-ties in winner selection (untrained logits ~0
    # make argmax winners tie-break-sensitive across conv backends)
    import jax.numpy as jnp
    out0 = rn_params['decoder']['output0']['conv']
    out0['weight'] = out0['weight'] * jnp.float32(50.0)
    rn_ckpt = os.path.join(args.output_dirpath, 'synthetic-radarnet-0.pth')
    rn.save_checkpoint(rn_ckpt, rn_params, rn_state, step=0)
    args.radarnet_checkpoint = rn_ckpt

    tiny = dict(image=[8, 12, 16, 16, 16], depth=[4, 6, 8, 8, 8],
                decoder=[16, 12, 8, 8, 8])
    fn = FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=tiny['image'],
        n_filters_encoder_depth=tiny['depth'],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=1, n_filters_decoder=tiny['decoder'],
        min_predict_depth=1.0, max_predict_depth=100.0)
    fn_params, fn_state = fn.init(jax.random.PRNGKey(1))
    fn_ckpt = os.path.join(args.output_dirpath, 'synthetic-fusionnet-0.pth')
    fn.save_checkpoint(fn_ckpt, fn_params, fn_state, step=0)
    args.fusionnet_checkpoint = fn_ckpt
    args.n_filters_encoder_image = tiny['image']
    args.n_filters_encoder_depth = tiny['depth']
    args.n_filters_decoder = tiny['decoder']

    args.image_path = manifests['image']
    args.radar_path = manifests['radar']
    args.ground_truth_path = manifests['ground_truth']
    return args


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dirpath, exist_ok=True)
    two_stage = args.radarnet_checkpoint is not None or args.two_stage
    if args.synthetic:
        args = (_setup_synthetic_two_stage(args) if two_stage
                else _setup_synthetic(args))
    required = (('fusionnet_checkpoint', 'radarnet_checkpoint',
                 'image_path', 'radar_path', 'ground_truth_path')
                if two_stage else
                ('fusionnet_checkpoint', 'image_path', 'depth_path',
                 'response_path', 'ground_truth_path'))
    missing = [n for n in required if getattr(args, n) is None]
    if missing:
        build_parser().error(
            'the following arguments are required (or pass --synthetic): '
            + ', '.join('--' + m for m in missing))
    if two_stage:
        return main_two_stage(args)

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


def main_two_stage(args):
    """Full-chain protocol: reference RadarNet -> real PNG bridge ->
    reference FusionNet, vs our run_radarnet -> bridge -> run_fusionnet,
    vs the fused TwoStagePipeline — one report, three stage-2 columns
    plus the stage-1 intersection table."""
    fn_net = dict(
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
    rn_net = dict(
        input_channels_image=3, input_channels_depth=3,
        patch_size=list(args.patch_size),
        encoder_type='-'.join(args.radarnet_encoder_type),
        n_filters_encoder_image=args.radarnet_n_filters_encoder_image,
        n_neurons_encoder_depth=args.radarnet_n_neurons_encoder_depth,
        decoder_type='-'.join(args.radarnet_decoder_type),
        n_filters_decoder=args.radarnet_n_filters_decoder,
        weight_initializer=args.weight_initializer,
        activation_func=args.activation_func)

    image_paths = data_utils.read_paths(args.image_path)
    radar_paths = data_utils.read_paths(args.radar_path)
    gt_paths = data_utils.read_paths(args.ground_truth_path)
    assert len(image_paths) == len(radar_paths) == len(gt_paths)

    ref = None
    if not args.skip_reference:
        ref = reference_two_stage_eval(
            args, rn_net, fn_net, image_paths, radar_paths, gt_paths,
            os.path.join(args.output_dirpath, 'reference_bridge'),
            args.verbose)
        if ref is None:
            print('reference tree / torch unavailable — running our '
                  'stack only (pass --skip_reference to silence)')

    ours = ours_two_stage_eval(args, rn_net, fn_net, args.output_dirpath)

    sections = []
    verdicts = []
    if 'stage1' in ours:
        t1, v1 = format_table(ref and ref['stage1'], ours['stage1'],
                              args.tolerance_mm, args.tolerance_inv,
                              args.tolerance_rel_stage1)
        sections.append('## Stage 1 — RadarNet intersection metrics '
                        '(depth in ({}, {}) m)\n\n{}\n\n**{}**'.format(
                            args.radarnet_min_evaluate_depth,
                            args.radarnet_max_evaluate_depth, t1, v1))
        verdicts.append(v1)
    t2, v2 = format_table(ref and ref['stage2'], ours['stage2'],
                          args.tolerance_mm, args.tolerance_inv,
                          args.tolerance_rel)
    sections.append('## Stage 2 — FusionNet on the PNG bridge '
                    '(depth in ({}, {}) m)\n\n{}\n\n**{}**'.format(
                        args.min_evaluate_depth, args.max_evaluate_depth,
                        t2, v2))
    verdicts.append(v2)
    tf, vf = format_table(ref and ref['stage2'], ours['fused'],
                          args.tolerance_mm, args.tolerance_inv,
                          args.tolerance_rel)
    sections.append('## Fused pipeline (one jitted program, '
                    'quantize_bridge) vs the reference chain\n\n{}\n\n'
                    '**{}**'.format(tf, vf))
    verdicts.append(vf)

    overall = ('PARITY PASS' if all(v == 'PARITY PASS' for v in verdicts)
               else 'PARITY FAIL' if ref is not None
               else 'REFERENCE UNAVAILABLE (our metrics only)')
    report = ('# Two-stage parity protocol report\n\n'
              'radarnet checkpoint: {}\nfusionnet checkpoint: {}\n'
              'frames: {}\n\n{}\n\n**OVERALL: {}**\n'.format(
                  args.radarnet_checkpoint, args.fusionnet_checkpoint,
                  len(image_paths), '\n\n'.join(sections), overall))
    print(report)
    report_path = os.path.join(args.output_dirpath, 'parity_report.md')
    with open(report_path, 'w') as f:
        f.write(report)
    print('wrote {}'.format(report_path))
    return ref, ours, overall


if __name__ == '__main__':
    main()

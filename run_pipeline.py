"""CLI: fused two-stage inference (camera + radar -> dense depth) in one
jitted program per frame — no intermediate PNG round trip.

New TPU-native capability (the reference composes its stages through the
filesystem); the file-based path is still available via run_radarnet.py +
run_fusionnet.py for drop-in parity.
"""

import argparse
import os

import numpy as np

from rcfd_tpu.data import io as data_utils
from rcfd_tpu.data.datasets import RadarNetInferenceDataset
from rcfd_tpu.pipeline import TwoStagePipeline
from rcfd_tpu.utils import eval_utils
from rcfd_tpu.utils.log_utils import log

parser = argparse.ArgumentParser()
parser.add_argument('--radarnet_restore_path', type=str, required=True)
parser.add_argument('--fusionnet_restore_path', type=str, required=True)
parser.add_argument('--image_path', type=str, required=True)
parser.add_argument('--radar_path', type=str, required=True)
parser.add_argument('--ground_truth_path', type=str, default=None)
parser.add_argument('--patch_size', nargs='+', type=int, default=[900, 288])
# Network settings (canonical defaults; override for non-standard nets)
parser.add_argument('--radarnet_encoder_type', nargs='+', type=str,
                    default=['radarnetv1', 'batch_norm'])
parser.add_argument('--radarnet_n_filters_encoder_image', nargs='+', type=int,
                    default=[32, 64, 128, 128, 128])
parser.add_argument('--radarnet_n_neurons_encoder_depth', nargs='+', type=int,
                    default=[32, 64, 128, 128, 128])
parser.add_argument('--radarnet_n_filters_decoder', nargs='+', type=int,
                    default=[256, 128, 64, 32, 16])
parser.add_argument('--fusionnet_encoder_type', nargs='+', type=str,
                    default=['fusionnet18', 'batch_norm'])
parser.add_argument('--fusionnet_n_filters_encoder_image', nargs='+',
                    type=int, default=[32, 64, 128, 256, 256, 256])
parser.add_argument('--fusionnet_n_filters_encoder_depth', nargs='+',
                    type=int, default=[16, 32, 64, 128, 128, 128])
parser.add_argument('--fusion_type', type=str, default='weight_and_project')
parser.add_argument('--fusionnet_n_filters_decoder', nargs='+', type=int,
                    default=[256, 256, 128, 64, 64, 32])
parser.add_argument('--min_predict_depth', type=float, default=1.0)
parser.add_argument('--max_predict_depth', type=float, default=100.0)
parser.add_argument('--bfloat16', action='store_true',
                    help='bf16 serving (params cast once, f32 outputs)')
parser.add_argument('--output_dirpath', type=str, required=True)
parser.add_argument('--save_outputs', action='store_true')
parser.add_argument('--keep_input_filenames', action='store_true')
parser.add_argument('--verbose', action='store_true')
parser.add_argument('--min_evaluate_depth', type=float, default=0.0)
parser.add_argument('--max_evaluate_depth', type=float, default=80.0)
parser.add_argument('--max_points_inference', type=int, default=0,
                    help='static point-axis size; the default (<= 0) '
                         'auto-sizes from the radar manifest so no frame '
                         'is truncated; pass a positive cap to opt in '
                         'to a fixed size')
parser.add_argument('--batch_size', type=int, default=1,
                    help='frames per device step (the batched serving '
                         'path; 4 is the v5e sweet spot at K=64)')
parser.add_argument('--data_parallel', action='store_true',
                    help='shard the frame batch over all devices '
                         '(shard_map DP serving; batch_size must be '
                         'divisible by the device count)')


def main():
    import jax.numpy as jnp
    args = parser.parse_args()

    os.makedirs(args.output_dirpath, exist_ok=True)
    log_path = os.path.join(args.output_dirpath, 'results.txt')

    image_paths = data_utils.read_paths(args.image_path)
    radar_paths = data_utils.read_paths(args.radar_path)
    gt_available = (args.ground_truth_path is not None and
                    os.path.exists(args.ground_truth_path))
    gt_paths = data_utils.read_paths(args.ground_truth_path) \
        if gt_available else None

    dataset = RadarNetInferenceDataset(
        image_paths=image_paths, radar_paths=radar_paths,
        ground_truth_paths=gt_paths,
        max_points=(None if args.max_points_inference <= 0
                    else args.max_points_inference))

    sample_image = data_utils.load_image(image_paths[0])
    radarnet_kwargs = dict(
        input_patch_size_image=tuple(args.patch_size),
        encoder_type='-'.join(args.radarnet_encoder_type),
        n_filters_encoder_image=args.radarnet_n_filters_encoder_image,
        n_neurons_encoder_depth=args.radarnet_n_neurons_encoder_depth,
        n_filters_decoder=args.radarnet_n_filters_decoder)
    fusionnet_kwargs = dict(
        encoder_type='-'.join(args.fusionnet_encoder_type),
        n_filters_encoder_image=args.fusionnet_n_filters_encoder_image,
        n_filters_encoder_depth=args.fusionnet_n_filters_encoder_depth,
        fusion_type=args.fusion_type,
        n_filters_decoder=args.fusionnet_n_filters_decoder,
        min_predict_depth=args.min_predict_depth,
        max_predict_depth=args.max_predict_depth)
    # production passes (PNGs only, no eval) fetch codec-grid uint16
    # outputs — half the D2H bytes, byte-identical files; eval passes
    # keep f32 so metrics run on unquantized maps
    codec_d2h = bool(args.save_outputs) and not gt_available
    pipeline = TwoStagePipeline.from_checkpoints(
        args.radarnet_restore_path, args.fusionnet_restore_path,
        image_height=sample_image.shape[0], image_width=sample_image.shape[1],
        patch_size=args.patch_size,
        radarnet_kwargs=radarnet_kwargs,
        fusionnet_kwargs=fusionnet_kwargs,
        optimize=True,
        compute_dtype=jnp.bfloat16 if args.bfloat16 else None,
        codec_encode=codec_d2h)

    if args.save_outputs:
        dirs = {name: os.path.join(args.output_dirpath, name)
                for name in ['output_depth_fusion', 'output_depth_radar',
                             'output_response_radar']}
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)

    n_sample = len(image_paths)
    metrics = {k: np.zeros(n_sample) for k in ['mae', 'rmse', 'imae', 'irmse']}

    mesh = None
    if args.data_parallel:
        import jax
        from rcfd_tpu.parallel.mesh import get_mesh
        n_dev = len(jax.devices())
        if args.batch_size % n_dev != 0:
            raise SystemExit(
                f'--data_parallel needs batch_size ({args.batch_size}) '
                f'divisible by the device count ({n_dev})')
        mesh = get_mesh()
        log(f'Data-parallel serving over {n_dev} device(s)', log_path)

    bsz = max(1, args.batch_size)
    for start in range(0, n_sample, bsz):
        idxs = list(range(start, min(start + bsz, n_sample)))
        samples = [dataset.get(i) for i in idxs]
        if len(idxs) > 1:
            images = np.stack([s[0] for s in samples])
            points = np.stack([s[1] for s in samples])
            valid = np.stack([s[2] for s in samples])
            if mesh is not None and len(idxs) == bsz:
                dense_b, quasi_b, response_b = pipeline.forward_sharded(
                    jnp.asarray(images), jnp.asarray(points),
                    jnp.asarray(valid), mesh=mesh)
            else:
                dense_b, quasi_b, response_b = pipeline.forward_batched(
                    jnp.asarray(images), jnp.asarray(points),
                    jnp.asarray(valid))
        else:
            image, points, valid = samples[0][:3]
            d, q, r = pipeline(jnp.asarray(image)[None], jnp.asarray(points),
                               jnp.asarray(valid))
            dense_b, quasi_b, response_b = d[None], q[None], r[None]

        for b, idx in enumerate(idxs):
            dense = np.asarray(dense_b[b])
            if args.verbose:
                print('Processed {}/{} samples'.format(idx + 1, n_sample),
                      end='\r')
            if gt_available:
                from rcfd_tpu.data.transport import decode_np
                gt = decode_np(samples[b][3])[..., 0]
                m = eval_utils.compute_all(dense, gt,
                                           args.min_evaluate_depth,
                                           args.max_evaluate_depth)
                for k in metrics:
                    metrics[k][idx] = m[k]
            if args.save_outputs:
                filename = (os.path.splitext(
                    os.path.basename(image_paths[idx]))[0] + '.png') \
                    if args.keep_input_filenames \
                    else '{:010d}.png'.format(idx)
                if codec_d2h:
                    data_utils.save_depth_encoded(dense, os.path.join(
                        dirs['output_depth_fusion'], filename))
                    data_utils.save_depth_encoded(
                        np.asarray(quasi_b[b]), os.path.join(
                            dirs['output_depth_radar'], filename))
                    data_utils.save_response_encoded(
                        np.asarray(response_b[b]), os.path.join(
                            dirs['output_response_radar'], filename))
                else:
                    data_utils.save_depth(dense, os.path.join(
                        dirs['output_depth_fusion'], filename))
                    data_utils.save_depth(np.asarray(quasi_b[b]), os.path.join(
                        dirs['output_depth_radar'], filename))
                    data_utils.save_response(
                        np.asarray(response_b[b]), os.path.join(
                            dirs['output_response_radar'], filename))

    if gt_available:
        log('Two-stage pipeline evaluation:', log_path)
        log('{:>8}  {:>8}  {:>8}  {:>8}'.format('MAE', 'RMSE', 'iMAE',
                                                'iRMSE'), log_path)
        log('{:8.3f}  {:8.3f}  {:8.3f}  {:8.3f}'.format(
            *[np.mean(metrics[k]) for k in ['mae', 'rmse', 'imae', 'irmse']]),
            log_path)


if __name__ == '__main__':
    main()

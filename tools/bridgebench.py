"""Stage-1.5 bridge throughput harness (VERDICT r4 #5).

Times the REAL bridge inner loop — RadarNetInferenceDataset (PNG decode +
integer transport) -> iter_scatter_outputs (double-buffered H2D + frame-
batched scatter forward) -> save_depth/save_response 16-bit PNG writes —
on a synthetic full-res fixture, reporting frames/s INCLUDING host I/O.
This is the loop setup/setup_dataset_nuscenes_radarnet.py runs over ~34k
frames (reference setup/setup_dataset_nuscenes_radarnet.py:293-345, which
is per-frame and synchronous).

--mode sync reproduces the pre-round-5 synchronous feeder (dataset.get +
np.stack + device transfer serialized with device compute) so the
double-buffer win is measured, not asserted.

Usage:
  python tools/bridgebench.py                          # real chip, both modes
  python tools/bridgebench.py --mode prefetch          # one mode
  JAX_PLATFORMS=cpu python tools/bridgebench.py \
      --height 64 --width 96 --patch 64 32 --n_frames 6 --check_only
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

os.environ.setdefault('RCFD_COMPILE_CACHE', os.path.join(REPO, '.xla_cache'))
os.environ.setdefault('RCFD_COMPILE_CACHE_MIN_SECS', '2')


def run_bridge(mode, forward_fn_b, params, state, dataset, out_dir,
               eval_batch_size):
    """One full pass: inference + PNG writes for every frame. Returns
    (seconds, n_frames, depth_paths) — the written files let the caller
    assert mode-equivalence."""
    import jax.numpy as jnp
    from rcfd_tpu import radarnet_main
    from rcfd_tpu.data import io as data_utils
    from rcfd_tpu.data import transport

    os.makedirs(out_dir, exist_ok=True)
    depth_paths = []
    t0 = time.perf_counter()
    if mode in ('prefetch', 'codec'):
        # 'codec' = prefetch loop but forward_fn_b emits uint16 codec-grid
        # outputs (half the D2H bytes); files are byte-identical
        it = radarnet_main.iter_scatter_outputs(
            forward_fn_b, params, state, dataset, eval_batch_size)
        for idx, _data, output_depth, response_np in it:
            dp = os.path.join(out_dir, f'depth_{idx:05d}.png')
            if mode == 'codec':
                data_utils.save_depth_encoded(output_depth, dp)
                data_utils.save_response_encoded(
                    response_np, os.path.join(out_dir, f'resp_{idx:05d}.png'))
            else:
                data_utils.save_depth(output_depth, dp)
                data_utils.save_response(
                    response_np, os.path.join(out_dir, f'resp_{idx:05d}.png'))
            depth_paths.append(dp)
    else:  # sync: the pre-r5 loop shape — serialized fetch/H2D/compute/IO
        n_sample = len(dataset)
        bsz = max(1, min(eval_batch_size, n_sample))
        for start in range(0, n_sample, bsz):
            idxs = list(range(start, min(start + bsz, n_sample)))
            samples = [dataset.get(i) for i in idxs]
            padded = samples + [samples[-1]] * (bsz - len(samples))
            images = jnp.asarray(np.stack([s[0] for s in padded]))
            points = jnp.asarray(np.stack([s[1] for s in padded]))
            valid = jnp.asarray(np.stack([s[2] for s in padded]))
            depth_b, response_b = forward_fn_b(params, state, images,
                                               points, valid)
            depth_b = np.asarray(depth_b)
            response_b = np.asarray(response_b)
            for j, idx in enumerate(idxs):
                transport.decode_np(samples[j])
                dp = os.path.join(out_dir, f'depth_{idx:05d}.png')
                data_utils.save_depth(depth_b[j], dp)
                data_utils.save_response(
                    response_b[j],
                    os.path.join(out_dir, f'resp_{idx:05d}.png'))
                depth_paths.append(dp)
    return time.perf_counter() - t0, len(depth_paths), depth_paths


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--n_frames', type=int, default=48)
    parser.add_argument('--height', type=int, default=900)
    parser.add_argument('--width', type=int, default=1600)
    parser.add_argument('--patch', type=int, nargs=2, default=[900, 288])
    parser.add_argument('--n_points', type=int, default=96,
                        help='radar returns per frame (dataset pads to max)')
    parser.add_argument('--eval_batch_size', type=int, default=8)
    parser.add_argument('--dtype', default='bfloat16',
                        choices=['bfloat16', 'float32'])
    parser.add_argument('--mode',
                        choices=['prefetch', 'sync', 'codec', 'both', 'all'],
                        default='both')
    parser.add_argument('--check_only', action='store_true',
                        help='tiny shapes, assert prefetch==sync outputs '
                             '(CI smoke)')
    args = parser.parse_args()
    if args.n_frames < 1 or args.n_points < 1:
        raise SystemExit('--n_frames and --n_points must be >= 1')

    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from fixtures import make_radarnet_fixture
    from rcfd_tpu import radarnet_main
    from rcfd_tpu.data import io as data_utils
    from rcfd_tpu.data.datasets import RadarNetInferenceDataset
    from rcfd_tpu.data.transforms import Transforms
    from rcfd_tpu.nn.core import cast_tree

    root = tempfile.mkdtemp(prefix='bridgebench_')
    try:
        manifests = make_radarnet_fixture(
            root, n_samples=args.n_frames, height=args.height,
            width=args.width, n_points=args.n_points)
        dataset = RadarNetInferenceDataset(
            image_paths=data_utils.read_paths(manifests['image']),
            radar_paths=data_utils.read_paths(manifests['radar']),
            max_points=args.n_points)

        model = radarnet_main._build_model(
            input_channels_image=3, input_channels_depth=3,
            patch_size=tuple(args.patch),
            encoder_type='radarnetv1_batch_norm',
            n_filters_encoder_image=[32, 64, 128, 128, 128],
            n_neurons_encoder_depth=[32, 64, 128, 128, 128],
            decoder_type='multiscale_batch_norm',
            n_filters_decoder=[256, 128, 64, 32, 16],
            weight_initializer='kaiming_uniform',
            activation_func='leaky_relu')
        params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
        if args.dtype == 'bfloat16':
            params = cast_tree(params, jnp.bfloat16)
            state = cast_tree(state, jnp.bfloat16)

        forward_fn_b = radarnet_main.make_forward_fn_batched(
            model, Transforms(normalized_image_range=[0, 1]),
            args.height, args.width)
        forward_fn_codec = radarnet_main.make_forward_fn_batched(
            model, Transforms(normalized_image_range=[0, 1]),
            args.height, args.width, codec_encode=True)

        if args.mode == 'both':
            modes = ['prefetch', 'sync']
        elif args.mode == 'all':
            modes = ['prefetch', 'sync', 'codec']
        else:
            modes = [args.mode]
        if args.check_only:
            modes = ['prefetch', 'sync', 'codec']

        # warm: compile the batched forward once outside the timed passes
        s0 = dataset.get(0)
        warm = tuple(
            jnp.asarray(np.stack([f] * min(args.eval_batch_size,
                                           args.n_frames)))
            for f in s0[:3])
        np.asarray(forward_fn_b(params, state, *warm)[0])
        if 'codec' in modes or args.check_only:
            np.asarray(forward_fn_codec(params, state, *warm)[0])

        results = {}
        outs = {}
        for mode in modes:
            out_dir = os.path.join(root, f'out_{mode}')
            fwd = forward_fn_codec if mode == 'codec' else forward_fn_b
            dt, n, paths = run_bridge(mode, fwd, params, state,
                                      dataset, out_dir, args.eval_batch_size)
            results[mode] = dict(seconds=round(dt, 3),
                                 frames_per_s=round(n / dt, 3))
            outs[mode] = paths
            print(f'[bridgebench] {mode}: {n} frames in {dt:.2f}s '
                  f'-> {n / dt:.2f} frames/s (incl. PNG decode+write)',
                  file=sys.stderr)

        if args.check_only:
            a = [data_utils.load_depth(p) for p in outs['prefetch']]
            b = [data_utils.load_depth(p) for p in outs['sync']]
            assert all(np.array_equal(x, y) for x, y in zip(a, b)), \
                'prefetch and sync bridge outputs differ'
            # codec (uint16 device-quantized D2H) must write byte-identical
            # PNG files to the float32 path
            for pa, pc in zip(outs['prefetch'], outs['codec']):
                with open(pa, 'rb') as fa, open(pc, 'rb') as fc:
                    assert fa.read() == fc.read(), \
                        f'codec-encoded bridge PNG differs: {pc}'
                ra = pa.replace('depth_', 'resp_')
                rc = pc.replace('depth_', 'resp_')
                with open(ra, 'rb') as fa, open(rc, 'rb') as fc:
                    assert fa.read() == fc.read(), \
                        f'codec-encoded response PNG differs: {rc}'

        print(json.dumps({
            'harness': 'bridgebench', 'n_frames': args.n_frames,
            'shape': [args.height, args.width],
            'patch': list(args.patch), 'n_points': args.n_points,
            'eval_batch_size': args.eval_batch_size, 'dtype': args.dtype,
            'backend': jax.devices()[0].platform,
            'check_only': args.check_only,
            'results': results}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == '__main__':
    main()

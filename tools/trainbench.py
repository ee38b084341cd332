"""Loader-fed training-throughput harness (VERDICT r4 #5, r5 #4).

Measures the REAL end-to-end training path — DataLoader (threaded workers
+ native batched PNG decode + integer transport) -> device_put
double-buffer (device_prefetch) -> jitted DP train step over an n-device
'data' mesh — not synthetic device-resident tensors. This is the
input-pipeline-attached counterpart of the reference's train loops
(/root/reference/src/fusionnet_main.py:332-474,
 /root/reference/src/radarnet_main.py:18-532).

Families:
  --family fusionnet (default): canonical 16 x 448x448 crops config
  --family radarnet: canonical bs=6, 900x288 patches, K=4 points config
    (full-frame image load + per-point GT crops — a different host
    budget than FusionNet's 5-stream crop load)

Rows it produces (docs/PERF.md training tables):
  - CPU mesh scaling: --n_devices 2/4/8 under JAX_PLATFORMS=cpu +
    --xla_force_host_platform_device_count (relative scaling only; CPU
    absolute numbers are meaningless for the chip)
  - single real chip: default env (axon), --n_devices 1

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/trainbench.py --n_devices 8 --model tiny
  python tools/trainbench.py --n_devices 1 --model canonical \
      --height 448 --width 448 --batch_size 8   # real chip
  python tools/trainbench.py --family radarnet --model canonical \
      --height 900 --width 1600 --batch_size 6  # real chip, BASELINE cfg 4

Prints one JSON line:
  {"samples_per_s": ..., "samples_per_s_per_chip": ..., "step_ms": ...,
   "loader_only_samples_per_s": ..., "n_devices": ..., ...}
"""

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

# persistent compile cache: the bench graphs repeat across runs/rounds
os.environ.setdefault('RCFD_COMPILE_CACHE', os.path.join(REPO, '.xla_cache'))
os.environ.setdefault('RCFD_COMPILE_CACHE_MIN_SECS', '2')


FUSIONNET_MODELS = {
    'tiny': dict(
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_filters_encoder_depth=[4, 6, 8, 8, 8],
        n_filters_decoder=[16, 12, 8, 8, 8]),
    # bash/train_fusionnet_nuscenes.sh
    'canonical': dict(
        n_filters_encoder_image=[32, 64, 128, 256, 256, 256],
        n_filters_encoder_depth=[16, 32, 64, 128, 128, 128],
        n_filters_decoder=[256, 256, 128, 64, 64, 32]),
}

RADARNET_MODELS = {
    'tiny': dict(
        n_filters_encoder_image=[4, 8, 8, 8, 8],
        n_neurons_encoder_depth=[4, 8, 8, 8, 8],
        n_filters_decoder=[8, 8, 8, 8, 8]),
    # bash/train_radarnet_nuscenes.sh
    'canonical': dict(
        n_filters_encoder_image=[32, 64, 128, 128, 128],
        n_neurons_encoder_depth=[32, 64, 128, 128, 128],
        n_filters_decoder=[256, 128, 64, 32, 16]),
}


def build_fusionnet(args, jax):
    """FusionNet loader + model + per-shard step (canonical: 448x448
    crops from larger source frames, 5 PNG streams per sample)."""
    from fixtures import make_fusionnet_fixture
    from rcfd_tpu.data import io as data_utils
    from rcfd_tpu.data.datasets import FusionNetTrainingDataset
    from rcfd_tpu.data.transforms import Transforms
    from rcfd_tpu.fusionnet_main import _make_train_step
    from rcfd_tpu.models import FusionNetModel

    src_h = args.source_height or args.height + 16
    src_w = args.source_width or args.width + 16
    data_dir = args.data_dir or os.path.join(
        tempfile.gettempdir(),
        f'trainbench_{src_h}x{src_w}_{args.n_samples}')
    manifest_path = os.path.join(data_dir, 'image.txt')
    if not os.path.exists(manifest_path):
        make_fusionnet_fixture(data_dir, n_samples=args.n_samples,
                               height=src_h, width=src_w)
    manifests = {n: os.path.join(data_dir, f'{n}.txt')
                 for n in ['image', 'depth', 'response', 'ground_truth',
                           'lidar']}
    dataset = FusionNetTrainingDataset(
        image_paths=data_utils.read_paths(manifests['image']),
        depth_paths=data_utils.read_paths(manifests['depth']),
        response_paths=data_utils.read_paths(manifests['response']),
        ground_truth_paths=data_utils.read_paths(manifests['ground_truth']),
        lidar_map_paths=data_utils.read_paths(manifests['lidar']),
        shape=(args.height, args.width),
        random_crop_type=['horizontal', 'vertical'])

    model = FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=1,
        min_predict_depth=1.0, max_predict_depth=100.0,
        **FUSIONNET_MODELS[args.model])
    transforms = Transforms(
        normalized_image_range=[0, 1],
        random_brightness=[0.8, 1.2],
        random_contrast=[0.8, 1.2],
        random_saturation=[0.8, 1.2],
        random_flip_type=['horizontal'])

    def make_step(axis_name):
        return _make_train_step(
            model, transforms, loss_func='l1', w_smoothness=0.1,
            w_lidar_loss=2.0, w_weight_decay=0.0,
            loss_smoothness_kernel_size=-1, outlier_kernel_size=7,
            outlier_threshold=1.5, dilation_kernel_size=-1,
            axis_name=axis_name)

    return dataset, model, make_step


def build_radarnet(args, jax):
    """RadarNet loader + model + per-shard step (canonical: bs=6 full
    900x1600 frame load, patch 900x288, K=4 sampled points with GT crops
    — bash/train_radarnet_nuscenes.sh; reference loop
    /root/reference/src/radarnet_main.py:18-532)."""
    from fixtures import make_radarnet_fixture
    from rcfd_tpu.data import io as data_utils
    from rcfd_tpu.data.datasets import RadarNetTrainingDataset
    from rcfd_tpu.data.transforms import Transforms
    from rcfd_tpu.models import RadarNetModel
    from rcfd_tpu.radarnet_main import _make_train_step

    src_h = args.source_height or args.height
    src_w = args.source_width or args.width
    patch = (args.height, args.patch_width)
    data_dir = args.data_dir or os.path.join(
        tempfile.gettempdir(),
        f'trainbench_rn_{src_h}x{src_w}_{args.n_samples}')
    manifest_path = os.path.join(data_dir, 'image.txt')
    if not os.path.exists(manifest_path):
        make_radarnet_fixture(data_dir, n_samples=args.n_samples,
                              height=src_h, width=src_w,
                              n_points=max(args.total_points_sampled * 4, 8))
    manifests = {n: os.path.join(data_dir, f'{n}.txt')
                 for n in ['image', 'radar', 'ground_truth']}
    dataset = RadarNetTrainingDataset(
        image_paths=data_utils.read_paths(manifests['image']),
        radar_paths=data_utils.read_paths(manifests['radar']),
        ground_truth_paths=data_utils.read_paths(manifests['ground_truth']),
        patch_size=patch,
        total_points_sampled=args.total_points_sampled,
        sample_probability_of_lidar=0.10)

    model = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=patch,
        encoder_type='radarnetv1_batch_norm',
        decoder_type='multiscale_batch_norm',
        **RADARNET_MODELS[args.model])
    transforms = Transforms(
        normalized_image_range=[0, 1],
        random_brightness=[0.8, 1.2],
        random_contrast=[0.8, 1.2],
        random_saturation=[0.8, 1.2],
        random_flip_type=['horizontal'])

    def make_step(axis_name):
        return _make_train_step(
            model, transforms, patch,
            max_distance_correspondence=0.4,
            set_invalid_to_negative_class=True,
            w_positive_class=2.0, w_weight_decay=0.0,
            axis_name=axis_name)

    return dataset, model, make_step


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--family', choices=['fusionnet', 'radarnet'],
                        default='fusionnet')
    parser.add_argument('--n_devices', type=int, default=None)
    parser.add_argument('--model', choices=['tiny', 'canonical'],
                        default='tiny')
    parser.add_argument('--height', type=int, default=64,
                        help='fusionnet: crop height; radarnet: patch '
                             'height (the bottom rows of the frame)')
    parser.add_argument('--width', type=int, default=96)
    parser.add_argument('--patch_width', type=int, default=None,
                        help='radarnet patch width (canonical 288; '
                             'default width//3 rounded to 32)')
    parser.add_argument('--total_points_sampled', type=int, default=4)
    parser.add_argument('--source_height', type=int, default=None,
                        help='on-disk frame height (crop source); '
                             'default height + 16 (fusionnet) or height '
                             '(radarnet)')
    parser.add_argument('--source_width', type=int, default=None)
    parser.add_argument('--batch_size', type=int, default=None,
                        help='default: n_devices samples')
    parser.add_argument('--n_samples', type=int, default=64,
                        help='fixture size (loader cycles epochs)')
    parser.add_argument('--n_steps', type=int, default=20)
    parser.add_argument('--n_warmup', type=int, default=3)
    parser.add_argument('--n_thread', type=int, default=4)
    parser.add_argument('--train_dtype',
                        default=os.environ.get('RCFD_TRAIN_DTYPE'),
                        choices=[None, 'bfloat16'], nargs='?')
    parser.add_argument('--data_dir', type=str, default=None,
                        help='reuse an existing fixture dir')
    parser.add_argument('--raw_cache', type=str, default=None,
                        help='decode-once raw cache dir '
                             '(rcfd_tpu/data/raw_cache.py); steady-state '
                             'loader throughput needs one warm epoch')
    args = parser.parse_args()
    if args.raw_cache:
        os.environ['RCFD_RAW_CACHE'] = args.raw_cache
    if args.train_dtype:
        # _make_train_step reads RCFD_TRAIN_DTYPE at build time — route the
        # flag through the same gate so the harness uses the driver's exact
        # mixed-precision scheme (f32 master weights, bf16 network inputs)
        os.environ['RCFD_TRAIN_DTYPE'] = args.train_dtype
    if args.patch_width is None:
        args.patch_width = 288 if args.width >= 864 else \
            max(32, (args.width // 3) // 32 * 32)

    import jax

    # the axon sitecustomize pins jax_platforms to the remote TPU even
    # under JAX_PLATFORMS=cpu; honor the env var explicitly so the CPU
    # mesh rows actually run on host CPU (same workaround as
    # tests/conftest.py)
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')

    import jax.numpy as jnp
    import numpy as np

    from rcfd_tpu.data.loader import DataLoader, device_prefetch
    from rcfd_tpu.parallel.optim import init_adam

    n_devices = args.n_devices or jax.device_count()
    batch_size = args.batch_size or n_devices
    assert batch_size % n_devices == 0

    build = build_radarnet if args.family == 'radarnet' else build_fusionnet
    dataset, model, make_step = build(args, jax)
    loader = DataLoader(dataset, batch_size=batch_size, shuffle=True,
                        num_workers=args.n_thread, seed=0, drop_last=True)

    # ---- loader-only throughput (the input-pipeline roofline) ----------
    t0 = time.perf_counter()
    n_loader = 0
    loader.set_epoch(0)
    for batch in loader:
        n_loader += batch[0].shape[0]
    loader_dt = time.perf_counter() - t0
    loader_sps = n_loader / loader_dt

    # ---- model + sharded step ------------------------------------------
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    opt_state = init_adam(params)
    # bf16 is applied INSIDE the step (network inputs only) via the
    # RCFD_TRAIN_DTYPE gate set above — master weights/optimizer stay f32,
    # exactly as the shipped drivers train.

    use_mesh = n_devices > 1
    step_fn = make_step('data' if use_mesh else None)

    if use_mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from rcfd_tpu.parallel.mesh import data_parallel_step, get_mesh
        mesh = get_mesh(n_devices)
        step_jit = data_parallel_step(mesh, step_fn)
        batch_sharding = NamedSharding(mesh, P('data'))
        replicated = NamedSharding(mesh, P())
        params = jax.device_put(params, replicated)
        state = jax.device_put(state, replicated)
        opt_state = jax.device_put(opt_state, replicated)
    else:
        batch_sharding = None
        step_jit = jax.jit(step_fn, donate_argnums=(0, 1, 2))

    # ---- timed loop: loader -> prefetch -> sharded step -----------------
    rng = jax.random.PRNGKey(1)
    lr = jnp.float32(1e-4)
    aug_p = jnp.float32(1.0)
    if args.n_steps < 1:
        raise SystemExit('--n_steps must be >= 1')
    if args.n_warmup < 0:
        raise SystemExit('--n_warmup must be >= 0')
    n_done = 0
    # with no warmup the timer starts before the first step (the in-loop
    # n_done == n_warmup trigger can never fire at 0: n_done is already 1
    # by the first check)
    t_start = time.perf_counter() if args.n_warmup <= 0 else None
    n_timed_start = 0
    epoch = 0
    last_info = None
    while n_done < args.n_steps + args.n_warmup:
        epoch += 1
        loader.set_epoch(epoch)
        for batch in device_prefetch(loader, batch_sharding):
            rng, key = jax.random.split(rng)
            params, state, opt_state, last_info = step_jit(
                params, state, opt_state, batch, key, lr, aug_p)
            n_done += 1
            if n_done == args.n_warmup:
                jax.block_until_ready(last_info['loss'])
                t_start = time.perf_counter()
                n_timed_start = n_done
            if n_done >= args.n_steps + args.n_warmup:
                break
    loss = float(last_info['loss'])  # fences the last step
    dt = time.perf_counter() - t_start
    n_timed = n_done - n_timed_start
    step_ms = dt / n_timed * 1e3
    sps = n_timed * batch_size / dt
    assert np.isfinite(loss), loss

    # device-resident step-only time (same batch re-fed): isolates the
    # compute from the loader + host->device transfer the loop above
    # includes. On this container the H2D path crosses an HTTP relay, so
    # end-to-end can be transfer-bound — the gap between step_ms and
    # step_only_ms is the input-delivery cost, not chip time.
    batch_dev = jax.device_put(batch, batch_sharding)
    rng, key = jax.random.split(rng)
    params, state, opt_state, info = step_jit(
        params, state, opt_state, batch_dev, key, lr, aug_p)
    jax.block_until_ready(info['loss'])
    n_only = max(4, args.n_steps // 2)
    t0 = time.perf_counter()
    for _ in range(n_only):
        rng, key = jax.random.split(rng)
        params, state, opt_state, info = step_jit(
            params, state, opt_state, batch_dev, key, lr, aug_p)
    jax.block_until_ready(info['loss'])
    step_only_ms = (time.perf_counter() - t0) / n_only * 1e3

    shape = [args.height, args.width] if args.family == 'fusionnet' else \
        [args.height, args.patch_width, args.total_points_sampled]
    print(json.dumps({
        'harness': 'trainbench',
        'family': args.family,
        'model': args.model,
        'backend': jax.devices()[0].platform,
        'n_devices': n_devices,
        'batch_size': batch_size,
        'shape': shape,
        'train_dtype': args.train_dtype or 'float32',
        'step_ms': round(step_ms, 3),
        'step_only_ms': round(step_only_ms, 3),
        'step_only_samples_per_s': round(batch_size / step_only_ms * 1e3, 3),
        'samples_per_s': round(sps, 3),
        'samples_per_s_per_chip': round(sps / n_devices, 3),
        'loader_only_samples_per_s': round(loader_sps, 3),
        'loss': round(loss, 5),
    }))


if __name__ == '__main__':
    main()

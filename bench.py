"""Benchmark: FusionNet full-resolution inference frames/sec/chip.

Measures the canonical FusionNet (bash/run_fusionnet_nuscenes.sh config:
fusionnet18+BN, weight_and_project, 6-stage encoder, multiscale decoder)
on full nuScenes frames (900 x 1600), bfloat16 compute on the TPU MXU with
an fp32 accuracy cross-check.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": r}

vs_baseline is measured against the PyTorch reference implementation
running the same model/inputs on the host CPU (the only hardware the
reference can use in this container); the baseline fps is cached in
BENCH_BASELINE.json after the first run.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, 'BENCH_BASELINE.json')

HEIGHT, WIDTH = 900, 1600
CONFIG = dict(
    input_channels_image=3,
    input_channels_depth=2,
    encoder_type='fusionnet18_batch_norm',
    n_filters_encoder_image=[32, 64, 128, 256, 256, 256],
    n_filters_encoder_depth=[16, 32, 64, 128, 128, 128],
    fusion_type='weight_and_project',
    decoder_type='multiscale_batch_norm',
    n_resolution_decoder=1,
    n_filters_decoder=[256, 256, 128, 64, 64, 32],
    deconv_type='up',
    activation_func='leaky_relu',
    weight_initializer='kaiming_uniform',
    min_predict_depth=1.0,
    max_predict_depth=100.0,
)


def _inputs(batch, rng):
    image = rng.random((batch, HEIGHT, WIDTH, 3), dtype=np.float32)
    depth = (rng.random((batch, HEIGHT, WIDTH, 1), dtype=np.float32) * 80)
    response = rng.random((batch, HEIGHT, WIDTH, 1), dtype=np.float32)
    return image, depth, response


def bench_ours(batch_candidates=(32, 16, 8, 4, 2, 1), dtype='bfloat16',
               n_scan=None, mode=None):
    """FusionNet inference throughput.

    mode='dispatch' (default): chained per-call timing loop. Robust, but
    this container reaches the chip through a relay whose per-dispatch RPC
    overhead (~150 ms) is included — the number UNDERSTATES device
    throughput (a separately measured device-only split put the model at
    ~21 ms/frame vs ~59 ms/frame including relay overhead; see
    docs/PERF.md).

    mode='scan' (RCFD_BENCH_MODE=scan): a single on-device lax.scan of
    chained forwards amortizes the dispatch overhead over batch*n_scan
    frames — the honest device number, but its remote compile can take
    >10 min through this container's compile relay, so it is opt-in. The
    carry feeds each output back into the next input (x 1e-12) so the
    compiler cannot CSE/hoist the loop body.
    """
    mode = mode or os.environ.get('RCFD_BENCH_MODE', 'dispatch')
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rcfd_tpu.models import FusionNetModel
    from rcfd_tpu.nn.core import cast_tree
    from rcfd_tpu.nn.optimize import fold_batch_norm

    model = FusionNetModel(**CONFIG)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    params, state = jax.jit(fold_batch_norm)(params, state)
    cdtype = jnp.bfloat16 if dtype == 'bfloat16' else jnp.float32
    params_c = cast_tree(params, cdtype)
    state_c = cast_tree(state, cdtype)

    def make_loop(n):
        @jax.jit
        def loop(p, s, image, depth, response):
            input_depth = jnp.concatenate([depth, response], axis=-1)

            def body(img, _):
                out, _ = model.apply(p, s, img.astype(cdtype),
                                     input_depth.astype(cdtype),
                                     training=False)
                img = img + out.astype(img.dtype) * 1e-12
                return img, ()

            img, _ = lax.scan(body, image, None, length=n)
            return img[0, 0, 0, 0]

        return loop

    @jax.jit
    def forward(p, s, image, depth, response):
        input_depth = jnp.concatenate([depth, response], axis=-1)
        out, _ = model.apply(p, s, image.astype(cdtype),
                             input_depth.astype(cdtype), training=False)
        return out.astype(jnp.float32)

    rng = np.random.default_rng(0)
    last_err = None
    for batch in batch_candidates:
        try:
            image, depth, response = _inputs(batch, rng)
            args = tuple(jax.device_put(a) for a in (image, depth, response))

            # ~64 frames per timing loop bounds both compile size and
            # wall time across batch candidates
            n_iters_scan = n_scan or max(2, 64 // batch)

            if mode == 'scan':
                loop = make_loop(n_iters_scan)
                float(loop(params_c, state_c, *args))  # compile + warm

                def run():
                    t0 = time.perf_counter()
                    v = float(loop(params_c, state_c, *args))
                    assert np.isfinite(v)
                    return time.perf_counter() - t0

                dt = min(run() for _ in range(3))
                n_frames = batch * n_iters_scan
            else:
                n_iters = 10
                out = forward(params_c, state_c, *args)
                float(jnp.sum(out[:, ::64, ::64]))  # compile + fence
                t0 = time.perf_counter()
                acc = jnp.zeros((), jnp.float32)
                for _ in range(n_iters):
                    out = forward(params_c, state_c, *args)
                    acc = acc + out[0, 0, 0, 0]  # chain without host sync
                assert np.isfinite(float(acc))
                dt = time.perf_counter() - t0
                n_frames = batch * n_iters

            fps = n_frames / dt
            print(f'[bench] ours: mode={mode} batch={batch} dtype={dtype} '
                  f'{fps:.3f} frames/s', file=sys.stderr)
            return fps, batch
        except Exception as e:  # OOM fallback to smaller batch
            last_err = e
            print(f'[bench] batch={batch} failed: {type(e).__name__}: {e}',
                  file=sys.stderr)
    raise RuntimeError(f'all batch sizes failed: {last_err}')


def bench_reference_cpu(n_iters=2):
    """Reference PyTorch FusionNet on host CPU (same inputs)."""
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    from reference_import import import_reference
    import torch

    fusionnet_model = import_reference('fusionnet_model')
    ref = fusionnet_model.FusionNetModel(
        input_channels_image=CONFIG['input_channels_image'],
        input_channels_depth=CONFIG['input_channels_depth'],
        encoder_type=CONFIG['encoder_type'],
        n_filters_encoder_image=CONFIG['n_filters_encoder_image'],
        n_filters_encoder_depth=CONFIG['n_filters_encoder_depth'],
        fusion_type=CONFIG['fusion_type'],
        decoder_type=CONFIG['decoder_type'],
        n_resolution_decoder=CONFIG['n_resolution_decoder'],
        n_filters_decoder=CONFIG['n_filters_decoder'],
        deconv_type='up',
        activation_func='leaky_relu',
        weight_initializer='kaiming_uniform',
        min_predict_depth=1.0,
        max_predict_depth=100.0,
        device=torch.device('cpu'))
    ref.eval()

    rng = np.random.default_rng(0)
    image, depth, response = _inputs(1, rng)
    t_image = torch.from_numpy(image.transpose(0, 3, 1, 2))
    t_depth = torch.from_numpy(
        np.concatenate([depth, response], axis=-1).transpose(0, 3, 1, 2))
    with torch.no_grad():
        ref.forward(image=t_image, input_depth=t_depth)  # warmup
        t0 = time.perf_counter()
        for _ in range(n_iters):
            ref.forward(image=t_image, input_depth=t_depth)
        dt = time.perf_counter() - t0
    fps = n_iters / dt
    print(f'[bench] reference torch-cpu: {fps:.3f} frames/s', file=sys.stderr)
    return fps


def get_baseline_fps():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)['reference_cpu_fps']
    try:
        fps = bench_reference_cpu()
        with open(BASELINE_CACHE, 'w') as f:
            json.dump({'reference_cpu_fps': fps,
                       'note': 'reference PyTorch FusionNet, host CPU, '
                               '900x1600 single frame'}, f)
        return fps
    except Exception as e:
        print(f'[bench] reference baseline unavailable: {e}', file=sys.stderr)
        return None


def _emit(fps):
    baseline = get_baseline_fps()
    vs_baseline = (fps / baseline) if baseline else 1.0
    print(json.dumps({
        'metric': 'fusionnet_inference_frames_per_sec_per_chip',
        'value': round(fps, 3),
        'unit': 'frames/s',
        'vs_baseline': round(vs_baseline, 3),
    }))


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument('--mode', default=os.environ.get('RCFD_BENCH_MODE',
                                                         'auto'),
                        choices=['auto', 'scan', 'dispatch'])
    args = parser.parse_args()

    if args.mode in ('scan', 'dispatch'):
        batches = None
        if os.environ.get('RCFD_BENCH_BATCHES'):
            batches = tuple(int(b) for b in
                            os.environ['RCFD_BENCH_BATCHES'].split(','))
        fps, _ = bench_ours(
            mode=args.mode,
            **({'batch_candidates': batches} if batches else {}))
        _emit(fps)
        return

    # auto: try the honest device-throughput (scan) measurement in a
    # watchdogged subprocess — its remote compile can stall for tens of
    # minutes through this container's compile relay. On timeout, retry
    # the scan with smaller batches (cheaper compiles) before the
    # conservative dispatch-loop fallback (includes relay RPC per call).
    import subprocess
    budget = float(os.environ.get('RCFD_BENCH_SCAN_BUDGET', '1500'))

    def try_scan(batches=None, timeout=budget):
        env = dict(os.environ)
        if batches:
            env['RCFD_BENCH_BATCHES'] = batches
        try:
            result = subprocess.run(
                [sys.executable, os.path.abspath(__file__), '--mode', 'scan'],
                timeout=timeout, capture_output=True, text=True, cwd=REPO,
                env=env)
        except subprocess.TimeoutExpired:
            sys.stderr.write(
                f'[bench] scan (batches={batches}) exceeded {timeout:.0f}s\n')
            return None
        if result.returncode == 0:
            for line in result.stdout.strip().splitlines():
                if line.startswith('{'):
                    sys.stderr.write(result.stderr[-2000:])
                    return line
        sys.stderr.write('[bench] scan subprocess failed\n')
        sys.stderr.write(result.stderr[-2000:])
        return None

    line = try_scan() or try_scan('8,4,2,1', timeout=budget * 0.6)
    if line:
        print(line)
        return

    fps, _ = bench_ours(mode='dispatch')
    _emit(fps)


if __name__ == '__main__':
    main()

"""Microbenchmarks for the custom TPU ops: quasi-dense scatter (XLA vs
Pallas), column ROI pooling, the reprojection merge kernel, and RadarNet
end-to-end scatter inference.

Run on the real chip: python tools/microbench.py
Results land in docs/PERF.md territory (run and record per round).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n=10, warmup=1):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    # force a real fence through a tiny fetch (axon relay)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / n


def _fetch(out):
    import jax.numpy as jnp
    leaf = out[0] if isinstance(out, (tuple, list)) else out
    float(jnp.sum(leaf.ravel()[:16]))


def bench_scatter(k=128, h=900, w=1600, ph=900, pw=288):
    import jax
    import jax.numpy as jnp
    from rcfd_tpu.ops.scatter import scatter_quasi_dense
    from rcfd_tpu.ops.scatter_pallas import scatter_quasi_dense_pallas

    rng = np.random.default_rng(0)
    pad = pw // 2
    crops = jnp.asarray(rng.random((k, ph, pw), dtype=np.float32))
    x = jnp.asarray(rng.integers(pad, w + pad, size=(k,)).astype(np.float32))
    z = jnp.asarray(rng.random(k, dtype=np.float32) * 70 + 1)
    valid = jnp.ones((k,), bool)

    xla = jax.jit(lambda c, xx, zz, v: scatter_quasi_dense(
        c, xx, zz, v, h, w, (ph, pw)))
    pallas = jax.jit(lambda c, xx, zz, v: scatter_quasi_dense_pallas(
        c, xx, zz, v, h, w, (ph, pw)))

    t_xla = timed(xla, crops, x, z, valid)
    print(f'scatter K={k}: xla {t_xla * 1000:.2f} ms')
    try:
        t_pal = timed(pallas, crops, x, z, valid)
        print(f'scatter K={k}: pallas {t_pal * 1000:.2f} ms '
              f'({t_xla / t_pal:.2f}x)')
    except Exception as e:
        print(f'scatter pallas failed: {type(e).__name__}: {e}')


def bench_roi_pool(b=1, k=128, patch_h=900, patch_w=288, img_w=1888):
    import jax
    import jax.numpy as jnp
    from rcfd_tpu.ops.roi_pool import roi_pool_column

    rng = np.random.default_rng(0)
    # the 1/2-scale skip is the most expensive pooled level
    feat = jnp.asarray(
        rng.random((b, patch_h // 2, img_w // 2, 32), dtype=np.float32))
    x1 = jnp.asarray(rng.integers(0, img_w - patch_w, size=(b, k))
                     .astype(np.float32))
    fn = jax.jit(lambda f, x: roi_pool_column(
        f, x, box_width=patch_w, box_y1=0, box_y2=patch_h, spatial_scale=0.5,
        output_size=(patch_h // 2, patch_w // 2)))
    t = timed(fn, feat, x1, n=5)
    print(f'roi_pool_column 1/2-scale K={k}: {t * 1000:.2f} ms')


def bench_reproject(h=900, w=1600):
    import jax
    import jax.numpy as jnp
    from rcfd_tpu.geometry.reproject import merge_neighbor_into_main

    rng = np.random.default_rng(0)
    main = jnp.asarray(rng.random((h, w), dtype=np.float32) * 60)
    neighbor = jnp.asarray(rng.random((h, w), dtype=np.float32) * 60)
    k = jnp.asarray(np.array(
        [[1266.4, 0, 816.3], [0, 1266.4, 491.5], [0, 0, 1]], np.float32))
    m = jnp.asarray(np.eye(4, dtype=np.float32))
    fn = jax.jit(lambda a, b: merge_neighbor_into_main(a, b, k, m, k))
    t = timed(fn, main, neighbor, n=5)
    px_per_s = h * w / t
    print(f'reproject+merge 900x1600: {t * 1000:.2f} ms '
          f'({px_per_s / 1e9:.2f} Gpix/s) — one neighbor frame of the '
          f'multi-frame GT merge')


def bench_radarnet(k=64, h=900, w=1600):
    """End-to-end RadarNet scatter inference (stage 1) on one frame."""
    import jax
    import jax.numpy as jnp
    from rcfd_tpu import radarnet_main
    from rcfd_tpu.data.transforms import Transforms
    from rcfd_tpu.models import RadarNetModel

    model = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(900, 288),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[32, 64, 128, 128, 128],
        n_neurons_encoder_depth=[32, 64, 128, 128, 128],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[256, 128, 64, 32, 16])
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    forward = radarnet_main.make_forward_fn(
        model, Transforms(normalized_image_range=[0, 1]), h, w)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32) * 255)
    points = jnp.asarray(np.stack([
        rng.integers(0, w, k).astype(np.float32),
        rng.integers(0, h, k).astype(np.float32),
        rng.random(k, dtype=np.float32) * 70 + 1], axis=1))
    valid = jnp.ones((k,), bool)
    t = timed(lambda *a: forward(params, state, *a), image, points, valid,
              n=3)
    print(f'radarnet inference K={k} full frame: {t * 1000:.1f} ms '
          f'({1.0 / t:.2f} frames/s)')


def bench_pipeline(k=64, h=900, w=1600):
    """Fused two-stage pipeline per frame (BASELINE north star)."""
    import jax
    import jax.numpy as jnp
    from rcfd_tpu.models import FusionNetModel, RadarNetModel
    from rcfd_tpu.pipeline import TwoStagePipeline

    radarnet = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(900, 288),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[32, 64, 128, 128, 128],
        n_neurons_encoder_depth=[32, 64, 128, 128, 128],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[256, 128, 64, 32, 16])
    fusionnet = FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[32, 64, 128, 256, 256, 256],
        n_filters_encoder_depth=[16, 32, 64, 128, 128, 128],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=1,
        n_filters_decoder=[256, 256, 128, 64, 64, 32],
        min_predict_depth=1.0, max_predict_depth=100.0)
    pipe = TwoStagePipeline(
        radarnet, fusionnet,
        jax.jit(radarnet.init)(jax.random.PRNGKey(0)),
        jax.jit(fusionnet.init)(jax.random.PRNGKey(1)),
        h, w, optimize=True, compute_dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((1, h, w, 3), dtype=np.float32) * 255)
    points = jnp.asarray(np.stack([
        rng.integers(0, w, k).astype(np.float32),
        rng.integers(0, h, k).astype(np.float32),
        rng.random(k, dtype=np.float32) * 70 + 1], axis=1))
    valid = jnp.ones((k,), bool)
    t = timed(pipe, image, points, valid, n=3)
    print(f'fused two-stage pipeline K={k} full frame: {t * 1000:.1f} ms '
          f'({1.0 / t:.2f} frames/s)')

    # batched serving path (B=4 is the v5e sweet spot; B>=6 hits the HBM
    # ceiling on the per-point patch pyramids)
    b = 4
    images_b = jnp.broadcast_to(image, (b,) + image.shape[1:])
    points_b = jnp.broadcast_to(points[None], (b,) + points.shape)
    valid_b = jnp.broadcast_to(valid[None], (b, k))
    t = timed(pipe.forward_batched, images_b, points_b, valid_b, n=3)
    print(f'fused two-stage pipeline K={k} batched B={b}: '
          f'{t / b * 1000:.1f} ms/frame ({b / t:.2f} frames/s)')


def bench_pipeline_scan(k=64, h=900, w=1600, batches=(4, 8), n_scan=8):
    """Device-only fused-pipeline throughput: an on-device lax.scan of
    chained batched forwards amortizes the ~24 ms relay dispatch overhead
    (same methodology as bench.py scan mode — the honest device number)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rcfd_tpu.models import FusionNetModel, RadarNetModel
    from rcfd_tpu.pipeline import TwoStagePipeline

    radarnet = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(900, 288),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[32, 64, 128, 128, 128],
        n_neurons_encoder_depth=[32, 64, 128, 128, 128],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[256, 128, 64, 32, 16])
    fusionnet = FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[32, 64, 128, 256, 256, 256],
        n_filters_encoder_depth=[16, 32, 64, 128, 128, 128],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=1,
        n_filters_decoder=[256, 256, 128, 64, 64, 32],
        min_predict_depth=1.0, max_predict_depth=100.0)
    pipe = TwoStagePipeline(
        radarnet, fusionnet,
        jax.jit(radarnet.init)(jax.random.PRNGKey(0)),
        jax.jit(fusionnet.init)(jax.random.PRNGKey(1)),
        h, w, optimize=True, compute_dtype=jnp.bfloat16)
    fwd = pipe._build_forward_batched()

    rng = np.random.default_rng(0)
    for b in batches:
        images = jnp.asarray(
            rng.random((b, h, w, 3), dtype=np.float32) * 255)
        points = jnp.asarray(np.stack([
            rng.integers(0, w, (b, k)).astype(np.float32),
            rng.integers(0, h, (b, k)).astype(np.float32),
            rng.random((b, k), dtype=np.float32) * 70 + 1], axis=-1))
        valid = jnp.ones((b, k), bool)

        @jax.jit
        def loop(rn_p, rn_s, fn_p, fn_s, images, points, valid):
            def body(img, _):
                out, _, _ = fwd(rn_p, rn_s, fn_p, fn_s, img, points, valid)
                return img + out[..., None].astype(img.dtype) * 1e-12, ()
            img, _ = lax.scan(body, images, None, length=n_scan)
            return img[0, 0, 0, 0]

        args = (pipe.radarnet_params, pipe.radarnet_state,
                pipe.fusionnet_params, pipe.fusionnet_state,
                images, points, valid)
        try:
            float(loop(*args))  # compile + warm
            t = min((lambda t0: (float(loop(*args)),
                                 time.perf_counter() - t0)[1])(
                time.perf_counter()) for _ in range(3))
            ms = t / (b * n_scan) * 1000
            print(f'pipeline scan-mode K={k} B={b}: {ms:.1f} ms/frame '
                  f'({1000.0 / ms:.2f} frames/s device-only)', flush=True)
        except Exception as e:
            print(f'pipeline scan-mode B={b} failed: '
                  f'{type(e).__name__}: {e}', flush=True)


def bench_train(n_lo=2, n_hi=8):
    """Canonical train-step throughput for both models (slope method over
    an on-device lax.scan whose carry is the full (params, state, opt)
    triple — the natural chaining for a train step). RCFD_TRAIN_DTYPE
    selects precision."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from rcfd_tpu import fusionnet_main, radarnet_main
    from rcfd_tpu.data.transforms import Transforms
    from rcfd_tpu.models import FusionNetModel, RadarNetModel
    from rcfd_tpu.parallel.optim import init_adam

    rng = np.random.default_rng(0)

    def slope(step_fn, params, state, opt_state, batch, n_samples):
        def timed(n):
            @jax.jit
            def loop(params, state, opt_state, batch):
                def body(carry, _):
                    p, s, o = carry
                    p, s, o, info = step_fn(
                        p, s, o, batch, jax.random.PRNGKey(0),
                        jnp.float32(1e-4), jnp.float32(0.0))
                    return (p, s, o), info['loss']
                carry, losses = lax.scan(
                    body, (params, state, opt_state), None, length=n)
                return losses[-1]
            float(loop(params, state, opt_state, batch))
            return min(
                (lambda t0: (float(loop(params, state, opt_state, batch)),
                             time.perf_counter() - t0)[1])(
                    time.perf_counter()) for _ in range(3))
        t_lo, t_hi = timed(n_lo), timed(n_hi)
        ms = (t_hi - t_lo) / (n_hi - n_lo) * 1000
        print(f'  {ms:.1f} ms/step = {n_samples / ms * 1000:.1f} '
              f'samples/s/chip', flush=True)

    # RadarNet: bash/train_radarnet_nuscenes.sh (bs 6, patch 900x288, K=4)
    b, k, ph, pw = 6, 4, 900, 288
    w_pad = 1600 + pw
    model = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(ph, pw),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[32, 64, 128, 128, 128],
        n_neurons_encoder_depth=[32, 64, 128, 128, 128],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[256, 128, 64, 32, 16])
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    opt_state = init_adam(params)
    step_fn = radarnet_main._make_train_step(
        model, Transforms(normalized_image_range=[0, 1]), (ph, pw),
        max_distance_correspondence=0.4,
        set_invalid_to_negative_class=True,
        w_positive_class=2.0, w_weight_decay=0.0)
    x1 = rng.integers(0, w_pad - pw, (b, k)).astype(np.float32)
    batch = (
        jnp.asarray(rng.random((b, ph, w_pad, 3), np.float32) * 255),
        jnp.asarray(np.stack([
            x1 + pw // 2,
            rng.integers(0, ph, (b, k)).astype(np.float32),
            rng.random((b, k), np.float32) * 70 + 1], axis=-1)),
        jnp.asarray(np.stack(
            [x1, np.zeros_like(x1), x1 + pw, np.full_like(x1, ph)],
            axis=-1)),
        jnp.asarray(rng.random((b, k, ph, pw, 1), np.float32) * 70),
    )
    print(f'radarnet train step bs={b} K={k} patch={ph}x{pw} '
          f'dtype={os.environ.get("RCFD_TRAIN_DTYPE", "float32")}:',
          flush=True)
    slope(step_fn, params, state, opt_state, batch, b)

    # FusionNet: bash/train_fusionnet_nuscenes.sh (bs 16, 448x448 crops)
    b, hw = 16, 448
    model = FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[32, 64, 128, 256, 256, 256],
        n_filters_encoder_depth=[16, 32, 64, 128, 128, 128],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=1,
        n_filters_decoder=[256, 256, 128, 64, 64, 32],
        min_predict_depth=1.0, max_predict_depth=100.0)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    opt_state = init_adam(params)
    step_fn = fusionnet_main._make_train_step(
        model, Transforms(normalized_image_range=[0, 1]),
        loss_func='l1', w_smoothness=0.0, w_lidar_loss=2.0,
        w_weight_decay=0.0, loss_smoothness_kernel_size=3,
        outlier_kernel_size=7, outlier_threshold=1.5,
        dilation_kernel_size=-1)
    batch = (
        jnp.asarray(rng.random((b, hw, hw, 3), np.float32) * 255),
        jnp.asarray(rng.random((b, hw, hw, 1), np.float32) * 80),
        jnp.asarray(rng.random((b, hw, hw, 1), np.float32)),
        jnp.asarray(rng.random((b, hw, hw, 1), np.float32) * 80),
        jnp.asarray(rng.random((b, hw, hw, 1), np.float32) * 80),
    )
    print(f'fusionnet train step bs={b} {hw}x{hw} '
          f'dtype={os.environ.get("RCFD_TRAIN_DTYPE", "float32")}:',
          flush=True)
    slope(step_fn, params, state, opt_state, batch, b)


def bench_io(n=64, h=900, w=1600, threads=8):
    """Host decode throughput: native C++ codec vs PIL."""
    import tempfile

    from rcfd_tpu import native
    from rcfd_tpu.data import io as data_utils

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(n):
            depth = rng.random((h, w), dtype=np.float32) * 80
            p = os.path.join(d, f'{i}.png')
            data_utils.save_depth(depth, p)
            paths.append(p)

        t0 = time.perf_counter()
        for p in paths:
            os.environ['RCFD_NATIVE_IO'] = '0'
            data_utils.load_depth(p)
        t_pil = time.perf_counter() - t0
        os.environ['RCFD_NATIVE_IO'] = '1'

        if native.available():
            t0 = time.perf_counter()
            native.batch_read_depth(paths, h, w, n_threads=threads)
            t_nat = time.perf_counter() - t0
            print(f'depth decode {n}x{h}x{w}: PIL {n / t_pil:.1f} img/s, '
                  f'native({threads} threads) {n / t_nat:.1f} img/s '
                  f'({t_pil / t_nat:.1f}x)')
        else:
            print(f'depth decode {n}: PIL {n / t_pil:.1f} img/s '
                  f'(native unavailable)')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--ops', nargs='+',
                        default=['scatter', 'roi_pool', 'reproject'])
    parser.add_argument('--k', type=int, default=128)
    args = parser.parse_args()
    if 'scatter' in args.ops:
        bench_scatter(k=args.k)
    if 'roi_pool' in args.ops:
        bench_roi_pool(k=args.k)
    if 'reproject' in args.ops:
        bench_reproject()
    if 'radarnet' in args.ops:
        bench_radarnet(k=min(args.k, 64))
    if 'io' in args.ops:
        bench_io()
    if 'pipeline' in args.ops:
        bench_pipeline(k=min(args.k, 64))
    if 'pipeline_scan' in args.ops:
        bench_pipeline_scan(k=min(args.k, 64))
    if 'train' in args.ops:
        bench_train()


if __name__ == '__main__':
    main()

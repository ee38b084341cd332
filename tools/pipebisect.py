"""Bisect the fused two-stage pipeline's 44.5 ms/frame (B=4, K=64).

Per-stage microbenches are unreliable here (isolated pool2 measures
6.25 ms/frame but pool2+deconv1 together in context cost ~2.9 — XLA
lowers the same op differently per context, docs/PERF.md round-3), so
this tool cuts the REAL serving graph (pipeline._build_forward_batched
recreated inline) at successive points and times each cut with the
exact bench_pipeline_scan methodology (on-device lax.scan of chained
batched forwards, n_scan=8, min of 3). Successive differences are the
honest in-context stage costs:

  rn      : transforms + pad + RadarNet apply (responses)
  scatter : + threshold/scatter/argmax composite (quasi-dense maps)
  bridge  : + PNG-codec quantization emulation + input_depth stack
  full    : + FusionNet (the headline 44.5 reference point)
  fn      : FusionNet alone on random bridge inputs (for cross-check)

Usage: python tools/pipebisect.py [--cuts rn scatter bridge full fn]
       [--b 4] [--k 64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--b', type=int, default=4)
    parser.add_argument('--k', type=int, default=64)
    parser.add_argument('--n_scan', type=int, default=8)
    parser.add_argument('--cuts', nargs='*',
                        default=['rn', 'scatter', 'bridge', 'full', 'fn'])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from rcfd_tpu.models import FusionNetModel, RadarNetModel
    from rcfd_tpu.pipeline import RESPONSE_DECODE_SCALE, TwoStagePipeline

    h, w, b, k = 900, 1600, args.b, args.k
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

    patch_size = radarnet.input_patch_size_image
    pad = patch_size[1] // 2
    compute_dtype = jnp.bfloat16

    from rcfd_tpu.ops.scatter import scatter_quasi_dense
    from rcfd_tpu.ops.scatter_pallas import MAX_POINTS as _PALLAS_MAX_K
    from rcfd_tpu.ops.scatter_pallas import scatter_quasi_dense_pallas

    # mirror the shipped serving graph's choice (XLA scatter default in
    # THIS graph; PerfConfig.pallas_scatter / RCFD_PALLAS_SCATTER=1 at
    # construction opts in) so the bisect numbers match the pipeline
    use_pallas = pipe._use_pallas_scatter

    def stage_rn(rn_p, rn_s, images, points):
        (images_t,) = pipe.transforms.transform(
            jax.random.PRNGKey(0), [images],
            random_transform_probability=0.0)
        images_t = images_t.astype(compute_dtype)
        images_pad = jnp.pad(
            images_t, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode='edge')
        x_shifted = points[..., 0] + pad
        points_shifted = points.at[..., 0].set(x_shifted)
        x1 = x_shifted - pad
        responses, _ = pipe.radarnet.apply(
            rn_p, rn_s, images_pad,
            points_shifted.reshape(b * k, 3), x1,
            box_height=h, training=False, return_logits=False)
        crops = responses[..., 0].reshape(b, k, *responses.shape[1:3])
        return images_t, crops, x_shifted

    def stage_scatter(crops, x_shifted, points, valid):
        xs = x_shifted.astype(jnp.float32)
        zs = points[..., 2].astype(jnp.float32)

        def scatter_one(a):
            crops_i, xs_i, zs_i, valid_i = a
            if use_pallas and k <= _PALLAS_MAX_K:
                return scatter_quasi_dense_pallas(
                    crops_i, xs_i, zs_i, valid_i, image_height=h,
                    image_width=w, patch_size=patch_size)
            return scatter_quasi_dense(
                crops_i, xs_i, zs_i, valid_i, image_height=h,
                image_width=w, patch_size=patch_size)

        return jax.lax.map(scatter_one, (crops, xs, zs, valid))

    def stage_bridge(depth_map, response_map):
        depth_map = jnp.floor(depth_map * 256.0) / 256.0
        response_map = jnp.floor(
            response_map * (2.0 ** 14)) / (2.0 ** 14)
        response_in = response_map * RESPONSE_DECODE_SCALE
        input_depth = jnp.stack([depth_map, response_in], axis=-1)
        return input_depth.astype(compute_dtype)

    def cut_rn(rn_p, rn_s, fn_p, fn_s, images, points, valid):
        _, crops, _ = stage_rn(rn_p, rn_s, images, points)
        return crops.astype(jnp.float32)

    def cut_scatter(rn_p, rn_s, fn_p, fn_s, images, points, valid):
        _, crops, x_shifted = stage_rn(rn_p, rn_s, images, points)
        d, r = stage_scatter(crops, x_shifted, points, valid)
        return (d + r).astype(jnp.float32)

    def cut_bridge(rn_p, rn_s, fn_p, fn_s, images, points, valid):
        _, crops, x_shifted = stage_rn(rn_p, rn_s, images, points)
        d, r = stage_scatter(crops, x_shifted, points, valid)
        return jnp.sum(stage_bridge(d, r).astype(jnp.float32), axis=-1)

    def cut_full(rn_p, rn_s, fn_p, fn_s, images, points, valid):
        images_t, crops, x_shifted = stage_rn(rn_p, rn_s, images, points)
        d, r = stage_scatter(crops, x_shifted, points, valid)
        input_depth = stage_bridge(d, r)
        output_depth, _ = pipe.fusionnet.apply(
            fn_p, fn_s, images_t, input_depth, training=False)
        return output_depth[..., 0].astype(jnp.float32)

    def cut_fn(rn_p, rn_s, fn_p, fn_s, images, points, valid):
        (images_t,) = pipe.transforms.transform(
            jax.random.PRNGKey(0), [images],
            random_transform_probability=0.0)
        images_t = images_t.astype(compute_dtype)
        # stand-in bridge inputs derived from the image so the graph
        # cannot constant-fold them
        d = jnp.clip(images_t[..., 0].astype(jnp.float32) * 0.3, 0, 80)
        r = jnp.clip(images_t[..., 1].astype(jnp.float32), 0, 1)
        input_depth = stage_bridge(d, r)
        output_depth, _ = pipe.fusionnet.apply(
            fn_p, fn_s, images_t, input_depth, training=False)
        return output_depth[..., 0].astype(jnp.float32)

    cuts = {'rn': cut_rn, 'scatter': cut_scatter, 'bridge': cut_bridge,
            'full': cut_full, 'fn': cut_fn}

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32) * 255)
    points = jnp.asarray(np.stack([
        rng.integers(0, w, (b, k)).astype(np.float32),
        rng.integers(0, h, (b, k)).astype(np.float32),
        rng.random((b, k), dtype=np.float32) * 70 + 1], axis=-1))
    valid = jnp.ones((b, k), bool)

    print('backend:', jax.default_backend(),
          f'B={b} K={k} n_scan={args.n_scan}', flush=True)

    prev = None
    for name in args.cuts:
        fwd = cuts[name]

        @jax.jit
        def loop(rn_p, rn_s, fn_p, fn_s, images, points, valid, fwd=fwd):
            def body(img, _):
                out = fwd(rn_p, rn_s, fn_p, fn_s, img, points, valid)
                # fold a scalar of the output back into the carried
                # image (chained dependency; shape-agnostic)
                delta = jnp.sum(out) * 1e-30
                return (img + delta.astype(img.dtype)), ()
            img, _ = lax.scan(body, images, None, length=args.n_scan)
            return img[0, 0, 0, 0]

        fargs = (pipe.radarnet_params, pipe.radarnet_state,
                 pipe.fusionnet_params, pipe.fusionnet_state,
                 images, points, valid)
        t0 = time.perf_counter()
        try:
            float(loop(*fargs))
        except Exception as e:
            print(f'{name:8s} FAILED: {type(e).__name__}: {e}', flush=True)
            continue
        compile_s = time.perf_counter() - t0
        t = min((lambda s0: (float(loop(*fargs)),
                             time.perf_counter() - s0)[1])(
            time.perf_counter()) for _ in range(3))
        ms = t / (b * args.n_scan) * 1000
        delta = '' if prev is None else f'  (+{ms - prev:5.1f} vs prev)'
        prev = ms
        print(f'{name:8s} {ms:6.1f} ms/frame{delta}  [compile {compile_s:.0f}s]',
              flush=True)


if __name__ == '__main__':
    main()

"""A/B/C probe: FusionNet encoder stage-1 region strategies on the chip.

The combined s2d + packed-stage-1 bench graph fit b=32 but measured
SLOWER than the unpacked baseline (128.2 vs 150.0 fps) — this probe
isolates where the packed region loses: it times exactly the stage-1
work (both stems + weight_and_project fusion + both maxpools + the skip
handover) at the canonical bench config (b=32, 900x1600, Ci 3->32,
Cd 2->16, bf16, BN folded) four ways:

  unpacked      7x7/s2 stems, reduce_window maxpools        (baseline)
  s2d_stem      4x4/s1 stems over host-packed input, rest unpacked
  packed_d2s    ops/packed_stage1 region, skip unpacked via d2s
  packed_keep   same, skip handed over still packed (lower bound)
  pool_only_*   the 3x3/s2 maxpool alone: reduce_window vs packed

Outputs a JSON line with ms/iteration per variant. Exactness of every
variant is asserted against the unpacked baseline on small shapes first.

Usage: python tools/stage1probe.py [--batch 32]
       JAX_PLATFORMS=cpu python tools/stage1probe.py --check_only
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault('RCFD_COMPILE_CACHE', os.path.join(REPO, '.xla_cache'))
os.environ.setdefault('RCFD_COMPILE_CACHE_MIN_SECS', '2')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=32)
    parser.add_argument('--height', type=int, default=900)
    parser.add_argument('--width', type=int, default=1600)
    parser.add_argument('--n_scan', type=int, default=8)
    parser.add_argument('--check_only', action='store_true')
    args = parser.parse_args()

    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from jax import lax

    from rcfd_tpu.models.networks import FusionNetEncoder
    from rcfd_tpu.nn import functional as F
    from rcfd_tpu.nn.optimize import fold_batch_norm
    from rcfd_tpu.ops.packed_stage1 import (max_pool2d_packed,
                                            packed_fusion_stage1)
    from rcfd_tpu.ops.packed_tail import depth_to_space
    from rcfd_tpu.ops.s2d_stem import pack2x2_np, pack_np

    enc = FusionNetEncoder(
        n_layer=18, input_channels_image=3, input_channels_depth=2,
        n_filters_encoder_image=[32, 64, 128, 256, 256, 256],
        n_filters_encoder_depth=[16, 32, 64, 128, 128, 128],
        use_batch_norm=True, fusion_type='weight_and_project')
    params, state = jax.jit(enc.init)(jax.random.PRNGKey(0))
    params, state = jax.jit(fold_batch_norm)(params, state)

    def conv_mod(name, p, s, x):
        y, _ = enc.children[name](p[name], s[name], x, training=False)
        return y

    def stage1_unpacked(p, s, image, depth):
        fi = conv_mod('conv1_image', p, s, image)
        fd = conv_mod('conv1_depth', p, s, depth)
        w = conv_mod('conv1_weight', p, s, fd)
        pr = conv_mod('conv1_project', p, s, fd)
        skip = w * pr + fi
        return skip, F.max_pool2d(fi, 3, 2, 1), F.max_pool2d(fd, 3, 2, 1)

    # s2d stems (Conv2d shape dispatch) with unpacked stage-1 tensors
    def stage1_s2d_stem(p, s, image_pk, depth_pk):
        return stage1_unpacked(p, s, image_pk, depth_pk)

    def stage1_packed(p, s, image_pk, depth_pk, keep_packed):
        fused_p, fi_p, fd_p = packed_fusion_stage1(enc, p, s, image_pk,
                                                   depth_pk)
        skip = fused_p if keep_packed else depth_to_space(
            fused_p, fused_p.shape[-1] // 4)
        return (skip, max_pool2d_packed(fi_p, fi_p.shape[-1] // 4),
                max_pool2d_packed(fd_p, fd_p.shape[-1] // 4))

    # ---- exactness on small shapes --------------------------------------
    rng = np.random.default_rng(0)
    im_s = rng.random((2, 64, 96, 3), np.float32)
    dp_s = rng.random((2, 64, 96, 2), np.float32)
    want = jax.jit(stage1_unpacked)(params, state, im_s, dp_s)
    got_b = jax.jit(stage1_s2d_stem)(params, state, pack2x2_np(im_s),
                                     pack2x2_np(dp_s))
    got_c = jax.jit(lambda p, s, i, d: stage1_packed(p, s, i, d, False))(
        params, state, pack2x2_np(im_s), pack2x2_np(dp_s))
    got_d = jax.jit(lambda p, s, i, d: stage1_packed(p, s, i, d, False))(
        params, state, pack_np(im_s, 4), pack_np(dp_s, 4))
    for a, b in zip(want, got_b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
    for a, c in zip(want, got_c):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
    for a, d in zip(want, got_d):
        np.testing.assert_allclose(np.asarray(d), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
    if args.check_only:
        print(json.dumps({'probe': 'stage1', 'check_only': True}))
        return

    # ---- timed on the device (scan + scalar fetch) ----------------------
    B, H, W = args.batch, args.height, args.width
    image_u8 = rng.integers(0, 256, (B, H, W, 3), np.uint8)
    depth_u16 = rng.integers(0, 80 * 256, (B, H, W, 2), np.uint16)

    def cast_in(img, dep):
        return (img.astype(jnp.bfloat16) * jnp.bfloat16(1 / 255.),
                dep.astype(jnp.bfloat16) * jnp.bfloat16(1 / 256.))

    params_c = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params)

    def make_loop(fn, n):
        @jax.jit
        def loop(img_raw, dep_raw):
            img, dep = cast_in(img_raw, dep_raw)

            def body(acc, _):
                skip, fi, fd = fn(params_c, state,
                                  img + acc * jnp.bfloat16(1e-20), dep)
                out = (skip[0, 0, 0, 0] + fi[0, 0, 0, 0] +
                       fd[0, 0, 0, 0]).astype(jnp.bfloat16)
                return out, ()

            acc, _ = lax.scan(body, jnp.bfloat16(0.0), None, length=n)
            return acc.astype(jnp.float32)

        return loop

    # maxpool-only probes
    fi_full = rng.random((B, H // 2, W // 2, 32), np.float32)

    def pool_unpacked(p, s, x, _):
        y = F.max_pool2d(x, 3, 2, 1)
        return y, y, y

    def pool_packed(p, s, xp, _):
        y = max_pool2d_packed(xp, xp.shape[-1] // 4)
        return y, y, y

    variants = [
        ('unpacked', stage1_unpacked, image_u8, depth_u16),
        ('s2d_stem', stage1_s2d_stem, pack2x2_np(image_u8),
         pack2x2_np(depth_u16)),
        ('packed_d2s',
         lambda p, s, i, d: stage1_packed(p, s, i, d, False),
         pack2x2_np(image_u8), pack2x2_np(depth_u16)),
        ('packed_keep',
         lambda p, s, i, d: stage1_packed(p, s, i, d, True),
         pack2x2_np(image_u8), pack2x2_np(depth_u16)),
        ('packed4_d2s',
         lambda p, s, i, d: stage1_packed(p, s, i, d, False),
         pack_np(image_u8, 4), pack_np(depth_u16, 4)),
        ('packed4_keep',
         lambda p, s, i, d: stage1_packed(p, s, i, d, True),
         pack_np(image_u8, 4), pack_np(depth_u16, 4)),
        ('pool_only_unpacked', pool_unpacked,
         (fi_full * 255).astype(np.uint8), depth_u16[:, :2, :2]),
        ('pool_only_packed', pool_packed,
         pack2x2_np((fi_full * 255).astype(np.uint8)),
         depth_u16[:, :2, :2]),
    ]

    results = {}
    for name, fn, a1, a2 in variants:
        loop = make_loop(fn, args.n_scan)
        a1d, a2d = jax.device_put(a1), jax.device_put(a2)
        try:
            assert np.isfinite(float(loop(a1d, a2d)))
        except Exception as e:  # OOM etc: record and continue
            results[name] = f'failed: {type(e).__name__}'
            print(f'[stage1probe] {name}: FAILED {e}', file=sys.stderr)
            continue

        def run():
            t0 = time.perf_counter()
            assert np.isfinite(float(loop(a1d, a2d)))
            return time.perf_counter() - t0

        dt = min(run() for _ in range(3)) / args.n_scan
        results[name] = round(dt * 1e3, 3)
        print(f'[stage1probe] {name}: {dt * 1e3:.3f} ms/iter (b={B})',
              file=sys.stderr)

    print(json.dumps({'probe': 'stage1', 'batch': B,
                      'backend': jax.devices()[0].platform,
                      'ms_per_iter': results}))


if __name__ == '__main__':
    main()

"""Per-stage timing of the RadarNet half of the fused pipeline at the
exact serving shapes (K = B*K_points patches, bf16), slope method over an
on-device lax.scan (cancels the relay's fixed dispatch overhead).

All arrays are jit ARGUMENTS — closed-over constants get serialized into
the HLO shipped to the remote compiler (minutes of host CPU). Each body
consumes a FULL reduction of its output (a single-element slice lets XLA
dead-code-eliminate most of a convolution) and perturbs its input via the
carry so the scan body cannot be hoisted.

Usage: python tools/rnstagebench.py [--k 256] [--stages pool2 deconv1 ...]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--k', type=int, default=256,
                        help='patches per device step (B*K_points)')
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--stages', nargs='*', default=None)
    parser.add_argument('--n_lo', type=int, default=2)
    parser.add_argument('--n_hi', type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from rcfd_tpu.nn.core import cast_tree
    from rcfd_tpu.nn.layers import DecoderBlock, Conv2d
    from rcfd_tpu.nn.optimize import fold_batch_norm
    from rcfd_tpu.ops.roi_pool import roi_pool_column
    from rcfd_tpu.ops.packed_tail import packed_decoder_tail
    from rcfd_tpu.ops.scatter_pallas import scatter_quasi_dense_pallas

    dt = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    K = args.k
    B = 4  # frames; pooled feature maps are per-frame
    KPF = K // B  # points per frame
    rng = np.random.default_rng(0)

    def arr(shape, scale=1.0):
        return jax.device_put(jnp.asarray(
            rng.random(shape, dtype=np.float32) * scale, dt))

    def mk_block(cin, cs, cout, key):
        blk = DecoderBlock(cin, cs, cout, use_batch_norm=True,
                           deconv_type='up')
        p, s = blk.init(jax.random.PRNGKey(key))
        p, s = fold_batch_norm({'b': p}, {'b': s})
        return blk, cast_tree(p['b'], dt), cast_tree(s['b'], dt)

    def slope(body, *arrays):
        """body(c, *arrays) -> scalar f32; returns ms/iter."""
        def timed(n):
            @jax.jit
            def loop(*arrays):
                def b(c, _):
                    return body(c, *arrays), ()
                c, _ = lax.scan(b, jnp.float32(0.0), None, length=n)
                return c
            float(loop(*arrays))
            return min(
                (lambda t0: (float(loop(*arrays)),
                             time.perf_counter() - t0)[1])(
                    time.perf_counter()) for _ in range(3))
        t_lo, t_hi = timed(args.n_lo), timed(args.n_hi)
        return (t_hi - t_lo) / (args.n_hi - args.n_lo) * 1000

    stages = {}

    # ---- ROI pools: per-frame feature maps -> K pooled windows --------
    # padded image width 1600 + 288 -> feature widths 944/472/236/118/59
    pool_cfgs = {
        'pool2': ((B, 450, 944, 32), 0.5, (450, 144)),
        'pool4': ((B, 225, 472, 64), 0.25, (225, 72)),
        'pool8': ((B, 113, 236, 128), 0.125, (112, 36)),
        'pool16': ((B, 57, 118, 128), 0.0625, (56, 18)),
        'pool32': ((B, 29, 59, 128), 1 / 32., (28, 9)),
    }
    for name, (fshape, scale, out_size) in pool_cfgs.items():
        feat = arr(fshape)
        x1 = jax.device_put(jnp.asarray(
            rng.integers(0, 1600, (B, KPF)).astype(np.float32)))

        def body(c, feat, x1, scale=scale, out_size=out_size):
            fp = (feat * (1 + c * 1e-12)).astype(feat.dtype)
            p = roi_pool_column(fp, x1, box_width=288,
                                box_y1=0, box_y2=900, spatial_scale=scale,
                                output_size=out_size)
            return jnp.sum(p.astype(jnp.float32)) * 1e-24

        stages[name] = (body, (feat, x1))

    # ---- decoder blocks at patch shapes -------------------------------
    dec_cfgs = {
        'deconv4': (256, 128, 256, (K, 28, 9, 256), (K, 56, 18, 128)),
        'deconv3': (256, 128, 128, (K, 56, 18, 256), (K, 112, 36, 128)),
        'deconv2': (128, 64, 64, (K, 112, 36, 128), (K, 225, 72, 64)),
        'deconv1': (64, 32, 32, (K, 225, 72, 64), (K, 450, 144, 32)),
    }
    for i, (name, (cin, cs, cout, xs, ss)) in enumerate(dec_cfgs.items()):
        blk, p, s = mk_block(cin, cs, cout, 100 + i)
        x = arr(xs)
        skip = arr(ss)

        def body(c, x, skip, blk=blk, p=p, s=s):
            y, _ = blk(p, s, (x * (1 + c * 1e-12)).astype(x.dtype),
                       skip=skip)
            return jnp.sum(y.astype(jnp.float32)) * 1e-24

        stages[name] = (body, (x, skip))

    # ---- packed tail (deconv0 + output0) ------------------------------
    deconv0, p0, s0 = mk_block(32, 0, 16, 7)
    out_conv = Conv2d(16, 1, 3, 1, 'kaiming_uniform', 'sigmoid', False)
    po, so = out_conv.init(jax.random.PRNGKey(8))
    po, so = cast_tree(po, dt), cast_tree(so, dt)
    x_tail = arr((K, 450, 144, 32))

    def body_tail(c, x):
        y = packed_decoder_tail(
            (x * (1 + c * 1e-12)).astype(x.dtype), deconv0, out_conv,
            {'deconv0': p0, 'output0': po},
            {'deconv0': s0, 'output0': so})
        return jnp.sum(y.astype(jnp.float32)) * 1e-24

    stages['tail'] = (body_tail, (x_tail,))

    # ---- scatter (per frame, K/B points), bf16 crops ------------------
    crops = arr((KPF, 900, 288))
    xs_sc = jax.device_put(jnp.asarray(
        rng.integers(144, 1600 + 144, KPF).astype(np.float32)))
    zs = jax.device_put(jnp.asarray(
        rng.random(KPF, np.float32) * 70 + 1))
    vd = jax.device_put(jnp.ones((KPF,), bool))

    def body_scatter(c, crops, xs_sc, zs, vd):
        d, r = scatter_quasi_dense_pallas(
            (crops * (1 + c * 1e-12)).astype(crops.dtype), xs_sc, zs, vd,
            900, 1600, (900, 288))
        return (jnp.sum(d) + jnp.sum(r)) * 1e-24

    stages['scatter'] = (body_scatter, (crops, xs_sc, zs, vd))

    names = args.stages or list(stages)
    total = 0.0
    for name in names:
        body, arrays = stages[name]
        t0 = time.perf_counter()
        ms = slope(body, *arrays)
        compile_s = time.perf_counter() - t0
        per_frame = ms / B if not name.startswith('scatter') else ms
        total += per_frame
        print(f'{name:10s} {ms:8.2f} ms ({per_frame:6.2f} ms/frame)  '
              f'[{compile_s:.0f}s]', flush=True)
    print(f'{"total":10s} {"":8s} ({total:6.2f} ms/frame RadarNet half)')


if __name__ == '__main__':
    main()

"""Bisect the FusionNet standalone serving cost (the bench.py headline)
into encoder and decoder shares at the headline batch, with the same
scan methodology as bench.py.

  enc  : twin ResNet encoders + per-scale weight_and_project fusion
  full : + MultiScaleDecoder + sigmoid depth mapping (== bench.py graph)

Usage: python tools/fnbisect.py [--batch 32] [--n_scan 2]
       [--cuts enc full]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=32)
    parser.add_argument('--n_scan', type=int, default=2)
    parser.add_argument('--cuts', nargs='*', default=['enc', 'full'])
    parser.add_argument('--s2d', type=int, default=0,
                        help='space-to-depth pack factor for the inputs '
                             '(0 = unpacked; 2 or 4 take the packed '
                             'stage-1 region, ops/packed_stage1.py)')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from rcfd_tpu.models import FusionNetModel
    from rcfd_tpu.nn.core import cast_tree
    from rcfd_tpu.nn.optimize import fold_batch_norm

    model = FusionNetModel(**bench.CONFIG)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    params, state = jax.jit(fold_batch_norm)(params, state)
    cdtype = jnp.bfloat16
    params_c = cast_tree(params, cdtype)
    state_c = cast_tree(state, cdtype)

    b = args.batch
    rng = np.random.default_rng(0)
    image, depth, response = bench._inputs(b, rng)
    input_depth_np = np.concatenate([depth, response], axis=-1)
    if args.s2d:
        from rcfd_tpu.ops.s2d_stem import pack_np
        image = pack_np(image, args.s2d)
        input_depth_np = pack_np(input_depth_np, args.s2d)
    image = jax.device_put(jnp.asarray(image))
    input_depth = jax.device_put(jnp.asarray(input_depth_np))

    def cut_enc(p, s, img, dep):
        latent, skips, _ = model.encoder(
            p['encoder'], s['encoder'], img.astype(cdtype),
            dep.astype(cdtype), training=False)
        acc = jnp.sum(latent.astype(jnp.float32))
        for sk in skips:
            acc = acc + jnp.sum(sk.astype(jnp.float32))
        return acc

    def cut_full(p, s, img, dep):
        out, _ = model.apply(p, s, img.astype(cdtype),
                             dep.astype(cdtype), training=False)
        return jnp.sum(out.astype(jnp.float32))

    # 'fullps': same graph with PerfConfig.packed_skip — the stage-1 skip
    # rides packed into deconv1 (trimmed per-phase kernels); meaningful
    # only with --s2d 2/4 (needs the packed stage-1 region)
    from rcfd_tpu.nn.perf import PerfConfig
    model_ps = FusionNetModel(**bench.CONFIG,
                              perf=PerfConfig.from_env(packed_skip=True))

    def cut_fullps(p, s, img, dep):
        out, _ = model_ps.apply(p, s, img.astype(cdtype),
                                dep.astype(cdtype), training=False)
        return jnp.sum(out.astype(jnp.float32))

    cuts = {'enc': cut_enc, 'full': cut_full, 'fullps': cut_fullps}
    print('backend:', jax.default_backend(), f'batch={b}', flush=True)
    prev = None
    for name in args.cuts:
        body = cuts[name]

        @jax.jit
        def loop(p, s, img, dep, body=body):
            # integer transport: decode once, carry the compute dtype
            img = img.astype(cdtype)

            def it(carry, _):
                acc = body(p, s, carry, dep)
                return (carry + acc.astype(carry.dtype) * 1e-30), ()
            img2, _ = lax.scan(it, img, None, length=args.n_scan)
            return img2[0, 0, 0, 0].astype(jnp.float32)

        t0 = time.perf_counter()
        try:
            float(loop(params_c, state_c, image, input_depth))
        except Exception as e:
            print(f'{name:5s} FAILED: {type(e).__name__}: {e}', flush=True)
            continue
        compile_s = time.perf_counter() - t0
        t = min((lambda s0: (float(loop(params_c, state_c, image,
                                        input_depth)),
                             time.perf_counter() - s0)[1])(
            time.perf_counter()) for _ in range(3))
        ms = t / (b * args.n_scan) * 1000
        delta = '' if prev is None else f'  (+{ms - prev:5.2f} vs prev)'
        prev = ms
        print(f'{name:5s} {ms:6.2f} ms/frame{delta}  '
              f'[compile {compile_s:.0f}s]', flush=True)


if __name__ == '__main__':
    main()

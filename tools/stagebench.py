"""Per-stage decoder timing for the canonical FusionNet on one chip.

Times each DecoderBlock (and the encoder / output conv) in isolation with
an on-device lax.scan whose carry is a scalar tap of the previous output,
so the compiler cannot hoist the body. Prints ms/invocation per stage.

Usage: python tools/stagebench.py [--dtype bfloat16] [--batch 1] [--n 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--dtype', default='bfloat16')
    parser.add_argument('--batch', type=int, default=1)
    parser.add_argument('--n', type=int, default=8,
                        help='scan length per measurement')
    parser.add_argument('--stages', nargs='*', default=None,
                        help='subset of stage names to run')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from rcfd_tpu.models import FusionNetModel
    from rcfd_tpu.nn.core import cast_tree
    from rcfd_tpu.nn.optimize import fold_batch_norm

    from bench import CONFIG, HEIGHT, WIDTH

    model = FusionNetModel(**CONFIG)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    params, state = jax.jit(fold_batch_norm)(params, state)
    cdtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32
    params = cast_tree(params, cdtype)
    state = cast_tree(state, cdtype)

    b = args.batch
    rng = np.random.default_rng(0)

    def arr(shape):
        return jnp.asarray(rng.random(shape, dtype=np.float32), dtype=cdtype)

    decoder = model.decoder
    dec_p, dec_s = params['decoder'], state['decoder']

    # canonical stage shapes at 900x1600 (batch b)
    h, w = HEIGHT, WIDTH
    sizes = [(h // 2, w // 2), (225, 400), (113, 200), (57, 100),
             (29, 50), (15, 25)]
    skip_ch = [32, 64, 128, 256, 256]

    stages = {}

    def add_block(name, x_shape, skip_shape, out_shape=None):
        blk = decoder.children[name]
        p, s = dec_p[name], dec_s[name]
        x0 = arr(x_shape)
        skip = arr(skip_shape) if skip_shape else None

        def body(c, _):
            xin = x0 * (1 + c * 1e-12)
            if skip is not None:
                y, _s = blk(p, s, xin, skip=skip)
            else:
                y, _s = blk(p, s, xin, shape=out_shape)
            return y[0, 0, 0, 0].astype(jnp.float32), ()

        stages[name] = body

    add_block('deconv5', (b, 15, 25, 256), (b, 29, 50, 256))
    add_block('deconv4', (b, 29, 50, 256), (b, 57, 100, 256))
    add_block('deconv3', (b, 57, 100, 256), (b, 113, 200, 128))
    add_block('deconv2', (b, 113, 200, 128), (b, 225, 400, 64))
    add_block('deconv1', (b, 225, 400, 64), (b, 450, 800, 32))
    add_block('deconv0', (b, 450, 800, 64), None, out_shape=(h, w))

    out_blk = decoder.children['output0']
    op, os_ = dec_p['output0'], dec_s['output0']
    x_out = arr((b, h, w, 32))

    def body_output0(c, _):
        y, _s = out_blk(op, os_, x_out * (1 + c * 1e-12))
        return y[0, 0, 0, 0].astype(jnp.float32), ()

    stages['output0'] = body_output0

    # encoder as one unit
    enc = model.encoder
    ep, es = params['encoder'], state['encoder']
    image = arr((b, h, w, 3))
    depth = arr((b, h, w, 2))

    def body_encoder(c, _):
        latent, skips, _s = enc(ep, es, image * (1 + c * 1e-12), depth)
        return latent[0, 0, 0, 0].astype(jnp.float32), ()

    stages['encoder'] = body_encoder

    names = args.stages or list(stages)
    results = {}
    # Two-point slope: the relay adds a fixed ~24 ms per dispatch, so a
    # single scan length conflates it with the stage cost. Timing n_lo and
    # n_hi iterations and taking the slope cancels the fixed overhead.
    n_lo, n_hi = args.n, args.n * 6
    for name in names:
        body = stages[name]

        def timed(n):
            @jax.jit
            def loop():
                c, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
                return c
            float(loop())  # compile + warm
            return min(
                (lambda t0: (float(loop()), time.perf_counter() - t0)[1])(
                    time.perf_counter())
                for _ in range(3))

        t_compile = time.perf_counter()
        t_lo = timed(n_lo)
        t_compile = time.perf_counter() - t_compile - t_lo * 3
        t_hi = timed(n_hi)
        ms = (t_hi - t_lo) / (n_hi - n_lo) * 1000
        results[name] = ms
        print(f'{name:10s} {ms:8.3f} ms  (compile {t_compile:.1f}s)',
              flush=True)

    total = sum(v for k, v in results.items() if k != 'encoder')
    print(f'{"dec total":10s} {total:8.3f} ms')


if __name__ == '__main__':
    main()

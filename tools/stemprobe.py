"""A/B probe: full-res C=3 stem conv vs an exact space-to-depth rewrite.

The round-5 roofline puts the two FusionNet stem convs (7x7/s2 over
900x1600 C=3 image and C=2 depth, docs/PERF.md round-5 table) at ~26%
of the graph's lane-padded byte accounting — IF XLA materializes the
C<128 NHWC inputs padded to 128 lanes (measured true for C=32 buffers,
docs/PERF.md round-2 "128-lane channel padding"; unverified for C=3).

The exact rewrite: 2x2 space-to-depth on the HOST (uint8, before
transport: (H,W,C) -> (H/2,W/2,4C)), then the 7x7/s2 conv becomes a
4x4/s1 conv with asymmetric pad (2,1) and parity-scattered weights:

    u = di - 3 in [-3,3];  2i + u = 2(i + q) + a,  a = u mod 2,
    q = (u - a)/2 in [-2,1]  ->  w4[q+2, r+2, (a,b,c), o] = w7[u+3, v+3, c, o]

Bit-exactness of the rewrite is asserted on CPU f32 before timing.
If the s2d form is materially faster on the chip, the stem is the next
PerfConfig gate; if not, the padded-input-read hypothesis is dead and
the roofline's lane-padded column must exempt model inputs.

Usage:
  python tools/stemprobe.py                  # real chip, both variants
  JAX_PLATFORMS=cpu python tools/stemprobe.py --check_only   # CI smoke
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


def s2d_weights(w7):
    """(7,7,C,O) stride-2 weights -> (4,4,4C,O) stride-1 weights over the
    2x2 space-to-depth input, pad (3,3) -> pad (2,1)."""
    k, _, c, o = w7.shape
    assert k == 7
    w4 = np.zeros((4, 4, 4 * c, o), w7.dtype)
    for u in range(-3, 4):
        a = u % 2
        q = (u - a) // 2
        for v in range(-3, 4):
            b = v % 2
            r = (v - b) // 2
            # s2d channel order: phase-major (a, b, c)
            w4[q + 2, r + 2, (a * 2 + b) * c:(a * 2 + b) * c + c, :] = \
                w7[u + 3, v + 3, :, :]
    return w4


def s2d_host(x):
    """(B,H,W,C) -> (B,H/2,W/2,4C), phase-major (a,b,c) channel order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # (B,h2,w2,a,b,c)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=32)
    parser.add_argument('--height', type=int, default=900)
    parser.add_argument('--width', type=int, default=1600)
    parser.add_argument('--cin', type=int, default=3)
    parser.add_argument('--cout', type=int, default=32)
    parser.add_argument('--n_scan', type=int, default=8)
    parser.add_argument('--check_only', action='store_true',
                        help='exactness check on CPU f32 only (CI smoke)')
    args = parser.parse_args()

    import jax
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    w7 = rng.standard_normal((7, 7, args.cin, args.cout)).astype(
        np.float32) * 0.05
    w4 = s2d_weights(w7)

    def conv_a(x, w):  # x (B,H,W,C) f32/bf16
        return lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def conv_b(xs, w):  # xs (B,H/2,W/2,4C)
        return lax.conv_general_dilated(
            xs, w, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    # ---- exactness: the rewrite must be bit-identical in f32 ------------
    xs_small = rng.integers(0, 256, (2, 64, 96, args.cin), np.uint8)
    xf = xs_small.astype(np.float32) / 255.0
    ya = np.asarray(jax.jit(conv_a)(xf, w7))
    yb = np.asarray(jax.jit(conv_b)(s2d_host(xf), w4))
    assert ya.shape == yb.shape, (ya.shape, yb.shape)
    err = np.abs(ya - yb).max()
    assert err < 1e-5, f's2d rewrite mismatch: max |d| = {err}'

    # in-graph s2d: same rewrite, but the 2x2 space-to-depth happens on
    # the DEVICE (reshape+transpose before the conv) — the form that
    # keeps the (B,H,W,C) input contract. If XLA fuses the transpose
    # into the conv's input read, the host-side win carries over.
    def conv_c(x, w):  # x (B,H,W,C), w (4,4,4C,O)
        b, h, ww, c = x.shape
        xs = x.reshape(b, h // 2, 2, ww // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, ww // 2,
                                                    4 * c)
        return conv_b(xs, w)

    yc = np.asarray(jax.jit(conv_c)(xf, w4))
    errc = np.abs(ya - yc).max()
    assert errc < 1e-5, f'in-graph s2d mismatch: max |d| = {errc}'
    if args.check_only:
        print(json.dumps({'probe': 'stem_s2d', 'check_only': True,
                          'max_abs_err': float(max(err, errc))}))
        return

    # ---- timed A/B on the device (scan + scalar fetch, bench discipline)
    x_u8 = rng.integers(0, 256, (args.batch, args.height, args.width,
                                 args.cin), np.uint8)
    xs_u8 = s2d_host(x_u8)

    def make_loop(conv, w, n):
        wc = jnp.asarray(w, jnp.bfloat16)

        @jax.jit
        def loop(x_u8):
            x = x_u8.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)

            def body(acc, _):
                y = conv(x + acc * jnp.bfloat16(1e-20), wc)
                return y[0, 0, 0, 0], ()

            acc, _ = lax.scan(body, jnp.bfloat16(0.0), None, length=n)
            return acc.astype(jnp.float32)

        return loop

    results = {}
    for name, conv, w, inp in [('stem_7x7s2_c%d' % args.cin, conv_a, w7,
                                x_u8),
                               ('stem_s2d_4x4s1_c%d' % (4 * args.cin),
                                conv_b, w4, xs_u8),
                               ('stem_s2d_ingraph_c%d' % args.cin,
                                conv_c, w4, x_u8)]:
        loop = make_loop(conv, w, args.n_scan)
        # device_put BEFORE timing: a numpy arg would re-ship the 138 MB
        # uint8 frame through the relay on every timed call (the same
        # discipline as tools/roofline.py)
        inp = jax.device_put(inp)
        v = float(loop(inp))  # compile + warm
        assert np.isfinite(v)

        def run():
            t0 = time.perf_counter()
            assert np.isfinite(float(loop(inp)))
            return time.perf_counter() - t0

        dt = min(run() for _ in range(3)) / args.n_scan
        results[name] = round(dt * 1e3, 3)
        print(f'[stemprobe] {name}: {dt * 1e3:.3f} ms/conv '
              f'(batch {args.batch})', file=sys.stderr)

    print(json.dumps({'probe': 'stem_s2d', 'batch': args.batch,
                      'shape': [args.height, args.width, args.cin],
                      'cout': args.cout,
                      'backend': jax.devices()[0].platform,
                      'ms_per_conv': results}))


if __name__ == '__main__':
    main()

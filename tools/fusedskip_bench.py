"""On-chip validation + timing for the pool2->deconv1 fusion
(ops/fused_skip.py) at the serving shapes.

Compares, at K points over the global 1/2-scale map:
  baseline : pool2 window gather (materialize) + skip conv + add
             (what the shipped split path does today)
  fused    : conv once on G + Pallas gather-add with corrections

Slope-method timing (args-not-constants, sum(abs) consumer, dtype-
preserving perturbation) per docs/PERF.md's harness rules.
"""
import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from rcfd_tpu.nn import functional as F
from rcfd_tpu.ops.fused_skip import LazyColumnWindows, fused_skip_conv_add

parser = argparse.ArgumentParser()
parser.add_argument('--k', type=int, default=64)
parser.add_argument('--n', type=int, default=1)
parser.add_argument('--ph', type=int, default=450)
parser.add_argument('--pw', type=int, default=144)
parser.add_argument('--c', type=int, default=32)
parser.add_argument('--wf', type=int, default=944)
parser.add_argument('--dtype', type=str, default='bfloat16')
args = parser.parse_args()

N, K, PH, PW, C, WF = args.n, args.k, args.ph, args.pw, args.c, args.wf
WG = WF + PW
dtype = jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32

rng = np.random.default_rng(0)
g = jnp.asarray(rng.random((N, PH, WG, C), np.float32), dtype)
# zero apron like the real G0
g = g.at[:, :, WF:, :].set(0)
starts = jnp.asarray(rng.integers(0, WF + 1, (N, K)).astype(np.int32))
w_skip = jnp.asarray(rng.random((3, 3, C, C), np.float32) * 0.05, dtype)
w_a = jnp.asarray(rng.random((3, 3, C, C), np.float32) * 0.05, dtype)
a = jnp.asarray(rng.random((N * K, PH, PW, C), np.float32), dtype)


def baseline(a, g, starts, w_skip):
    # what the shipped split path does: conv_a(y1) + conv_skip(windows);
    # `a` plays y1 (same shape/dtype, same conv cost)
    lazy = LazyColumnWindows(g, starts, PW)
    win = lazy.materialize()
    return F.conv2d(a, w_a, stride=1) + F.conv2d(win, w_skip, stride=1)


def fused(a, g, starts, w_skip):
    lazy = LazyColumnWindows(g, starts, PW)
    return fused_skip_conv_add(a, w_a, lazy, w_skip, use_pallas=True)


def fused_xla(a, g, starts, w_skip):
    lazy = LazyColumnWindows(g, starts, PW)
    return fused_skip_conv_add(a, w_a, lazy, w_skip, use_pallas=False)


print('backend:', jax.default_backend(), 'shapes: N={} K={} PH={} PW={} '
      'C={} WG={} {}'.format(N, K, PH, PW, C, WG, args.dtype), flush=True)

ref = jax.jit(baseline)(a, g, starts, w_skip)
out = jax.jit(fused)(a, g, starts, w_skip)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
print('pallas max abs err {:.3e} (scale {:.3e})'.format(err, scale),
      flush=True)


def slope(fn, n_lo=2, n_hi=10):
    def timed(n):
        @jax.jit
        def loop(a, g, starts, w_skip):
            def b(c, _):
                gp = (g * (1 + c * 1e-12)).astype(g.dtype)
                y = fn(a, gp, starts, w_skip)
                return jnp.sum(jnp.abs(y.astype(jnp.float32))) * 1e-24, ()
            c, _ = lax.scan(b, jnp.float32(0.0), None, length=n)
            return c
        float(loop(a, g, starts, w_skip))
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(a, g, starts, w_skip))
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        return best
    t_lo, t_hi = timed(n_lo), timed(n_hi)
    return (t_hi - t_lo) / (n_hi - n_lo) * 1000


if jax.default_backend() in ('tpu', 'axon'):
    print('baseline (gather + conv + add): {:7.2f} ms'.format(
        slope(baseline)), flush=True)
    print('fused pallas (convG + gather-add): {:7.2f} ms'.format(
        slope(fused)), flush=True)
    print('fused xla (unfused gather): {:7.2f} ms'.format(
        slope(fused_xla)), flush=True)

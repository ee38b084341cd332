"""Validate + time the pool2->deconv1 skip-conv fusion:
conv_b(window(G, s)) == window(conv_b(G), s) + boundary corrections.
Part 1 (CPU or TPU): numerical equivalence. Part 2: timing."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

def conv(x, w):
    # NHWC zero-pad 3x3
    return lax.conv_general_dilated(
        x[None] if x.ndim == 3 else x, w.astype(x.dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

rng = np.random.default_rng(0)
H, WG, C, PW, K = 450, 944, 32, 144, 64
dtype = jnp.bfloat16 if jax.default_backend() in ('tpu', 'axon') else jnp.float32

G = jnp.asarray(rng.random((H, WG, C), np.float32), dtype)
w = jnp.asarray(rng.random((3, 3, C, C), np.float32) * 0.05, dtype)
starts = jnp.asarray(rng.integers(1, WG - PW - 1, K).astype(np.int32))

def windows_then_conv(G, w, starts):
    def one(s):
        win = lax.dynamic_slice(G, (0, s, 0), (H, PW, C))
        return conv(win, w)[0]
    return jax.vmap(one)(starts)  # (K, H, PW, C)

def conv_then_windows(G, w, starts):
    Cg = conv(G, w)[0]  # (H, WG, C)
    # row-conv taps for the boundary corrections: (3, C, C) -> over rows
    w_l, w_r = w[:, 0], w[:, 2]  # (3, C, C)

    def row_conv(col, wk):
        # col: (H, C); wk: (3, C, C); zero row padding
        colp = jnp.pad(col, ((1, 1), (0, 0)))
        return sum(
            jnp.einsum('hc,cd->hd', colp[i:i + H], wk[i]) for i in range(3))

    def one(s):
        win = lax.dynamic_slice(Cg, (0, s, 0), (H, PW, C))
        left = jax.lax.dynamic_slice(G, (0, s - 1, 0), (H, 1, C))[:, 0]
        right = jax.lax.dynamic_slice(G, (0, s + PW, 0), (H, 1, C))[:, 0]
        win = win.at[:, 0].add(-row_conv(left, w_l).astype(win.dtype))
        win = win.at[:, PW - 1].add(-row_conv(right, w_r).astype(win.dtype))
        return win
    return jax.vmap(one)(starts)

ref = jax.jit(windows_then_conv)(G, w, starts)
out = jax.jit(conv_then_windows)(G, w, starts)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
print(f'max abs err {err:.3e} (scale {scale:.3e}) backend={jax.default_backend()}', flush=True)

def slope(fn, *arrays, n_lo=2, n_hi=10):
    def timed(n):
        @jax.jit
        def loop(*arrays):
            def b(c, _):
                G = (arrays[0] * (1 + c * 1e-12)).astype(arrays[0].dtype)
                y = fn(G, *arrays[1:])
                return jnp.sum(y.astype(jnp.float32)) * 1e-24, ()
            c, _ = lax.scan(b, jnp.float32(0.0), None, length=n)
            return c
        float(loop(*arrays))
        return min((lambda t0: (float(loop(*arrays)),
                                time.perf_counter() - t0)[1])(
            time.perf_counter()) for _ in range(3))
    t_lo, t_hi = timed(n_lo), timed(n_hi)
    return (t_hi - t_lo) / (n_hi - n_lo) * 1000

if jax.default_backend() in ('tpu', 'axon'):
    print(f'windows->conv: {slope(windows_then_conv, G, w, starts):7.2f} ms', flush=True)
    print(f'conv->windows: {slope(conv_then_windows, G, w, starts):7.2f} ms', flush=True)

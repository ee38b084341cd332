"""In-context reproduction of the pool2->deconv1 fusion regression.

Op-level, the fused formulation (conv once on G + window gather into the
add) measures 4.2 vs 9.0 ms; inside the full RadarNet-half graph it
REGRESSED (129.4 vs 124.5 ms/batch). This harness grows the context
around the op until the regression reproduces:

  stage 'op'    : windows/G as inputs (the op-level bench, sanity)
  stage 'pool'  : + the real G producer (roi_pool_column on the encoder
                  1/2-scale skip, 2-tap global max)
  stage 'block' : + the full DecoderBlock fast path (packed up-conv,
                  bias, leaky_relu) instead of a bare split conv
  stage 'tail'  : + the packed decoder tail consuming y2 (deconv0 +
                  output0), i.e. everything from encoder skip to
                  response logits

Each stage times eager (materialized windows) vs fused (LazyColumn-
Windows). Timing per docs/PERF.md harness rules (args-not-constants,
sum(abs) consumer, dtype-preserving perturbation, lax.scan slope).

Usage: python tools/fusectx_exp.py [--stages op pool block tail]
       [--hlo STAGE]  (dump optimized HLO op stats instead of timing)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--k', type=int, default=64)
    parser.add_argument('--b', type=int, default=4)
    parser.add_argument('--stages', nargs='*',
                        default=['op', 'pool', 'block', 'tail'])
    parser.add_argument('--hlo', default=None)
    parser.add_argument('--n_lo', type=int, default=2)
    parser.add_argument('--n_hi', type=int, default=10)
    args = parser.parse_args()

    from rcfd_tpu.nn import functional as F
    from rcfd_tpu.nn.core import cast_tree
    from rcfd_tpu.nn.layers import Conv2d, DecoderBlock
    from rcfd_tpu.nn.optimize import fold_batch_norm
    from rcfd_tpu.ops.fused_skip import LazyColumnWindows, \
        fused_skip_conv_add
    from rcfd_tpu.ops.packed_tail import packed_decoder_tail
    from rcfd_tpu.ops.roi_pool import roi_pool_column

    on_tpu = jax.default_backend() in ('tpu', 'axon')
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    B, K = args.b, args.k
    KPF = K // B
    PH, PW, C, CO = 450, 144, 32, 32
    rng = np.random.default_rng(0)

    def arr(shape, scale=1.0):
        return jax.device_put(jnp.asarray(
            rng.random(shape, dtype=np.float32) * scale, dt))

    feat = arr((B, 450, 944, 32))          # encoder 1/2-scale skip
    x1 = jax.device_put(jnp.asarray(
        rng.integers(0, 1600, (B, KPF)).astype(np.float32)))
    xdec = arr((K, 225, 72, 64))           # deconv1 input
    w_skip = arr((3, 3, C, CO), 0.05)
    w_a = arr((3, 3, C, CO), 0.05)
    y1 = arr((K, PH, PW, C))

    def pool(feat, x1, lazy):
        return roi_pool_column(
            feat, x1, box_width=288, box_y1=0, box_y2=900,
            spatial_scale=0.5, output_size=(450, 144),
            return_global=lazy)

    blk = DecoderBlock(64, 32, 32, use_batch_norm=True, deconv_type='up')
    bp, bs = blk.init(jax.random.PRNGKey(1))
    bp, bs = fold_batch_norm({'b': bp}, {'b': bs})
    bp, bs = cast_tree(bp['b'], dt), cast_tree(bs['b'], dt)

    deconv0 = DecoderBlock(32, 0, 16, use_batch_norm=True,
                           deconv_type='up')
    p0, s0 = deconv0.init(jax.random.PRNGKey(2))
    p0, s0 = fold_batch_norm({'b': p0}, {'b': s0})
    p0, s0 = cast_tree(p0['b'], dt), cast_tree(s0['b'], dt)
    out_conv = Conv2d(16, 1, 3, 1, 'kaiming_uniform', 'linear', False)
    po, so = out_conv.init(jax.random.PRNGKey(3))
    po, so = cast_tree(po, dt), cast_tree(so, dt)

    def consume(y):
        return jnp.sum(jnp.abs(y.astype(jnp.float32))) * 1e-24

    def perturb(c, x):
        return (x * (1 + c * 1e-12)).astype(x.dtype)

    stages = {}

    # ---- op: windows/G from the pool, bare split-conv add ------------
    def op_eager(c, feat, x1, y1):
        win = pool(perturb(c, feat), x1, False)
        y = F.conv2d(y1, w_a, stride=1) + F.conv2d(win, w_skip, stride=1)
        return consume(y)

    def op_fused(c, feat, x1, y1):
        lazy = pool(perturb(c, feat), x1, True)
        return consume(fused_skip_conv_add(y1, w_a, lazy, w_skip,
                                           use_pallas=False))

    stages['op'] = (op_eager, op_fused, (feat, x1, y1))
    stages['pool'] = stages['op']  # G producer already included above

    # ---- block: the real DecoderBlock fast path ----------------------
    def block_eager(c, feat, x1, xdec):
        win = pool(perturb(c, feat), x1, False)
        y, _ = blk(bp, bs, xdec, skip=win)
        return consume(y)

    def block_fused(c, feat, x1, xdec):
        lazy = pool(perturb(c, feat), x1, True)
        y, _ = blk(bp, bs, xdec, skip=lazy)
        return consume(y)

    stages['block'] = (block_eager, block_fused, (feat, x1, xdec))

    # ---- fusion-shape variants of the block stage ---------------------
    from rcfd_tpu.ops.fused_skip import _corrections
    from rcfd_tpu.ops.packed_tail import (_tile_bias, depth_to_space,
                                          effective_conv,
                                          pack_upconv_kernel)

    def _block_fused_variant(c, feat, x1, xdec, barrier, where_corr):
        lazy = pool(perturb(c, feat), x1, True)
        # inline DecoderBlock._fast_forward with a variant gather-add
        up_conv = blk.deconv.conv
        w_up, b_up = effective_conv(up_conv, bp['deconv']['conv'],
                                    bs['deconv']['conv'])
        w_mid, b_mid = effective_conv(blk.conv, bp['conv'], bs['conv'])
        y = F.conv2d(xdec, pack_upconv_kernel(w_up), stride=1)
        y = y + _tile_bias(b_up).astype(y.dtype)
        if up_conv.activation is not None:
            y = up_conv.activation(y)
        co = w_up.shape[-1]
        y1v = depth_to_space(y, co)
        wa, ws = w_mid[:, :, :co], w_mid[:, :, co:]

        a = F.conv2d(y1v, wa, stride=1)
        if barrier:
            a = lax.optimization_barrier(a)
        cgv = F.conv2d(lazy.g, ws.astype(lazy.g.dtype), stride=1)
        corr_l, corr_r = _corrections(lazy, ws)
        n, ph, wgv, cov = cgv.shape
        kk = lazy.starts.shape[1]
        pw = lazy.pooled_w

        def window_one(cg_n, s_k):
            return lax.dynamic_slice(cg_n, (0, s_k, 0), (ph, pw, cov))

        win = jax.vmap(lambda gn, sk: jax.vmap(
            lambda s_: window_one(gn, s_))(sk))(cgv, lazy.starts)
        win = win.reshape(n * kk, ph, pw, cov)
        yv = a + win.astype(a.dtype)
        if where_corr:
            col = lax.broadcasted_iota(jnp.int32, (1, 1, pw, 1), 2)
            corr = jnp.where(
                col == 0, corr_l.reshape(n * kk, ph, 1, cov),
                jnp.where(col == pw - 1,
                          corr_r.reshape(n * kk, ph, 1, cov), 0.0))
            yv = (yv.astype(jnp.float32) - corr).astype(yv.dtype)
        else:
            c0 = yv[:, :, 0, :].astype(jnp.float32) \
                - corr_l.reshape(n * kk, ph, -1)
            c1 = yv[:, :, pw - 1, :].astype(jnp.float32) \
                - corr_r.reshape(n * kk, ph, -1)
            yv = yv.at[:, :, 0, :].set(c0.astype(yv.dtype))
            yv = yv.at[:, :, pw - 1, :].set(c1.astype(yv.dtype))
        yv = yv + b_mid.astype(yv.dtype)
        if blk.conv.activation is not None:
            yv = blk.conv.activation(yv)
        return consume(yv)

    def block_fused_bar(c, feat, x1, xdec):
        return _block_fused_variant(c, feat, x1, xdec, True, False)

    def block_fused_where(c, feat, x1, xdec):
        return _block_fused_variant(c, feat, x1, xdec, False, True)

    def block_fused_barwhere(c, feat, x1, xdec):
        return _block_fused_variant(c, feat, x1, xdec, True, True)

    def block_fused_scan(c, feat, x1, xdec):
        """Gather+add+corrections hand-rolled as a scan over points:
        dynamic_slice from conv(G) in its native layout, one output
        write per point — no XLA gather, no layout transposes of G, no
        post-hoc .at[].set column fix-ups."""
        lazy = pool(perturb(c, feat), x1, True)
        up_conv = blk.deconv.conv
        w_up, b_up = effective_conv(up_conv, bp['deconv']['conv'],
                                    bs['deconv']['conv'])
        w_mid, b_mid = effective_conv(blk.conv, bp['conv'], bs['conv'])
        y = F.conv2d(xdec, pack_upconv_kernel(w_up), stride=1)
        y = y + _tile_bias(b_up).astype(y.dtype)
        if up_conv.activation is not None:
            y = up_conv.activation(y)
        co = w_up.shape[-1]
        y1v = depth_to_space(y, co)
        wa, ws = w_mid[:, :, :co], w_mid[:, :, co:]

        a = F.conv2d(y1v, wa, stride=1)
        cgv = F.conv2d(lazy.g, ws.astype(lazy.g.dtype), stride=1)
        corr_l, corr_r = _corrections(lazy, ws)
        n, ph, wgv, cov = cgv.shape
        kk = lazy.starts.shape[1]
        pw = lazy.pooled_w
        nk = n * kk
        starts_flat = lazy.starts.reshape(nk).astype(jnp.int32)
        nidx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), kk)
        cl = corr_l.reshape(nk, ph, cov)
        cr = corr_r.reshape(nk, ph, cov)

        def body(carry, inp):
            s, ni, a_k, cl_k, cr_k = inp
            win = lax.dynamic_slice(cgv, (ni, 0, s, 0), (1, ph, pw, cov))
            yk = a_k + win[0].astype(a_k.dtype)
            c0 = yk[:, :1, :].astype(jnp.float32) - cl_k[:, None]
            c1 = yk[:, pw - 1:, :].astype(jnp.float32) - cr_k[:, None]
            yk = jnp.concatenate(
                [c0.astype(yk.dtype), yk[:, 1:pw - 1, :],
                 c1.astype(yk.dtype)], axis=1)
            return carry, yk

        _, yv = lax.scan(body, 0,
                         (starts_flat, nidx, a, cl, cr))
        yv = yv + b_mid.astype(yv.dtype)
        if blk.conv.activation is not None:
            yv = blk.conv.activation(yv)
        return consume(yv)

    stages['blockscan'] = (block_eager, block_fused_scan,
                           (feat, x1, xdec))

    stages['blockbar'] = (block_eager, block_fused_bar, (feat, x1, xdec))
    stages['blockwhere'] = (block_eager, block_fused_where,
                            (feat, x1, xdec))
    stages['blockbarwhere'] = (block_eager, block_fused_barwhere,
                               (feat, x1, xdec))

    # ---- tail: + packed deconv0/output0 consumer ---------------------
    def tail_eager(c, feat, x1, xdec):
        win = pool(perturb(c, feat), x1, False)
        y, _ = blk(bp, bs, xdec, skip=win)
        z = packed_decoder_tail(y, deconv0, out_conv,
                                {'deconv0': p0, 'output0': po},
                                {'deconv0': s0, 'output0': so})
        return consume(z)

    def tail_fused(c, feat, x1, xdec):
        lazy = pool(perturb(c, feat), x1, True)
        y, _ = blk(bp, bs, xdec, skip=lazy)
        z = packed_decoder_tail(y, deconv0, out_conv,
                                {'deconv0': p0, 'output0': po},
                                {'deconv0': s0, 'output0': so})
        return consume(z)

    stages['tail'] = (tail_eager, tail_fused, (feat, x1, xdec))

    def slope(body, arrays):
        def timed(n):
            @jax.jit
            def loop(*arrays):
                def b(c, _):
                    return body(c, *arrays), ()
                c, _ = lax.scan(b, jnp.float32(0.0), None, length=n)
                return c
            float(loop(*arrays))
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(*arrays))
                t = time.perf_counter() - t0
                best = t if best is None else min(best, t)
            return best
        t_lo, t_hi = timed(args.n_lo), timed(args.n_hi)
        return (t_hi - t_lo) / (args.n_hi - args.n_lo) * 1000

    print('backend:', jax.default_backend(), 'B={} K={} {}'.format(
        B, K, dt.__name__), flush=True)

    if args.hlo:
        eager, fused, arrays = stages[args.hlo]
        for name, body in (('eager', eager), ('fused', fused)):
            def one(*arrays, body=body):
                return body(jnp.float32(0.0), *arrays)
            txt = jax.jit(one).lower(*arrays).compile().as_text()
            path = '/tmp/hlo_{}_{}.txt'.format(args.hlo, name)
            with open(path, 'w') as f:
                f.write(txt)
            n_fusion = txt.count('fusion(')
            big = [ln.strip()[:160] for ln in txt.splitlines()
                   if ('64,450,144' in ln or '4,450,94' in ln
                       or '4,451,10' in ln)
                   and '= ' in ln and 'parameter' not in ln]
            print('== {} -> {} ({} lines, {} fusions)'.format(
                name, path, len(txt.splitlines()), n_fusion), flush=True)
            for ln in big[:40]:
                print('   ', ln, flush=True)
        return

    for name in args.stages:
        if name == 'pool':
            continue
        eager, fused, arrays = stages[name]
        for variant, body in (('eager', eager), ('fused', fused)):
            t0 = time.perf_counter()
            ms = slope(body, arrays)
            print('{:6s} {:6s}: {:7.2f} ms  [compile {:.0f}s]'.format(
                name, variant, ms, time.perf_counter() - t0), flush=True)


if __name__ == '__main__':
    main()

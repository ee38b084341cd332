"""Bottleneck isolation for the Pallas gather-add (ops/fused_skip.py).

The double-buffered kernel measures 9.39 ms vs a ~4.1 ms padded-bandwidth
floor (XLA's fused formulation: 4.29). Variants isolate where the 2.3x
goes:

  full      : the shipped kernel (reference point)
  align16   : DMA offsets 16-aligned (bf16 HBM tiles are (16,128); the
              8-aligned offsets may force partial-tile reads), width
              pw+16, 16 predicated emit branches
  dmaonly   : same DMA schedule, emit writes the raw scratch slice at a
              fixed offset (no add/corrections/off-select) — DMA + block
              pipeline cost only (numerics wrong on purpose)
  nodma     : no window DMA at all; out = a * 2 — block-pipeline floor
  noselect  : full compute but fixed off=0 (no 8-branch select) — the
              select/lane-slice cost (numerics wrong on purpose)

Timing per docs/PERF.md harness rules (args-not-constants, sum(abs)
consumer, dtype-preserving perturbation, lax.scan slope).
"""
import argparse
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rcfd_tpu.nn import functional as F
from rcfd_tpu.ops.fused_skip import (LazyColumnWindows, _corrections,
                                     _fused_pallas, _pick_row_tile)

parser = argparse.ArgumentParser()
parser.add_argument('--k', type=int, default=64)
parser.add_argument('--n', type=int, default=1)
parser.add_argument('--ph', type=int, default=450)
parser.add_argument('--pw', type=int, default=144)
parser.add_argument('--c', type=int, default=32)
parser.add_argument('--wf', type=int, default=944)
parser.add_argument('--variants', nargs='+',
                    default=['full', 'align16', 'dmaonly', 'nodma',
                             'noselect'])
args = parser.parse_args()

N, K, PH, PW, C, WF = args.n, args.k, args.ph, args.pw, args.c, args.wf
WG = WF + PW
dtype = jnp.bfloat16

rng = np.random.default_rng(0)
g = jnp.asarray(rng.random((N, PH, WG, C), np.float32), dtype)
g = g.at[:, :, WF:, :].set(0)
starts = jnp.asarray(rng.integers(0, WF + 1, (N, K)).astype(np.int32))
w_skip = jnp.asarray(rng.random((3, 3, C, C), np.float32) * 0.05, dtype)
a = jnp.asarray(rng.random((N * K, PH, PW, C), np.float32), dtype)


def variant_kernel(a, cg, lazy, corr_l, corr_r, mode='full', align=8,
                   th=None):
    n, ph, wg, co = cg.shape
    k = lazy.starts.shape[1]
    pw = lazy.pooled_w
    nk = n * k
    th = th or _pick_row_tile(ph)
    n_row_tiles = ph // th

    starts_flat = lazy.starts.reshape(nk).astype(jnp.int32)
    corr_l = corr_l.reshape(nk, ph, 1, co)
    corr_r = corr_r.reshape(nk, ph, 1, co)

    co_pad = -(-co // 128) * 128
    cg = jnp.pad(cg, ((0, 0), (0, 0), (0, align), (0, co_pad - co)))

    def kernel(starts_ref, a_ref, cl_ref, cr_ref, cg_ref, out_ref,
               win_scratch, sem):
        ki = pl.program_id(0)
        ht = pl.program_id(1)
        s = starts_ref[ki]
        off = s - (s // align) * align

        def get_dma(slot, ki_, ht_):
            s_ = starts_ref[ki_]
            sa_ = (s_ // align) * align
            return pltpu.make_async_copy(
                cg_ref.at[ki_ // k, pl.ds(ht_ * th, th),
                          pl.ds(sa_, pw + align), :],
                win_scratch.at[slot], sem.at[slot])

        step = ki * n_row_tiles + ht
        slot = jax.lax.rem(step, 2)

        if mode != 'nodma':
            @pl.when(step == 0)
            def _():
                get_dma(slot, ki, ht).start()

            wrap = ht + 1 == n_row_tiles
            ki_n = jnp.minimum(jnp.where(wrap, ki + 1, ki), nk - 1)
            ht_n = jnp.where(wrap, 0, ht + 1)

            @pl.when(step + 1 < nk * n_row_tiles)
            def _():
                get_dma(1 - slot, ki_n, ht_n).start()

            get_dma(slot, ki, ht).wait()

        if mode == 'nodma':
            out_ref[0] = a_ref[0] * 2
            return
        if mode == 'dmaonly':
            out_ref[0] = win_scratch[slot, :, 0:pw, :co].astype(a_ref.dtype)
            return

        def emit(o):
            @pl.when(off == o)
            def _():
                y = a_ref[0] + \
                    win_scratch[slot, :, o:o + pw, :co].astype(a_ref.dtype)
                c0 = y[:, :1, :].astype(jnp.float32) - cl_ref[0]
                c1 = y[:, pw - 1:, :].astype(jnp.float32) - cr_ref[0]
                out_ref[0] = jnp.concatenate(
                    [c0.astype(y.dtype), y[:, 1:pw - 1, :],
                     c1.astype(y.dtype)], axis=1)

        if mode == 'noselect':
            emit_branches = 1
        else:
            emit_branches = align
        for o in range(emit_branches):
            emit(o)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nk, n_row_tiles),
        in_specs=[
            pl.BlockSpec((1, th, pw, co), lambda ki, ht, st: (ki, ht, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, 1, co),
                         lambda ki, ht, st: (ki, ht, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, 1, co),
                         lambda ki, ht, st: (ki, ht, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, th, pw, co),
                               lambda ki, ht, st: (ki, ht, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, th, pw + align, co_pad), cg.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nk, ph, pw, co), a.dtype),
    )(starts_flat, a, corr_l, corr_r, cg)


def make_fn(mode):
    align = 16 if mode == 'align16' else 8
    kmode = 'full' if mode == 'align16' else mode
    # the wider 16-aligned scratch overflows the 16 MB VMEM at th=50
    th = 45 if mode == 'align16' else None

    def fn(a, g, starts, w_skip):
        lazy = LazyColumnWindows(g, starts, PW)
        cg = F.conv2d(g, w_skip, stride=1)
        corr_l, corr_r = _corrections(lazy, w_skip)
        return variant_kernel(a, cg, lazy, corr_l, corr_r,
                              mode=kmode, align=align, th=th)
    return fn


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


print('backend:', jax.default_backend(), flush=True)

if 'align16' in args.variants:
    # numerics check for the 16-aligned variant (the only new math)
    def baseline(a, g, starts, w_skip):
        lazy = LazyColumnWindows(g, starts, PW)
        return a + F.conv2d(lazy.materialize(), w_skip, stride=1)
    ref = jax.jit(baseline)(a, g, starts, w_skip)
    out = jax.jit(make_fn('align16'))(a, g, starts, w_skip)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print('align16 max abs err {:.3e}'.format(err), flush=True)

for mode in args.variants:
    print('{:9s}: {:7.2f} ms'.format(mode, slope(make_fn(mode))),
          flush=True)

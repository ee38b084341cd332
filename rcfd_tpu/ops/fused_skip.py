"""Pool2 -> deconv1 skip-conv fusion (the round-3 pipeline lever).

In the constant-bin ROI-pool fast path (ops/roi_pool.py:119-158) every
pooled 1/2-scale skip window is a CONTIGUOUS column slice of one global
2-tap-max map G, so deconv1's split skip conv satisfies

    conv3x3(window(G, s)) == window(conv3x3(G), s) + boundary corrections

at every interior column; only each window's first/last column differs
(window zero-pad vs global content), correctable exactly by subtracting a
one-column row-conv tap: W[:, 0] against G[:, s-1] at column 0 and
W[:, 2] against G[:, s+pw] at column pw-1 (docs/PERF.md round-3 lever 1).

Computing conv_b ONCE on G (~1/8 of the per-window FLOPs) and gathering
windows of the RESULT directly into the add eliminates both the pooled
skip materialization (pool2's window write, ~1 GB/frame lane-padded) and
conv_b's read of it. The fast path is the plain-XLA formulation
(_fused_xla, 4.2 ms vs the 9.0 ms split-conv baseline at serving
shapes): XLA fuses the vmapped dynamic-slice gather into the consumer
add at op level. A Pallas gather-add kernel (_fused_pallas) is kept as
an opt-in correctness artifact only — every measured variant (block
pipeline, double-buffered DMA, fully manual streaming) trails XLA on
program/DMA overheads (docs/PERF.md round-3 negative results).
Boundary corrections are computed in f32 (bf16 cancellation leaves
~eps-relative error, measured) — they are K one-column tensors,
negligible traffic.

Replaces (faster, tolerance-level like RCFD_FAST_DECODER):
reference torchvision.ops.roi_pool + conv composition,
/root/reference/src/networks.py:1232-1247 and :1337-1657.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class LazyColumnWindows:
    """A deferred constant-bin column ROI pool: the global 2-tap-max map
    plus per-box window starts, materializable to the standard pooled
    windows at any time.

    g : (N, ph, Wg, C) finite global map (right apron of pooled_w zeros)
    starts : (N, K) int32 window starts in [0, Wg - pooled_w]
    """

    def __init__(self, g, starts, pooled_w: int):
        self.g = g
        self.starts = starts
        self.pooled_w = pooled_w

    @property
    def shape(self):
        n, ph, _, c = self.g.shape
        k = self.starts.shape[1]
        return (n * k, ph, self.pooled_w, c)

    @property
    def dtype(self):
        return self.g.dtype

    def materialize(self):
        """The standard pooled windows (N*K, ph, pw, C) — identical to
        the eager constant-bin fast path."""
        n, ph, _, c = self.g.shape
        pw = self.pooled_w

        def window_one(g_n, s_k):
            return jax.lax.dynamic_slice(g_n, (0, s_k, 0), (ph, pw, c))

        windows = jax.vmap(
            lambda gn, sk: jax.vmap(lambda s_: window_one(gn, s_))(sk)
        )(self.g, self.starts)
        return windows.reshape(n * self.starts.shape[1], ph, pw, c)

    def tree_flatten(self):
        return (self.g, self.starts), (self.pooled_w,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0])


def _row_conv_columns(cols, wk):
    """3-tap row conv of column stacks, f32: cols (N, K, ph, C),
    wk (3, C, Co) -> (N, K, ph, Co). Zero row padding."""
    cols = cols.astype(jnp.float32)
    wk = wk.astype(jnp.float32)
    ph = cols.shape[2]
    colsp = jnp.pad(cols, ((0, 0), (0, 0), (1, 1), (0, 0)))
    out = None
    for i in range(3):
        t = jnp.einsum('nkhc,cd->nkhd', colsp[:, :, i:i + ph], wk[i])
        out = t if out is None else out + t
    return out


def _corrections(lazy: LazyColumnWindows, w_skip):
    """The two f32 correction columns per window: (corr_left, corr_right)
    each (N, K, ph, Co). w_skip: (3, 3, C, Co) HWIO."""
    g, starts, pw = lazy.g, lazy.starts, lazy.pooled_w
    n, ph, wg, c = g.shape

    def take_col(g_n, idx):
        return jax.lax.dynamic_slice(g_n, (0, idx, 0), (ph, 1, c))[:, 0]

    gather = jax.vmap(lambda gn, ii: jax.vmap(
        lambda i_: take_col(gn, i_))(ii))

    left_idx = jnp.maximum(starts - 1, 0)
    left_valid = (starts >= 1)[..., None, None]
    g_left = gather(g, left_idx) * left_valid  # (N, K, ph, C)

    right_idx = jnp.minimum(starts + pw, wg - 1)
    right_valid = (starts + pw <= wg - 1)[..., None, None]
    g_right = gather(g, right_idx) * right_valid

    corr_l = _row_conv_columns(g_left, w_skip[:, 0])
    corr_r = _row_conv_columns(g_right, w_skip[:, 2])
    return corr_l, corr_r


def _fused_xla(a, cg, lazy: LazyColumnWindows, corr_l, corr_r,
               gather: str = 'take'):
    """Composition in plain XLA: window-gather conv(G) into the add.

    gather='take' (default): per-column gather — the round-3 take-gather
    lesson (ops/roi_pool.py window gather, −3.2 ms/frame end-to-end) was
    that XLA's gather emitter writes the consumer's layout directly,
    where the vmapped dynamic_slice form lowers to a while-loop of
    dynamic-update-slices plus a relayout copy in the full serving graph.
    The round-3 'neutral-to-slower in context' verdict on this fusion was
    measured on the 'slice' form only. gather='slice' keeps that form for
    comparison."""
    n, ph, wg, co = cg.shape
    k = lazy.starts.shape[1]
    pw = lazy.pooled_w

    if gather == 'take':
        cols = lazy.starts[:, :, None] + jnp.arange(pw)      # (N, K, pw)
        win = jax.vmap(lambda g_n, c_n: jnp.take(g_n, c_n, axis=1))(
            cg, cols)                                        # (N, ph, K, pw, Co)
        win = jnp.moveaxis(win, 1, 2)                        # (N, K, ph, pw, Co)
    else:
        def window_one(cg_n, s_k):
            return jax.lax.dynamic_slice(cg_n, (0, s_k, 0), (ph, pw, co))

        win = jax.vmap(lambda gn, sk: jax.vmap(
            lambda s_: window_one(gn, s_))(sk))(cg, lazy.starts)
    win = win.reshape(n * k, ph, pw, co)
    y = a + win.astype(a.dtype)
    c0 = y[:, :, 0, :].astype(jnp.float32) - corr_l.reshape(n * k, ph, -1)
    c1 = y[:, :, pw - 1, :].astype(jnp.float32) \
        - corr_r.reshape(n * k, ph, -1)
    y = y.at[:, :, 0, :].set(c0.astype(y.dtype))
    y = y.at[:, :, pw - 1, :].set(c1.astype(y.dtype))
    return y


def _pick_row_tile(ph: int) -> int:
    """Largest divisor of ph that keeps a (TH, pw, C) block comfortably
    in VMEM; row counts need no tiling alignment (rows are the outer
    dim — the (sublane, lane) tile covers (pw, C))."""
    for th in (64, 50, 45, 32, 25, 16, 10, 9, 8, 5, 3, 2):
        if ph % th == 0:
            return th
    return ph


def _fused_pallas(a, cg, lazy: LazyColumnWindows, corr_l, corr_r,
                  interpret: bool = False):
    """The gather-add kernel: grid (N*K, ph/TH); each program DMAs its
    conv(G) window tile HBM->VMEM and adds it onto the block-mapped
    conv_a term, fixing the two boundary columns in f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, ph, wg, co = cg.shape
    k = lazy.starts.shape[1]
    pw = lazy.pooled_w
    nk = n * k
    th = _pick_row_tile(ph)
    n_row_tiles = ph // th

    starts_flat = lazy.starts.reshape(nk).astype(jnp.int32)
    # corrections as (nk, ph, 1, co): the row tile lands in an outer dim
    # (Mosaic constrains only the LAST TWO dims of a block)
    corr_l = corr_l.reshape(nk, ph, 1, co)
    corr_r = corr_r.reshape(nk, ph, 1, co)

    # Mosaic requires the sublane-tiled W offset of the HBM slice to be
    # 8-divisible: DMA an 8-aligned (pw + 8)-wide window and select the
    # true sub-window in VMEM via 8 predicated static slices. The extra
    # 8 columns need a widened right apron on cg. The lane (channel) dim
    # must also be DMA-sliced at full 128-lane granularity — the HBM
    # memref is lane-padded to 128 regardless, so padding the logical
    # channels to 128 costs one small copy of the global map and makes
    # the window DMA legal (traffic is identical: padded bytes move
    # either way).
    co_pad = -(-co // 128) * 128
    cg = jnp.pad(cg, ((0, 0), (0, 0), (0, 8), (0, co_pad - co)))

    def kernel(starts_ref, a_ref, cl_ref, cr_ref, cg_ref, out_ref,
               win_scratch, sem):
        ki = pl.program_id(0)
        ni = ki // k
        s = starts_ref[ki]
        s8 = (s // 8) * 8
        off = s - s8
        ht = pl.program_id(1)
        dma = pltpu.make_async_copy(
            cg_ref.at[ni, pl.ds(ht * th, th), pl.ds(s8, pw + 8), :],
            win_scratch, sem)
        dma.start()
        dma.wait()

        def emit(o):
            @pl.when(off == o)
            def _():
                y = a_ref[0] + \
                    win_scratch[:, o:o + pw, :co].astype(a_ref.dtype)
                c0 = y[:, :1, :].astype(jnp.float32) - cl_ref[0]
                c1 = y[:, pw - 1:, :].astype(jnp.float32) - cr_ref[0]
                # .at[].set lowers to an unsupported scatter in Mosaic;
                # rebuild the block by concatenation (static slices)
                out_ref[0] = jnp.concatenate(
                    [c0.astype(y.dtype), y[:, 1:pw - 1, :],
                     c1.astype(y.dtype)], axis=1)

        for o in range(8):
            emit(o)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nk, n_row_tiles),
        in_specs=[
            pl.BlockSpec((1, th, pw, co), lambda ki, ht, st: (ki, ht, 0, 0),
                         memory_space=pltpu.VMEM),          # a
            pl.BlockSpec((1, th, 1, co),
                         lambda ki, ht, st: (ki, ht, 0, 0),
                         memory_space=pltpu.VMEM),          # corr_l
            pl.BlockSpec((1, th, 1, co),
                         lambda ki, ht, st: (ki, ht, 0, 0),
                         memory_space=pltpu.VMEM),          # corr_r
            pl.BlockSpec(memory_space=pl.ANY),              # cg (HBM)
        ],
        out_specs=pl.BlockSpec((1, th, pw, co),
                               lambda ki, ht, st: (ki, ht, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th, pw + 8, co_pad), cg.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nk, ph, pw, co), a.dtype),
        interpret=interpret,
    )(starts_flat, a, corr_l, corr_r, cg)


def fused_skip_conv_add(y1, w_a, lazy: LazyColumnWindows, w_skip,
                        use_pallas: bool = None, interpret: bool = False,
                        gather: str = 'take'):
    """conv2d(y1, w_a) + conv2d(lazy.materialize(), w_skip) without
    materializing the windows: conv once on the global map, gather-add
    windows of the result with exact one-column boundary corrections
    (f32).

    Owns the conv_a term too (not just the skip half) so the whole
    split-conv replacement lives behind one call and future kernel
    variants can choose the conv_a output layout (a manual-DMA Pallas
    attempt needed 128-lane operands via weight padding; it measured
    slower and was dropped — docs/PERF.md round-3 negative results).

    Arg(s):
        y1 : (N*K, ph, pw, Ci) the upsampled per-point features
        w_a : (3, 3, Ci, Co) HWIO conv kernel for the y1 term (no bias)
        lazy : LazyColumnWindows for the 1/2-scale skip
        w_skip : (3, 3, C, Co) HWIO skip conv kernel (no bias)
    Returns:
        (N*K, ph, pw, Co), y1.dtype
    """
    from ..nn import functional as F

    # At pooled_w == 1 the left/right boundary columns coincide and the
    # second correction .at[].set would overwrite the first (in both the
    # XLA and Pallas formulations) — a silently wrong single-column
    # result. Canonical skip widths are >= 4; refuse exotic ones.
    assert lazy.pooled_w >= 2, (
        f'fused_skip_conv_add requires pooled_w >= 2, got {lazy.pooled_w}; '
        'use lazy.materialize() + a split conv instead')

    if use_pallas is None:
        # measured on v5e (tools/fusedskip_bench.py, K=64 serving
        # shapes, bf16): baseline split conv + materialized windows
        # 9.0 ms, XLA fused (conv-on-G + gather into the add) 4.2 ms,
        # best Pallas variant 9.36 ms (block-pipeline/DMA overheads —
        # docs/PERF.md round-3 negative results). XLA is the fast path;
        # the kernel stays as an opt-in correctness artifact
        # (PerfConfig.fused_pool2_pallas, threaded by DecoderBlock).
        use_pallas = False

    co = w_a.shape[-1]
    a = F.conv2d(y1, w_a.astype(y1.dtype), stride=1)
    cg = F.conv2d(lazy.g, w_skip.astype(lazy.g.dtype), stride=1)
    corr_l, corr_r = _corrections(lazy, w_skip)
    if use_pallas:
        out = _fused_pallas(a, cg, lazy, corr_l, corr_r,
                            interpret=interpret)
        return out[..., :co]
    return _fused_xla(a, cg, lazy, corr_l, corr_r, gather=gather)

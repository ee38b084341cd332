"""Pallas TPU kernel for the quasi-dense scatter/argmax composite.

XLA lowers the scatter-max/scatter-min pair in ops/scatter.py to serialized
scatter loops on TPU. This kernel instead walks the point axis as the grid
dimension and accumulates the full response map in VMEM:

  - grid = (K,): one step per radar point; the output block is the whole
    (padded) map, revisited every step, so it lives in VMEM across the
    accumulation (the standard revisited-block pattern).
  - each step reads that point's (ph, pw) response crop (BlockSpec indexed
    by the grid) and its column offset / validity from scalar-prefetched
    SMEM, then max-merges into out[:, x : x + pw] via a dynamic slice.
  - value and winner index are packed into ONE int32 per pixel:
    (response quantized to 14 bits) << IDX_BITS | (MAX_POINTS - point
    index), so a plain elementwise max implements the lexicographic
    (value, first-index-wins) order. The 14-bit quantization is exactly the response PNG codec
    (save_response x2^14), i.e. the precision every downstream consumer
    sees anyway; ties inside one quantization step resolve to the first
    index like torch.max.

The output is padded by pw columns on each side so the dynamic-slice store
is always in bounds; the caller strips the apron and gathers z by the
unpacked winner index.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Q_BITS = 14
Q_SCALE = float(2 ** Q_BITS)
# 14 value bits + 16 index bits = 30 < 31, so the packed lexicographic max
# stays positive int32; K up to 65535 covers any accumulated-radar frame
IDX_BITS = 16
MAX_POINTS = (1 << IDX_BITS) - 1


def _kernel(x_ref, valid_ref, crop_ref, out_ref, *, threshold: float,
            pw: int):
    """Accumulate one point. Layout is TRANSPOSED — crops (1, pw, ph), out
    (w_padded, ph) — so the dynamic store offset is on the SUBLANE dim
    (Mosaic rejects unaligned dynamic LANE offsets). Mosaic further needs
    the sublane offset provably 8-aligned: store at x & ~7 with the crop
    rolled down by x & 7 inside an (pw + 8)-row window."""
    import jax
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    # crops may arrive bf16 (serving path) — halves the dominant HBM read;
    # the f32 upcast is exact so the 14-bit quantization is unchanged
    crop = crop_ref[0].astype(jnp.float32)  # (pw, ph)
    vals = jnp.where(crop < threshold, 0.0, crop)
    q = jnp.minimum(vals * Q_SCALE, Q_SCALE).astype(jnp.int32)
    packed = (q << IDX_BITS) | (MAX_POINTS - k)
    # invalid (padding) points must not win anywhere
    is_valid = valid_ref[k] > 0
    packed = jnp.where(is_valid, packed, 0)

    x = x_ref[k]
    x_aligned = pl.multiple_of((x // 8) * 8, 8)
    r = x - x_aligned  # in [0, 8)

    base = jnp.concatenate(
        [packed, jnp.zeros((8, packed.shape[1]), jnp.int32)], axis=0)
    # shift=0 must be the identity: jnp.roll(x, 0) lowers to a 0-size
    # slice that Mosaic rejects
    branches = [lambda b: b] + [
        functools.partial(jnp.roll, shift=s, axis=0) for s in range(1, 8)]
    shifted = jax.lax.switch(r, branches, base)

    window = pw + 8
    current = out_ref[pl.ds(x_aligned, window), :]
    out_ref[pl.ds(x_aligned, window), :] = jnp.maximum(current, shifted)


def scatter_quasi_dense_pallas(response_crops, x_positions, z_values, valid,
                               image_height: int, image_width: int,
                               patch_size: Tuple[int, int],
                               threshold: float = 0.5,
                               legacy_depth_semantics: bool = True,
                               interpret: bool = False):
    """Drop-in Pallas variant of ops.scatter.scatter_quasi_dense.

    Same contract; the response map is quantized to the PNG codec's 14-bit
    precision (see module docstring). Requires K <= MAX_POINTS (65535).
    """
    import jax.experimental.pallas as pl

    k, ph, pw = response_crops.shape
    assert k <= MAX_POINTS, f'pallas scatter supports K<={MAX_POINTS}, got {k}'
    pad = pw // 2
    h, w = image_height, image_width
    crop_top = h - ph
    # apron so the (8-aligned, pw+8-wide) dynamic stores stay in bounds
    w_padded = w + 2 * pw + 8

    # crop pixel (k, :, j) lands at unpadded column x_k - 2*pad + j;
    # shift by +pw for the left apron
    x_start = (x_positions.astype(jnp.int32) - 2 * pad + pw)
    x_start = jnp.clip(x_start, 0, w_padded - pw - 8)
    valid_i32 = valid.astype(jnp.int32)

    crops_t = jnp.transpose(response_crops, (0, 2, 1))  # (K, pw, ph)
    packed = _call(crops_t, x_start, valid_i32, ph, pw, w_padded,
                   threshold, interpret)

    # back to (ph, w): strip the apron and transpose
    packed = jnp.transpose(packed[pw:pw + w, :], (1, 0))
    response_q = (packed >> IDX_BITS).astype(jnp.float32) / Q_SCALE
    # empty pixels (packed == 0) decode to MAX_POINTS; clamp to the k slot
    winner = jnp.minimum(MAX_POINTS - (packed & MAX_POINTS), k)

    if legacy_depth_semantics:
        from .scatter import _legacy_rewrite
        depth_rows = _legacy_rewrite(winner, response_q, z_values, valid, k)
    else:
        z_ext = jnp.concatenate([
            z_values.astype(jnp.float32), jnp.zeros((1,), jnp.float32)])
        depth_rows = jnp.where(response_q > 0, z_ext[winner], 0.0)

    response_map = jnp.zeros((h, w), jnp.float32).at[crop_top:].set(response_q)
    depth_map = jnp.zeros((h, w), jnp.float32).at[crop_top:].set(depth_rows)
    return depth_map, response_map


def _call(response_crops, x_start, valid_i32, ph, pw, w_padded, threshold,
          interpret):
    import jax.experimental.pallas as pl
    k = response_crops.shape[0]
    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(k,),
            in_specs=[
                pl.BlockSpec((1, pw, ph), lambda i, x, v: (i, 0, 0),
                             memory_space=vmem),
            ],
            out_specs=pl.BlockSpec((w_padded, ph), lambda i, x, v: (0, 0),
                                   memory_space=vmem),
        )
        return pl.pallas_call(
            functools.partial(_kernel, threshold=threshold, pw=pw),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((w_padded, ph), jnp.int32),
            interpret=interpret,
        )(x_start, valid_i32, response_crops)
    except ImportError:
        # pure-pl fallback (interpret mode on CPU)
        grid_spec = pl.GridSpec(
            grid=(k,),
            in_specs=[
                pl.BlockSpec((k,), lambda i: (0,)),
                pl.BlockSpec((k,), lambda i: (0,)),
                pl.BlockSpec((1, pw, ph), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((w_padded, ph), lambda i: (0, 0)),
        )
        return pl.pallas_call(
            functools.partial(_kernel, threshold=threshold, pw=pw),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((w_padded, ph), jnp.int32),
            interpret=interpret,
        )(x_start, valid_i32, response_crops)

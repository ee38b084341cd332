"""Pallas TPU kernel: batched contiguous column-window crop.

The ROI column pool (ops/roi_pool.py) needs, per radar point k, the
contiguous window rows[:, start_k : start_k + win, :] of the row-pooled
feature map. Expressed as a vmapped lax.dynamic_slice, XLA lowers this to
a serialized element gather (~10-16 ms for the 1/2-scale skip at K=128 on
v5e) even though it is logically K block DMAs.

This kernel walks grid (ph_tiles, K) with K innermost: the input block
(TILE_H, W, C) is revisited across all K steps (one HBM fetch per row
tile), and each step emits one (TILE_H, win, C) window via an 8-aligned
dynamic sublane slice plus a roll (Mosaic requires provably 8-aligned
dynamic sublane offsets — same pattern as ops/scatter_pallas.py).

The caller pre-pads rows on the right so every slice is in bounds and
pre-clips starts to >= 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_H = 8


def _kernel(starts_ref, in_ref, out_ref, *, win: int):
    import jax.experimental.pallas as pl

    k = pl.program_id(1)
    start = starts_ref[k]
    aligned = pl.multiple_of((start // TILE_H) * TILE_H, TILE_H)
    r = start - aligned  # in [0, 8)

    block = in_ref[:, pl.ds(aligned, win + TILE_H), :]
    # roll -r on the window axis: shifted[j] = block[j + r] for j < win
    branches = [lambda b: b] + [
        functools.partial(jnp.roll, shift=-s, axis=1) for s in range(1, 8)]
    shifted = jax.lax.switch(r, branches, block)
    out_ref[0] = shifted[:, :win, :]


def batch_column_crop(rows, starts, win: int, interpret: bool = False):
    """Crop K contiguous column windows from a row-pooled feature map.

    Arg(s):
        rows : (N_H, W, C) feature rows (any float dtype)
        starts : (K,) int32 window starts, each in [0, W] (clipped by the
            caller); reads past W return zeros (right padding)
        win : static window width
    Returns:
        (K, N_H, win, C) windows, windows[k] == rows[:, s_k : s_k + win]
        zero-padded past W.
    """
    import jax.experimental.pallas as pl

    ph, w, c = rows.shape
    k = starts.shape[0]
    ph_pad = (-ph) % TILE_H
    w_in = w + win + TILE_H  # slack so aligned slice + roll stays in bounds
    rows_p = jnp.pad(rows, ((0, ph_pad), (0, w_in - w), (0, 0)))
    n_tiles = (ph + ph_pad) // TILE_H
    starts = jnp.clip(starts.astype(jnp.int32), 0, w)

    try:
        from jax.experimental.pallas import tpu as pltpu

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles, k),
            in_specs=[
                pl.BlockSpec((TILE_H, w_in, c), lambda i, p, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, TILE_H, win, c), lambda i, p, s: (p, i, 0, 0),
                memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            functools.partial(_kernel, win=win),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (k, ph + ph_pad, win, c), rows.dtype),
            interpret=interpret,
        )(starts, rows_p)
    except ImportError:
        grid_spec = pl.GridSpec(
            grid=(n_tiles, k),
            in_specs=[
                pl.BlockSpec((k,), lambda i, p: (0,)),
                pl.BlockSpec((TILE_H, w_in, c), lambda i, p: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, TILE_H, win, c),
                                   lambda i, p: (p, i, 0, 0)),
        )
        out = pl.pallas_call(
            functools.partial(_kernel, win=win),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (k, ph + ph_pad, win, c), rows.dtype),
            interpret=interpret,
        )(starts, rows_p)
    return out[:, :ph]

"""Space-to-depth stem: exact rewrite of the 7x7/stride-2 stem conv over
a 2x2-packed input.

The full-res C<=3 stem is the top padded-traffic site of both serving
graphs (docs/PERF.md round-5 roofline): a (B, H, W, C) NHWC buffer with
C < 128 moves ceil(C/128)*128 lanes through HBM, so the image stem reads
~43x the useful bytes. Packing 2x2 spatial blocks into channels
((H, W, C) -> (H/2, W/2, 4C)) quarters the padded positions; measured
2.1x faster for the stem conv on a v5e (tools/stemprobe.py, 10.3 ->
4.9 ms at b=32 900x1600x3). The repack must happen on the HOST (a free
permutation in the loader; H2D bytes are unchanged) — the in-graph form
re-materializes the packed buffer and loses the win (9.7 ms, measured).

Exactness: with output y[i,j] = sum_{u,v} w7[u+3, v+3] * x[2i+u-... ]
over the stride-2 grid, substituting u = 2q + a (a = u mod 2) maps every
7x7 tap onto a 4x4 kernel over the packed layout with asymmetric pad
(2, 1):

    w4[q+2, r+2, (a*2+b)*C + c, o] = w7[u+3, v+3, c, o]

The rewrite is exact up to f32 summation order (<=1e-5 rel; identical in
bf16 resolution) — pinned by tests/test_s2d_stem.py against the direct
conv. Reference stem: src/networks.py ResNetEncoder conv1 (7x7/2,
src/net_utils.py:29-91); this packing has no reference counterpart — it
is the TPU-layout half of the input pipeline.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ['pack2x2', 'pack2x2_np', 'pack_np', 'pack_jnp',
           's2d_stem_weights', 'conv2d_s2d_stem']


def pack_np(x: np.ndarray, factor: int) -> np.ndarray:
    """Host-side FxF space-to-depth: (..., H, W, C) ->
    (..., H/F, W/F, F*F*C), phase-major (alpha, beta, c) channel order
    (factor=2 == pack2x2_np). Any dtype; H, W must divide by factor."""
    *lead, h, w, c = x.shape
    f = factor
    if h % f or w % f:
        raise ValueError(f'pack_np(factor={f}) needs H, W % {f} == 0; '
                         f'got {(h, w)}')
    x = x.reshape(*lead, h // f, f, w // f, f, c)
    x = np.moveaxis(x, -4, -3)                  # (..., h/f, w/f, a, b, c)
    return np.ascontiguousarray(x.reshape(*lead, h // f, w // f,
                                          f * f * c))


def pack2x2_np(x: np.ndarray) -> np.ndarray:
    """Host-side 2x2 space-to-depth: (..., H, W, C) -> (..., H/2, W/2, 4C),
    phase-major (a, b, c) channel order. H and W must be even. Works on
    any dtype (the loaders call it on uint8 before transport)."""
    *lead, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f'pack2x2 needs even H, W; got {(h, w)}')
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, c)
    x = np.moveaxis(x, -4, -3)                  # (..., h2, w2, a, b, c)
    return np.ascontiguousarray(x.reshape(*lead, h // 2, w // 2, 4 * c))


def pack2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Device-side pack (for parity tests; prefer the host form in real
    pipelines — see module docstring)."""
    return pack_jnp(x, 2)


def pack_jnp(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Device-side FxF space-to-depth, phase-major (alpha, beta, c)
    channel order (the jnp twin of pack_np). Prefer host packing for
    inputs; the in-graph form is for tensors born on device (e.g. the
    pipeline's scatter maps feeding FusionNet's packed stage 1)."""
    *lead, h, w, c = x.shape
    f = factor
    if h % f or w % f:
        raise ValueError(f'pack_jnp(factor={f}) needs H, W % {f} == 0; '
                         f'got {(h, w)}')
    x = x.reshape(*lead, h // f, f, w // f, f, c)
    x = jnp.moveaxis(x, -4, -3)
    return x.reshape(*lead, h // f, w // f, f * f * c)


def s2d_stem_weights(w7: jnp.ndarray) -> jnp.ndarray:
    """(7, 7, C, O) stride-2 stem weights -> (4, 4, 4C, O) stride-1
    weights over the packed input.

    Built as ONE gather with static index maps (zero sentinel at padded
    index 7): a per-slice .at[].set chain lowers to ~50 sequential
    dynamic-update-slices that XLA does not hoist out of the dispatch —
    measurable per-call overhead in the serving graphs (docs/PERF.md
    round-5)."""
    k, k2, c, o = w7.shape
    assert k == 7 and k2 == 7, (k, k2)
    m = np.full((4, 2), 7, np.int64)          # [q+2, a] -> u+3
    for u in range(-3, 4):
        a = u % 2
        q = (u - a) // 2
        m[q + 2, a] = u + 3
    w7p = jnp.pad(w7, ((0, 1), (0, 1), (0, 0), (0, 0)))  # zero sentinel
    U = m[:, None, :, None]                    # (4,1,2,1)
    V = m[None, :, None, :]                    # (1,4,1,2)
    U, V = np.broadcast_arrays(U, V)           # (4,4,2,2)
    g = w7p[U, V]                              # (4,4,2,2,C,O)
    return g.reshape(4, 4, 4 * c, o)


def conv2d_s2d_stem(x_packed: jnp.ndarray, w7: jnp.ndarray) -> jnp.ndarray:
    """The stem conv over a 2x2-packed input: exact equivalent of
    F.conv2d(x, w7, stride=2) where x_packed = pack2x2(x).

    x_packed: (B, H/2, W/2, 4C); w7: (7, 7, C, O) — the layer keeps its
    canonical (checkpoint-compatible) weight shape; the 4x4 form is
    derived in-graph (49 static slices over a (7,7,C,O) constant-shaped
    tensor — negligible next to the conv, and jit caches the graph)."""
    w4 = s2d_stem_weights(w7)
    return lax.conv_general_dilated(
        x_packed, w4.astype(x_packed.dtype), window_strides=(1, 1),
        padding=((2, 1), (2, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

"""Phase-packed encoder stage 1: stems, fusion, and maxpool all evaluated
on the 2x2 space-to-depth grid.

The round-5 roofline (docs/PERF.md) puts encoder/h450 at the top of both
serving graphs' padded HBM traffic: every (450, 800, C<=32) NHWC buffer
is lane-padded to 128 channels (2-8x expansion), and the b=32 bench scan
graph keeps five such 2.75 GiB temps alive at once. This module keeps the
whole stage-1 region packed — (225, 400, 4C) with full (or nearly full)
lanes — so no full-res or half-res low-channel buffer is ever
materialized between the host-packed input and the stage-2 maxpool:

    stem:    the 7x7/s2 conv over the 2x2-packed input emits PACKED
             output directly (a stride-2 5x5 conv whose kernel embeds the
             4x4 packed-stem kernel once per output phase — exact).
    BN/act:  per-channel affine + elementwise, phase-tiled.
    fusion:  1x1 convs become phase-block-diagonal 1x1 convs (exact);
             'weight' fusion's 3x3 uses pack_fullres_kernel (exact up to
             f32 reassociation); 'concat' concatenates per phase.
    maxpool: the full-res 3x3/s2 (-inf pad) maxpool reads the packed
             tensor and emits the natural UNPACKED (225, 400, C) output
             (stride-2 output positions are exactly one phase each).

Exactness: every rewrite is the same math with reordered summation —
pinned against the unpacked encoder by tests/test_packed_stage1.py for
all four fusion types. Inference-only: training-mode BN needs batch
statistics pooled across phases, which the per-(phase, channel) packed
layout does not expose (the unpacked Conv2d s2d dispatch in nn/layers.py
stays exact for training).

Channel convention is phase-major ((dy*2+dx)*C + c) everywhere — the
same order as ops/s2d_stem.pack2x2 and ops/packed_tail.space_to_depth.

Reference counterpart: stage 1 of src/networks.py FusionNetEncoder
(:270-1005) — the packing itself has no reference analogue; it is the
TPU-layout half of the design.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from ..nn import functional as F
from .packed_tail import effective_conv, pack_fullres_kernel
from .s2d_stem import s2d_stem_weights

__all__ = ['conv2d_s2d_stem_packed', 'conv2d_s4d_stem_packed',
           'pack_pointwise_kernel', 'max_pool2d_packed',
           'packed_fusion_stage1']


def _tile_bias4(b):
    """(C,) bias -> (4C,) phase-major tiled."""
    return jnp.reshape(jnp.broadcast_to(b, (4,) + b.shape), (-1,))


def s2d_stem_weights_packed(w7: jnp.ndarray) -> jnp.ndarray:
    """(7,7,C,O) stride-2 stem weights -> (5,5,4C,4O) stride-1-over-
    phases form: a stride-2 conv over the 2x2-packed input that emits the
    2x2-packed output directly. Output phase (a, b) is the 4x4 packed
    kernel (ops/s2d_stem.s2d_stem_weights) embedded at offset (a, b) in
    the 5x5 window; with stride 2 and padding (2, 1) the window lands on
    packed position 2i + t - 2, exactly the (2i+a)-th stem output row."""
    w4 = s2d_stem_weights(w7)                     # (4, 4, 4C, O)
    c4, o = w4.shape[2], w4.shape[3]
    w5 = jnp.zeros((5, 5, c4, 4 * o), w7.dtype)
    for a in (0, 1):
        for b in (0, 1):
            phase = a * 2 + b
            w5 = w5.at[a:a + 4, b:b + 4, :,
                       phase * o:(phase + 1) * o].set(w4)
    return w5


def conv2d_s2d_stem_packed(x_packed: jnp.ndarray,
                           w7: jnp.ndarray) -> jnp.ndarray:
    """7x7/s2 stem conv, packed input -> PACKED output.

    x_packed: (B, H/2, W/2, 4C) = pack2x2(x); returns (B, H/4, W/4, 4O) =
    space_to_depth(F.conv2d(x, w7, stride=2)). Exact (same taps, same
    pairwise products; only the lane layout changes). Requires H/2, W/2
    even (canonical 900x1600 -> 450x800 -> 225x400)."""
    w5 = s2d_stem_weights_packed(w7)
    return lax.conv_general_dilated(
        x_packed, w5.astype(x_packed.dtype), window_strides=(2, 2),
        padding=((2, 1), (2, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def s4d_stem_weights(w7: jnp.ndarray) -> jnp.ndarray:
    """(7,7,C,O) stride-2 stem weights -> (3,3,16C,4O) over a 4x4-packed
    input, emitting the 2x2-phase-packed output directly.

    Output phase (a, b) at packed (i, j) is the stem output at full-res
    (4i + 2a, 4j + 2b): tap u maps to full-res row offset e = 2a + u - 3
    = 4t + alpha (alpha = e mod 4, t in {-1, 0, 1}) — a 3-tap kernel over
    the 4x4-packed grid. A 4x4 image pack reaches 48 input channels
    (vs 12 for 2x2), cutting the 128-lane padding on the stem input/carry
    buffer another 4x — the 2x2 packed carry still padded 10.7x and OOMed
    the b=32 scan graph (docs/PERF.md round-5)."""
    k, k2, c, o = w7.shape
    assert k == 7 and k2 == 7, (k, k2)
    # Single-gather construction (static index maps + a zero sentinel at
    # padded index 7): a per-element .at[...].set chain compiled to ~200
    # dynamic-update-slices that XLA did NOT hoist out of the dispatch,
    # costing ~25 ms/call in the b=32 serving graph (134 -> 156 fps once
    # amortized, docs/PERF.md round-5).
    # 1-D factor map: packed tap index (t+1) and input phase alpha for
    # each (output phase a, kernel tap u); sentinel u=7 reads the zero pad
    tmap = np.full((3, 4, 2), 7, np.int64)    # [t+1, alpha, a] -> u
    for a in (0, 1):
        for u in range(7):
            e = 2 * a + u - 3
            alpha = e % 4
            t = (e - alpha) // 4
            tmap[t + 1, alpha, a] = u
    w7p = jnp.pad(w7, ((0, 1), (0, 1), (0, 0), (0, 0)))  # zero sentinel
    # U[t, s, alpha, beta, a, b] / V[...]: source taps per destination
    U = tmap[:, None, :, None, :, None]                  # (3,1,4,1,2,1)
    V = tmap[None, :, None, :, None, :]                  # (1,3,1,4,1,2)
    U, V = np.broadcast_arrays(U, V)                     # (3,3,4,4,2,2)
    g = w7p[U, V]                          # (3,3,4,4,2,2,C,O)
    g = jnp.transpose(g, (0, 1, 2, 3, 6, 4, 5, 7))  # (3,3,4,4,C,2,2,O)
    return g.reshape(3, 3, 16 * c, 4 * o)


def conv2d_s4d_stem_packed(x_packed4: jnp.ndarray,
                           w7: jnp.ndarray) -> jnp.ndarray:
    """7x7/s2 stem conv: 4x4-packed input -> 2x2-phase-packed output.

    x_packed4: (B, H/4, W/4, 16C) = pack_np(x, 4); returns
    (B, H/4, W/4, 4O) = space_to_depth(F.conv2d(x, w7, stride=2)).
    Exact (zero full-res padding maps onto zero packed padding)."""
    w3 = s4d_stem_weights(w7)
    return lax.conv_general_dilated(
        x_packed4, w3.astype(x_packed4.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def pack_pointwise_kernel(w1: jnp.ndarray) -> jnp.ndarray:
    """(1,1,Ci,Co) kernel -> (1,1,4Ci,4Co) phase-block-diagonal kernel
    over phase-major packed tensors (a 1x1 conv touches one full-res
    position, i.e. one phase — exact)."""
    ci, co = w1.shape[2], w1.shape[3]
    w1z = jnp.stack([w1[0, 0], jnp.zeros_like(w1[0, 0])])  # (2,Ci,Co)
    idx = np.where(np.eye(4, dtype=bool), 0, 1)            # (4,4)
    k = w1z[idx]                                           # (4,4,Ci,Co)
    k = jnp.transpose(k, (0, 2, 1, 3)).reshape(4 * ci, 4 * co)
    return k[None, None]


def _shift2d_neginf(x, di: int, dj: int):
    """y[m, n] = x[m + di, n + dj], -inf where the index underflows
    (di, dj in {-1, 0}: the 3x3/s2/p1 maxpool only ever pads low edges —
    row 2m+1 <= 2(I-1)+1 never overflows a (2I, 2J) full-res frame)."""
    if di == 0 and dj == 0:
        return x
    i, j = x.shape[1], x.shape[2]
    x = jnp.pad(x, ((0, 0), (-di, 0), (-dj, 0), (0, 0)),
                constant_values=-jnp.inf)
    return x[:, :i, :j, :]


def max_pool2d_packed(x_packed: jnp.ndarray, channels: int) -> jnp.ndarray:
    """Full-res 3x3/stride-2/pad-1 maxpool (-inf padding, torch parity)
    evaluated from the 2x2-packed tensor, emitting the natural UNPACKED
    output: out[m, n] = max over full-res rows {2m-1, 2m, 2m+1} = packed
    (m-1, phase 1), (m, phase 0), (m, phase 1) — nine shifted packed
    slices folded with elementwise max, no (2I, 2J, C) buffer.

    x_packed: (B, I, J, 4*channels) phase-major; returns (B, I, J, C) ==
    F.max_pool2d(depth_to_space(x_packed), 3, 2, 1)."""
    c = channels
    taps = ((-1, 1), (0, 0), (0, 1))   # (shift, phase) per axis
    out = None
    for di, a in taps:
        for dj, b in taps:
            ph = x_packed[..., (a * 2 + b) * c:(a * 2 + b + 1) * c]
            term = _shift2d_neginf(ph, di, dj)
            out = term if out is None else jnp.maximum(out, term)
    return out


def _packed_conv1x1(x_packed, conv_module, params, state):
    """Apply a Conv2d(1x1) module (optional BN folded, optional
    activation) to a packed tensor via the phase-block-diagonal kernel."""
    w, b = effective_conv(conv_module, params, state)
    y = F.conv2d(x_packed, pack_pointwise_kernel(w), stride=1)
    y = y + _tile_bias4(b).astype(y.dtype)
    if conv_module.activation is not None:
        y = conv_module.activation(y)
    return y


def _packed_conv3x3(x_packed, conv_module, params, state):
    """Apply a Conv2d(3x3, stride 1) module to a packed tensor via the
    packed-packed kernel (exact up to f32 reassociation)."""
    w, b = effective_conv(conv_module, params, state)
    y = F.conv2d(x_packed, pack_fullres_kernel(w), stride=1)
    y = y + _tile_bias4(b).astype(y.dtype)
    if conv_module.activation is not None:
        y = conv_module.activation(y)
    return y


def _packed_stem(x_packed, conv_module, params, state):
    """7x7/s2 stem Conv2d module (BN folded in-graph if present) over a
    2x2- or 4x4-packed input (dispatched by channel count), emitting
    2x2-phase-packed output either way."""
    w, b = effective_conv(conv_module, params, state)
    if x_packed.shape[-1] == 16 * w.shape[2]:
        y = conv2d_s4d_stem_packed(x_packed, w)
    else:
        y = conv2d_s2d_stem_packed(x_packed, w)
    y = y + _tile_bias4(b).astype(y.dtype)
    if conv_module.activation is not None:
        y = conv_module.activation(y)
    return y


def packed_fusion_stage1(encoder, params, state, image_packed,
                         depth_packed):
    """Stage 1 of a FusionNetEncoder on 2x2-packed inputs, entirely in
    packed layout. Inference only (eval-mode BN is folded per channel).

    Arg(s):
        encoder : FusionNetEncoder module
        params/state : the encoder's params/state dicts
        image_packed : (B, H/2, W/2, 4*Ci) host-packed camera frame
        depth_packed : (B, H/2, W/2, 4*Cd) host-packed depth(+response)
    Returns:
        (fused_packed, fi_packed, fd_packed) — the stage-1 fusion output
        (the decoder skip) and the two pre-fusion stem features, all
        phase-major packed at (B, H/4, W/4, 4C). depth_to_space(...)
        of each equals the unpacked encoder's tensors exactly (up to f32
        reassociation in the 'weight' 3x3 path).
    """
    fi = _packed_stem(image_packed, encoder.children['conv1_image'],
                      params['conv1_image'], state['conv1_image'])
    fd = _packed_stem(depth_packed, encoder.children['conv1_depth'],
                      params['conv1_depth'], state['conv1_depth'])

    ft = encoder.fusion_type
    if ft == 'add':
        proj = _packed_conv1x1(fd, encoder.children['conv1_project'],
                               params['conv1_project'],
                               state['conv1_project'])
        fused = proj + fi
    elif ft == 'weight':
        w = _packed_conv3x3(fd, encoder.children['conv1_weight'],
                            params['conv1_weight'], state['conv1_weight'])
        fused = w * fd + fi
    elif ft == 'weight_and_project':
        w = _packed_conv1x1(fd, encoder.children['conv1_weight'],
                            params['conv1_weight'], state['conv1_weight'])
        p = _packed_conv1x1(fd, encoder.children['conv1_project'],
                            params['conv1_project'],
                            state['conv1_project'])
        fused = w * p + fi
    elif ft == 'concat':
        # stage 1 concatenates depth-first (networks.py:198-203) — per
        # phase, so the packed result is pack(concat([fd, fi]))
        n, i, j = fi.shape[:3]
        ci = fi.shape[-1] // 4
        cd = fd.shape[-1] // 4
        fused = jnp.concatenate([
            fd.reshape(n, i, j, 4, cd),
            fi.reshape(n, i, j, 4, ci)], axis=-1).reshape(
                n, i, j, 4 * (cd + ci))
    else:
        raise ValueError('Unsupported fusion type: {}'.format(ft))

    return fused, fi, fd

"""Phase-packed (space-to-depth) decoder tail.

The canonical decoders (reference src/networks.py:1595-1657) end with
  deconv0 : nearest-upsample x2 -> conv3x3 (C -> Co) -> conv3x3 (Co -> Co)
  output0 : conv3x3 (Co -> 1)
all at FULL resolution (900x1600 for FusionNet frames, 900x288 per-point
patches for RadarNet). With Co = 16..32 channels these stages underfill the
128-lane MXU 4-8x and pad every full-res HBM buffer to 128 lanes — they
dominate the frame time (stagebench: deconv0 = 10.1 ms of a 19.8 ms frame).

This module evaluates the SAME math entirely at half resolution by packing
the four output phases (dy, dx) in {0,1}^2 into the channel dimension:

  up-conv:  y[2i+dy, 2j+dx] = sum_{u,v} W[u,v] x[floor((2i+dy+u-1)/2), ...]
            == a 3x3 conv over x with kernel K[p,q, ci, (dy,dx,co)] formed
            by summing W rows/cols that alias to the same half-res tap
            (dy=0: p=-1 <- u=0, p=0 <- u=1+u=2; dy=1: p=0 <- u=0+1, p=1 <- u=2).
  full-res conv3x3 on a phase-packed tensor: row index 2i+dy+u-1 =
            2(i+p)+dy' with (p,dy') = divmod(dy+u-1, 2) — one packed tap per
            (dy,u) — giving a 3x3 conv with a block-structured
            (4Ci -> 4Co) kernel.
  output:   same, Co=1 -> 4 phase channels, then depth-to-space.

Every intermediate is (H/2, W/2, 4C): full 128 lanes for C=32, no full-res
buffer until the final 1-channel depth-to-space. The results are exact up
to float reassociation (kernel taps that alias are summed in f32 before
the conv instead of accumulated inside it).

Requires: even output H,W == 2x input, stride-1 3x3 convs, zero padding —
exactly the deconv0/output0 structure (the phase algebra maps full-res
zero-padding onto half-res zero-padding exactly when dims are even).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..nn import functional as F


class PackedSkip(NamedTuple):
    """A skip tensor kept in 2x2 phase-packed layout: `packed` has shape
    (N, I, J, 4C) and represents an (N, 2I, 2J, C) tensor with channel
    order (dy*2+dx)*C + c (space_to_depth below). The encoder hands the
    stage-1 skip to the decoder in this form under
    PerfConfig.packed_skip so the lane-padded full-res skip buffer is
    never materialized (docs/PERF.md round-5 §D: the depth_to_space
    handover write was the entire 22%% packed-region win)."""
    packed: jnp.ndarray

# Row/col aliasing matrices: K^{phase}[p] = sum_u M[phase][p, u] W[u]
_M = (
    np.array([[1., 0., 0.], [0., 1., 1.], [0., 0., 0.]], np.float32),  # d=0
    np.array([[0., 0., 0.], [1., 1., 0.], [0., 0., 1.]], np.float32),  # d=1
)


def pack_upconv_kernel(w):
    """(3,3,Ci,Co) kernel of [nearest-up x2 -> conv3x3] -> packed
    (3,3,Ci,4Co) kernel over the half-res input. Output channel index is
    (dy*2+dx)*Co + co."""
    wf = w.astype(jnp.float32)
    phases = []
    for dy in (0, 1):
        for dx in (0, 1):
            phases.append(jnp.einsum(
                'pu,qv,uvio->pqio',
                jnp.asarray(_M[dy]), jnp.asarray(_M[dx]), wf))
    k = jnp.stack(phases, axis=-2)  # (3,3,Ci,4,Co)
    return k.reshape(3, 3, w.shape[2], 4 * w.shape[3]).astype(w.dtype)


def pack_fullres_kernel(v):
    """(3,3,Ci,Co) kernel of a stride-1 full-res conv3x3 -> packed
    (3,3,4Ci,4Co) kernel over a phase-packed tensor. Channel index
    (d_y*2+d_x)*C + c on both sides.

    Built as ONE gather with static index maps (zero sentinel at padded
    index 3): the per-slice .at[].set chain lowered to ~80 sequential
    dynamic-update-slices that XLA does not hoist out of the dispatch —
    per-call overhead in every serving graph with the packed tail
    (docs/PERF.md round-5)."""
    ci, co = v.shape[2], v.shape[3]
    m = np.full((3, 2, 2), 3, np.int64)       # [p+1, dy', dy] -> u
    for dy in (0, 1):
        for u in range(3):
            p, dyp = divmod(dy + u - 1, 2)
            m[p + 1, dyp, dy] = u
    vp = jnp.pad(v, ((0, 1), (0, 1), (0, 0), (0, 0)))  # zero sentinel
    U = m[:, None, :, None, :, None]          # (3,1,2,1,2,1)
    V = m[None, :, None, :, None, :]          # (1,3,1,2,1,2)
    U, V = np.broadcast_arrays(U, V)          # (3,3,2,2,2,2)
    g = vp[U, V]                              # (p,q,dy',dx',dy,dx,Ci,Co)
    g = jnp.transpose(g, (0, 1, 2, 3, 6, 4, 5, 7))
    return g.reshape(3, 3, 4 * ci, 4 * co)


def _tile_bias(b):
    return jnp.reshape(jnp.broadcast_to(b, (4,) + b.shape), (-1,))


def depth_to_space(y, co: int):
    """(N,I,J,4*co) phase-packed -> (N,2I,2J,co)."""
    n, i, j = y.shape[:3]
    y = y.reshape(n, i, j, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(n, 2 * i, 2 * j, co)


def space_to_depth(x):
    """(N,2I,2J,C) -> (N,I,J,4C) phase-packed, channel order
    (dy*2+dx)*C + c (the exact inverse of depth_to_space)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(n, h // 2, w // 2, 4 * c)


def effective_conv(conv_module, params, state):
    """Effective (weight, bias) of a Conv2d with eval-mode BN folded
    in-graph (also handles already-folded params, where 'bias' exists and
    'batch_norm' is gone)."""
    w = params['conv']['weight']
    co = w.shape[-1]
    b = params['conv'].get('bias')
    b = jnp.zeros((co,), jnp.float32) if b is None else b.astype(jnp.float32)
    if conv_module.bn is not None and 'batch_norm' in params:
        bn_p, bn_s = params['batch_norm'], state['batch_norm']
        s = bn_p['weight'].astype(jnp.float32) / jnp.sqrt(
            bn_s['running_var'].astype(jnp.float32) + conv_module.bn.eps)
        w = (w.astype(jnp.float32) * s).astype(w.dtype)
        b = (b - bn_s['running_mean'].astype(jnp.float32)) * s + \
            bn_p['bias'].astype(jnp.float32)
    return w, b


def packed_decoder_block(x, skip, block, params, state):
    """Evaluate one DecoderBlock (nearest-up x2 -> conv3x3 -> skip concat ->
    conv3x3) entirely at HALF of its output resolution with the four output
    phases packed into channels.

    deconv1 is the bandwidth wall of the per-point RadarNet decode
    (docs/PERF.md): its (K, 450, 144, 32/64) intermediates are padded to
    128 lanes by XLA (4x HBM traffic). Packed, every intermediate runs at
    (225, 72) with 4C channels — full lanes, unpadded. The up-conv repack
    is FLOPs-neutral (pack_upconv_kernel); the post-concat conv is the 4x
    dense packed-packed form (pack_fullres_kernel), which pays off exactly
    because the unpacked conv ran below ~25%% MXU utilization.

    Exact up to float reassociation. Requires: deconv_type 'up', 3x3
    stride-1 convs, skip at exactly 2x x's spatial dims (even), eval mode.

    Arg(s):
        x : (N, I, J, Ci) input to the block
        skip : (N, 2I, 2J, Cs) skip tensor (may include upsampled side
            outputs already concatenated by the decoder)
        block : DecoderBlock module
        params/state : the block's params/state subtrees
    Returns:
        (N, 2I, 2J, Co) — identical to block(x, skip) up to reassociation.
    """
    up_conv = block.deconv.conv            # Conv2d inside UpConv2d
    w_up, b_up = effective_conv(up_conv, params['deconv']['conv'],
                                state['deconv']['conv'])
    w_mid, b_mid = effective_conv(block.conv, params['conv'], state['conv'])
    act_up = up_conv.activation
    act_mid = block.conv.activation
    co_up = w_up.shape[-1]
    cs = skip.shape[-1]

    y = F.conv2d(x, pack_upconv_kernel(w_up), stride=1)
    y = y + _tile_bias(b_up).astype(y.dtype)
    if act_up is not None:
        y = act_up(y)

    # packed concat: per-phase [deconv, skip] to match the block's
    # concat([deconv, skip]) channel order
    n, i, j = y.shape[:3]
    sp = space_to_depth(skip)
    cat = jnp.concatenate([
        y.reshape(n, i, j, 4, co_up),
        sp.reshape(n, i, j, 4, cs)], axis=-1).reshape(
            n, i, j, 4 * (co_up + cs))

    z = F.conv2d(cat, pack_fullres_kernel(w_mid), stride=1)
    z = z + _tile_bias(b_mid).astype(z.dtype)
    if act_mid is not None:
        z = act_mid(z)
    return depth_to_space(z, w_mid.shape[-1])


def _trim_map(d: int) -> np.ndarray:
    """[a (kernel tap), p (input phase)] -> u (full-res 3x3 tap index),
    with 3 as the zero sentinel, for output phase component d in {0,1}.

    Full-res tap row r = 2i' + d + u - 1 = 2(i' + p_off) + p with
    p_off in {d-1, d} — two consecutive packed offsets, so output phase
    d needs only a 2-tap packed kernel (a indexes the offset window,
    aligned by padding (1-d, d))."""
    m = np.full((2, 2), 3, np.int64)
    for a in (0, 1):
        for p in (0, 1):
            u = 2 * a + p + d - 1
            if 0 <= u <= 2:
                m[a, p] = u
    return m


def trimmed_phase_kernel(w, dy: int, dx: int):
    """(3,3,Ci,Co) full-res stride-1 conv kernel -> the (2,2,4Ci,Co)
    kernel producing output phase (dy,dx) directly from a phase-packed
    (N,I,J,4Ci) input (channel order (py*2+px)*Ci + c). Pair with
    padding ((1-dy, dy), (1-dx, dx))."""
    ci, co = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))  # zero sentinel row/col
    mr, mc = _trim_map(dy), _trim_map(dx)
    U = mr[:, None, :, None]                  # (a, 1, py, 1)
    V = mc[None, :, None, :]                  # (1, b, 1, px)
    U, V = np.broadcast_arrays(U, V)          # (a, b, py, px)
    g = wp[U, V]                              # (a, b, py, px, Ci, Co)
    return g.reshape(2, 2, 4 * ci, co)


def trimmed_fullres_conv(xp, w):
    """Stride-1 full-res conv3x3, phase-packed in -> phase-packed out,
    as FOUR per-phase (2,2,4Ci,Co) convs — 64/36 = 1.78x the unpacked
    FLOPs instead of pack_fullres_kernel's dense 4x, with every buffer
    packed (full 128 lanes at C>=32/4)."""
    outs = []
    for dy in (0, 1):
        for dx in (0, 1):
            k = trimmed_phase_kernel(w, dy, dx)
            outs.append(jax.lax.conv_general_dilated(
                xp, k.astype(xp.dtype), window_strides=(1, 1),
                padding=((1 - dy, dy), (1 - dx, dx)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC')))
    return jnp.concatenate(outs, axis=-1)     # phase-major (dy*2+dx)*Co


def packed_decoder_block_skippacked(x, skip_packed, block, params, state):
    """packed_decoder_block with the skip ALREADY phase-packed
    (N,I,J,4Cs): the skip's depth_to_space handover — a lane-padded
    full-res write that costs ~11 ms (= the whole 22% packed-stage-1
    region win) at the FusionNet serving config — never happens, and the
    post-concat conv runs in the trimmed per-phase form (1.78x FLOPs vs
    the dense 4x packed-packed form that made packed_deconv1 a round-4
    measured negative). Exact up to float reassociation.

    MEASURED SLOWER in the full b=32 serving graph (+6.2%, docs/PERF.md
    round-5 §G): the four per-phase convs each re-read the whole concat
    tensor and XLA does not fuse them — the extra reads outweigh the
    saved skip write. Tested opt-in via PerfConfig.packed_skip.

    Requires the packed_decoder_block conditions: 'up' deconv, 3x3
    stride-1 convs, eval mode, skip grid == 2x x's grid (encoded by the
    shapes: skip_packed spatial dims == x spatial dims)."""
    up_conv = block.deconv.conv
    w_up, b_up = effective_conv(up_conv, params['deconv']['conv'],
                                state['deconv']['conv'])
    w_mid, b_mid = effective_conv(block.conv, params['conv'], state['conv'])
    co_up = w_up.shape[-1]
    cs = skip_packed.shape[-1] // 4

    y = F.conv2d(x, pack_upconv_kernel(w_up), stride=1)
    y = y + _tile_bias(b_up).astype(y.dtype)
    if up_conv.activation is not None:
        y = up_conv.activation(y)

    n, i, j = y.shape[:3]
    cat = jnp.concatenate([
        y.reshape(n, i, j, 4, co_up),
        skip_packed.reshape(n, i, j, 4, cs)], axis=-1).reshape(
            n, i, j, 4 * (co_up + cs))

    z = trimmed_fullres_conv(cat, w_mid)
    z = z + _tile_bias(b_mid).astype(z.dtype)
    if block.conv.activation is not None:
        z = block.conv.activation(z)
    return depth_to_space(z, w_mid.shape[-1])


def packed_decoder_tail(x, deconv0, output0, params, state):
    """Evaluate deconv0 (no skip concat) + output0 at half resolution.

    Arg(s):
        x : (N, I, J, C) input to deconv0 (half the output resolution)
        deconv0 : DecoderBlock module (deconv_type 'up', skip_channels 0)
        output0 : Conv2d module (3x3, stride 1)
        params/state : decoder params/state dicts (keys 'deconv0','output0')
    Returns:
        (N, 2I, 2J, output0.out_channels) — identical to the unpacked path
        up to float reassociation.
    """
    up_conv = deconv0.deconv.conv          # Conv2d inside UpConv2d
    mid_conv = deconv0.conv
    w_up, b_up = effective_conv(up_conv, params['deconv0']['deconv']['conv'],
                                state['deconv0']['deconv']['conv'])
    w_mid, b_mid = effective_conv(mid_conv, params['deconv0']['conv'],
                                  state['deconv0']['conv'])
    w_out, b_out = effective_conv(output0, params['output0'],
                                  state['output0'])

    act_up = up_conv.activation
    act_mid = mid_conv.activation
    act_out = output0.activation

    y = F.conv2d(x, pack_upconv_kernel(w_up), stride=1)
    y = y + _tile_bias(b_up).astype(y.dtype)
    if act_up is not None:
        y = act_up(y)

    y = F.conv2d(y, pack_fullres_kernel(w_mid), stride=1)
    y = y + _tile_bias(b_mid).astype(y.dtype)
    if act_mid is not None:
        y = act_mid(y)

    y = F.conv2d(y, pack_fullres_kernel(w_out), stride=1)
    y = y + _tile_bias(b_out).astype(y.dtype)
    if act_out is not None:
        y = act_out(y)

    return depth_to_space(y, w_out.shape[-1])


def _int8_conv(y, w, b, act):
    """3x3 stride-1 conv with dynamic int8 quantization: per-tensor
    activation scale (max-abs), per-output-channel weight scales, int32
    MXU accumulation, f32 dequant + bias + activation. ~2x the bf16 MXU
    rate on v5e; NOT bit-comparable to the f32/bf16 path (opt-in only —
    breaks the 14-bit response-codec parity)."""
    import jax.numpy as jnp
    from jax import lax

    yf = y.astype(jnp.float32)
    sy = jnp.maximum(jnp.max(jnp.abs(yf)), 1e-12) / 127.0
    yq = jnp.clip(jnp.round(yf / sy), -127, 127).astype(jnp.int8)
    wf = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        yq, wq, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sy * sw)
    out = out + _tile_bias(b).astype(out.dtype)
    if act is not None:
        out = act(out)
    return out.astype(y.dtype)


def packed_decoder_tail_int8(x, deconv0, output0, params, state):
    """packed_decoder_tail with the three phase-packed convs quantized to
    int8 (RCFD_INT8_TAIL=1). Same structure and shapes; accuracy is
    approximate (dynamic per-tensor activation scales), so this is an
    opt-in serving mode only — never a default."""
    up_conv = deconv0.deconv.conv
    mid_conv = deconv0.conv
    w_up, b_up = effective_conv(up_conv, params['deconv0']['deconv']['conv'],
                                state['deconv0']['deconv']['conv'])
    w_mid, b_mid = effective_conv(mid_conv, params['deconv0']['conv'],
                                  state['deconv0']['conv'])
    w_out, b_out = effective_conv(output0, params['output0'],
                                  state['output0'])

    y = _int8_conv(x, pack_upconv_kernel(w_up), b_up, up_conv.activation)
    y = _int8_conv(y, pack_fullres_kernel(w_mid), b_mid,
                   mid_conv.activation)
    y = _int8_conv(y, pack_fullres_kernel(w_out), b_out,
                   output0.activation)
    return depth_to_space(y, w_out.shape[-1])

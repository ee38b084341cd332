"""Integer-dtype host->device input transport (round 5).

The loader used to ship float32 everywhere: 12 B/px for camera images
that are natively uint8 and 4 B/px for depth/response streams that are
natively 16-bit PNG integers. On this container the H2D path crosses an
HTTP relay and was the measured end-to-end bottleneck (docs/PERF.md
round-4 §E: 2.1 samples/s loader-fed vs 175.5 step-only; ~550 MB/call in
the dispatch bench). Shipping the raw integers cuts image bytes 4x and
depth-family bytes 2x; the float conversion moves inside the jitted
graph where it is exact and free (fused into the first consumer).

Conventions (what `decode` assumes about dtypes):
  uint8          camera image, values 0..255        -> float32 cast
  uint16/uint32  raw 16-bit-PNG integers, x256 codec -> float32 / 256
  bool / floats  passthrough (validity masks, radar points, bboxes)

Exactness: uint8->f32 is a pure cast; every uint16 is exactly
representable in f32 and division by 256 (a power of two) is exact, so
device-side `astype(f32)/256` is bit-identical to the host-side
`load_depth` conversion it replaces (pinned by tests/test_transport.py).
uint32 values above 2**24 would round in f32 — identically on host and
device, and the x256 codec never produces them for physical depths
(would be a 65 km depth).

The response-stream quirk is preserved by construction: FusionNet reads
response PNGs through the x256 codec (reference src/datasets.py:412-415),
so a transported response is just another x256 stream.

Gate: RCFD_INT_TRANSPORT (default ON; '0'/'false'/'off'/'no' disables)
or the datasets' explicit ``transport=`` constructor argument.
"""

from __future__ import annotations

import os

import numpy as np

_ENV = 'RCFD_INT_TRANSPORT'


def enabled(explicit=None) -> bool:
    """Resolve the transport gate: explicit argument wins over the env."""
    if explicit is not None:
        return bool(explicit)
    v = os.environ.get(_ENV)
    if v in (None, ''):
        return True
    return v.strip().lower() not in ('0', 'false', 'off', 'no')


def encode_image(image) -> np.ndarray:
    """Host-side: [0,255]-valued image -> uint8 (exact for PNG/JPEG
    decodes, whose float values are integral)."""
    a = np.asarray(image)
    if a.dtype == np.uint8:
        return a
    return a.astype(np.uint8)


def encode_png_int(raw) -> np.ndarray:
    """Host-side: raw PNG integers -> the narrowest transport dtype.

    Negative values map to 0 — exactly load_depth's `z[z<=0]=0` clamp,
    applied before transport instead of after division."""
    a = np.asarray(raw)
    if a.dtype == np.uint16:
        return a
    if np.issubdtype(a.dtype, np.signedinteger) and a.min(initial=0) < 0:
        a = np.maximum(a, 0)
    return a.astype(np.uint16 if a.max(initial=0) <= 0xFFFF else np.uint32)


def _decode_one(x, xp):
    dtype = getattr(x, 'dtype', None)
    if dtype == np.uint8:
        return x.astype(xp.float32)
    if dtype in (np.uint16, np.uint32):
        return x.astype(xp.float32) / xp.float32(256.0)
    return x


def decode(batch):
    """Device-side (trace-time) decode: integer transport -> the float32
    values every step/forward consumed before round 5. Passthrough for
    float inputs, so decoded and undecoded callers share one code path.
    Accepts a single array or an arbitrarily nested pytree."""
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(lambda x: _decode_one(x, jnp), batch)


def decode_np(batch):
    """Host-side decode with identical semantics (for consumers that do
    numpy math on dataset samples: metrics, PNG writers, viz panels)."""
    import jax
    return jax.tree_util.tree_map(lambda x: _decode_one(x, np), batch)


__all__ = ['enabled', 'encode_image', 'encode_png_int', 'decode',
           'decode_np']

"""Host-side data I/O: path manifests, 16-bit PNG codecs, interpolation.

Byte-compatible with the reference's formats (src/data_utils.py:128-379):
depth maps are 16/32-bit 'I'-mode PNGs quantized by x256; response maps by
x2^14; radar point sets are .npy float arrays of shape (N, 3) = (x, y, z)
in image-plane coordinates.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image


def _native():
    """Native C++ codec (libpng/libjpeg, threaded) — the hot-path decoder.
    Disable with RCFD_NATIVE_IO=0; PIL is the fallback."""
    if os.environ.get('RCFD_NATIVE_IO', '1') == '0':
        return None
    try:
        from .. import native
        return native if native.available() else None
    except Exception:
        return None


def read_paths(filepath: str) -> List[str]:
    """Read a newline-delimited path manifest (stops at the first empty
    line, like the reference src/data_utils.py:128-150)."""
    path_list = []
    with open(filepath) as f:
        while True:
            path = f.readline().rstrip('\n')
            if path == '':
                break
            path_list.append(path)
    return path_list


def write_paths(filepath: str, paths: List[str]):
    with open(filepath, 'w') as o:
        for path in paths:
            o.write(path + '\n')


def _decode_image_f32(path: str):
    nat = _native()
    if nat is not None:
        try:
            return nat.read_image(path)
        except Exception:
            pass
    return np.asarray(Image.open(path).convert('RGB'), np.float32)


def load_image_raw(path: str):
    """uint8 (H, W, 3) raw image; an mmap when the raw cache is active.
    Convert (a window of) it with .astype(np.float32) — cropping the raw
    first skips the full-frame conversion (see datasets.py)."""
    from .raw_cache import cache_dir, load_raw

    decode = lambda: _decode_image_f32(path).astype(np.uint8)  # noqa: E731
    if cache_dir() is not None:
        return load_raw(path, 'image', decode)
    return decode()


def load_image_u8(path: str, data_format: str = 'HWC'):
    """uint8 RGB image for integer host->device transport (see
    transport.py). Values identical to load_image(normalize=False)
    modulo the dtype: PNG/JPEG decodes are integral."""
    image = load_image_raw(path) if _raw_cache_on() else \
        np.asarray(Image.open(path).convert('RGB'), np.uint8)
    if data_format == 'HWC':
        return image
    elif data_format == 'CHW':
        return np.transpose(image, (2, 0, 1))
    raise ValueError('Unsupported data format: {}'.format(data_format))


def load_depth_u16(path: str, data_format: str = 'HW'):
    """Raw 16-bit-PNG integers (x256 codec implied) for integer transport.
    decode -> float32/256 equals load_depth exactly (negatives, which
    load_depth clamps to 0 after division, are clamped to 0 here)."""
    from .transport import encode_png_int
    raw = encode_png_int(load_depth_raw(path))
    return _expand(raw, data_format)


def _raw_cache_on():
    from .raw_cache import cache_dir
    return cache_dir() is not None


def load_image(path: str, normalize: bool = False, data_format: str = 'HWC'):
    """Load an RGB image as float32 (src/data_utils.py:167-198)."""
    from .raw_cache import cache_dir

    if cache_dir() is not None:
        image = load_image_raw(path).astype(np.float32)
    else:
        image = _decode_image_f32(path)
    if data_format == 'HWC':
        pass
    elif data_format == 'CHW':
        image = np.transpose(image, (2, 0, 1))
    else:
        raise ValueError('Unsupported data format: {}'.format(data_format))
    return image / 255.0 if normalize else image


def save_image(image, path: str):
    """Save a [0, 1] float image as 8-bit RGB."""
    Image.fromarray((255.0 * np.asarray(image)).astype(np.uint8)).save(path)


def _expand(z, data_format):
    if data_format == 'HW':
        return z
    elif data_format == 'CHW':
        return np.expand_dims(z, axis=0)
    elif data_format == 'HWC':
        return np.expand_dims(z, axis=-1)
    raise ValueError('Unsupported data format: {}'.format(data_format))


def load_depth_raw(path: str):
    """Raw PNG integer array (H, W); an mmap when the raw cache is
    active. Convert with depth_from_raw (per-caller multiplier — the
    same file may legitimately be read under x256 and x2^14)."""
    from .raw_cache import cache_dir, load_raw

    decode = lambda: np.asarray(Image.open(path), np.int64)  # noqa: E731
    if cache_dir() is not None:
        return load_raw(path, 'png_int', decode)
    return decode()


def depth_from_raw(raw, multiplier: float = 256.0, data_format: str = 'HW'):
    """Raw PNG integers -> the load_depth float semantics."""
    z = np.asarray(raw, np.float32) / np.float32(multiplier)
    z[z <= 0] = 0.0
    return _expand(z, data_format)


def load_depth(path: str, multiplier: float = 256.0, data_format: str = 'HW'):
    """Load a depth map from a 16/32-bit PNG (src/data_utils.py:238-269)."""
    from .raw_cache import cache_dir

    if cache_dir() is not None:
        return depth_from_raw(load_depth_raw(path), multiplier, data_format)
    nat = _native()
    if nat is not None:
        try:
            return _expand(nat.read_depth(path, multiplier), data_format)
        except Exception:
            pass
    z = np.array(Image.open(path), dtype=np.float32)
    z = z / multiplier
    z[z <= 0] = 0.0
    return _expand(z, data_format)


def load_depth_with_validity_map(path: str, multiplier: float = 256.0,
                                 data_format: str = 'HW'):
    z = np.array(Image.open(path), dtype=np.float32)
    z = z / multiplier
    z[z <= 0] = 0.0
    v = z.astype(np.float32).copy()
    v[z > 0] = 1.0
    return _expand(z, data_format), _expand(v, data_format)


def save_depth(z, path: str, multiplier: float = 256.0):
    """Save a depth map as an 'I'-mode PNG quantized by `multiplier`
    (src/data_utils.py:271-286)."""
    z = np.uint32(np.asarray(z) * multiplier)
    Image.fromarray(z.astype(np.int32), mode='I').save(path)


def save_depth_encoded(z_u16, path: str):
    """Write a depth map that was already quantized to the codec grid
    (uint16, floor(z*256) — e.g. on device by make_forward_fn_batched's
    codec_encode). Byte-identical files to save_depth(z_f32, path);
    values must fit 16 bits (z < 256 m, true for every rcfd surface)."""
    z_u16 = np.asarray(z_u16)
    assert z_u16.dtype == np.uint16, z_u16.dtype
    Image.fromarray(z_u16.astype(np.int32), mode='I').save(path)


def save_response_encoded(response_u16, path: str):
    """Codec-grid (uint16, floor(r*2^14)) counterpart of save_response."""
    response_u16 = np.asarray(response_u16)
    assert response_u16.dtype == np.uint16, response_u16.dtype
    Image.fromarray(response_u16.astype(np.int32), mode='I').save(path)


def load_response(path: str, multiplier: float = 2 ** 14, data_format: str = 'HW'):
    """Load a response (confidence) map (src/data_utils.py:288-318)."""
    from .raw_cache import cache_dir, load_raw

    if cache_dir() is not None:
        raw = load_raw(path, 'png_int',
                       lambda: np.asarray(Image.open(path), np.int64))
        return _expand(raw.astype(np.float32) / np.float32(multiplier),
                       data_format)
    response = np.array(Image.open(path), dtype=np.float32)
    response = response / multiplier
    return _expand(response, data_format)


def save_response(response, path: str, multiplier: float = 2 ** 14):
    response = np.uint32(np.asarray(response) * multiplier)
    Image.fromarray(response.astype(np.int32), mode='I').save(path)


def interpolate_depth(depth_map, validity_map, log_space: bool = False):
    """Densify sparse depth by barycentric (Delaunay) interpolation
    (src/data_utils.py:337-379). Host-side scipy/Qhull — offline GT path."""
    from scipy.interpolate import LinearNDInterpolator

    assert depth_map.ndim == 2 and validity_map.ndim == 2
    rows, cols = depth_map.shape
    data_row_idx, data_col_idx = np.where(validity_map)
    depth_values = depth_map[data_row_idx, data_col_idx]
    if log_space:
        depth_values = np.log(depth_values)
    interpolator = LinearNDInterpolator(
        points=np.stack([data_row_idx, data_col_idx], axis=1),
        values=depth_values,
        fill_value=0 if not log_space else np.log(1e-3))
    query_row_idx, query_col_idx = np.meshgrid(
        np.arange(rows), np.arange(cols), indexing='ij')
    query_coord = np.stack(
        [query_row_idx.ravel(), query_col_idx.ravel()], axis=1)
    z = interpolator(query_coord).reshape([rows, cols])
    if log_space:
        z = np.exp(z)
        z[z < 1e-1] = 0.0
    return z

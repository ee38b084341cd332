"""Decode-once raw cache for the PNG input streams (round 4).

Measured on this host: full-frame nuScenes training samples decode at
~2.6 samples/s/core (five 900x1600 PNGs each, libpng inflate-bound), so
the canonical training config (batch 16, ~80 ms/step on a v5e) needs
~50-80 host cores of pure PNG decode — and the decode repeats EVERY
epoch (the reference re-reads the PNGs each time,
/root/reference/src/datasets.py:400-415). This cache trades disk for
CPU: the first read of each file decodes and writes the raw integer
array (uint8 images, uint16/uint32 depth-family) next to a content key;
subsequent epochs mmap + rescale (memcpy-speed, >100x the decode rate).

Scope: the 16-bit PNG codec semantics are preserved exactly — the cache
stores the RAW PNG integer values and applies the caller's multiplier at
load, so the load_depth-x256-of-a-response-PNG quirk keeps working and a
depth/response file read under two different multipliers gets two
rescales of ONE cached decode.

Enable: RCFD_RAW_CACHE=<dir> (host-side I/O config, like RCFD_NATIVE_IO)
or programmatically via set_raw_cache(dir). Off by default — it costs
disk (~16 MB/sample full-frame; ~550 GB for the full 34k-frame nuScenes
train split, sized for scratch SSDs on training hosts).

Invalidation: the key hashes absolute path + mtime + size, so rewritten
files re-decode. Writes are atomic (tmp + os.replace) — safe under the
threaded loader.
"""

from __future__ import annotations

import hashlib
import os
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_DIR: Optional[str] = None
_INIT = [False]
_WRITE_FAIL_WARNED = [False]


def set_raw_cache(dirpath: Optional[str]):
    """Set (or disable, with None) the cache directory."""
    global _DIR
    with _LOCK:
        _DIR = dirpath
        _INIT[0] = True
        if dirpath:
            os.makedirs(dirpath, exist_ok=True)


def cache_dir() -> Optional[str]:
    global _DIR
    if not _INIT[0]:
        with _LOCK:
            if not _INIT[0]:
                env = os.environ.get('RCFD_RAW_CACHE')
                if env:
                    os.makedirs(env, exist_ok=True)
                    _DIR = env
                _INIT[0] = True
    return _DIR


def _key(path: str, kind: str) -> str:
    st = os.stat(path)
    h = hashlib.sha1(
        f'{os.path.abspath(path)}|{st.st_mtime_ns}|{st.st_size}|{kind}'
        .encode()).hexdigest()
    return h


def load_raw(path: str, kind: str, decode):
    """Return the raw integer array for `path`, decoding at most once.

    kind: 'image' (uint8 HWC) or 'png_int' (the PNG's integer values).
    decode: () -> np.ndarray fallback producing the raw array.
    """
    d = cache_dir()
    if d is None:
        return decode()
    cpath = os.path.join(d, _key(path, kind) + '.npy')
    if os.path.exists(cpath):
        try:
            return np.load(cpath, mmap_mode='r')
        except Exception:
            pass  # corrupt/partial: fall through and rewrite
    raw = np.ascontiguousarray(decode())
    if kind == 'png_int' and raw.dtype != np.uint16:
        # PNG 'I' mode is 32-bit but the codecs' values fit u16 for all
        # canonical streams (depth <= 256 m at x256; response < 4 at
        # x2^14); keep u32 only when actually needed
        raw = raw.astype(np.uint16 if raw.max(initial=0) <= 0xFFFF
                         else np.uint32)
    tmp = cpath + f'.tmp.{os.getpid()}.{threading.get_ident()}'
    try:
        with open(tmp, 'wb') as f:
            np.save(f, raw)
        os.replace(tmp, cpath)
    except Exception as e:
        # A full/unwritable cache disk degrades every epoch back to full
        # PNG decode — losing the 19x loader win. Keep serving (the raw
        # array is valid) but say so loudly, once per process.
        if not _WRITE_FAIL_WARNED[0]:
            _WRITE_FAIL_WARNED[0] = True
            import warnings
            warnings.warn(
                f'raw cache write to {d} failed ({type(e).__name__}: {e}); '
                f'loader falls back to per-epoch PNG decode. Check disk '
                f'space/permissions on RCFD_RAW_CACHE.', RuntimeWarning)
        try:
            os.remove(tmp)
        except OSError:
            pass
    return raw

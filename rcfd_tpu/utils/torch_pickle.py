"""Torch-free reader for torch's zip-serialized checkpoints.

A ``torch.save`` (new zipfile serialization) archive is a standard zip:

    archive/data.pkl   — a pickle whose tensors are persistent-id stubs
                          ('storage', <StorageType>, key, location, numel)
    archive/data/<key> — raw little-endian storage bytes
    archive/version    — serialization version

We deserialize with a custom Unpickler: ``find_class`` maps the torch
reconstruction helpers and storage classes to local equivalents, and
``persistent_load`` resolves storages from the zip members — no torch
import anywhere. Tensors come back as numpy arrays (strided views are
materialized), which is exactly what the checkpoint converters consume.

This makes loading the reference's released ``.pth`` checkpoints possible
in a torch-free deployment; utils/checkpoint.py uses it as the fallback
when torch is not installed.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from collections import OrderedDict
from typing import Any, Dict

import numpy as np

_DTYPES = {
    'FloatStorage': np.float32,
    'DoubleStorage': np.float64,
    'HalfStorage': np.float16,
    'LongStorage': np.int64,
    'IntStorage': np.int32,
    'ShortStorage': np.int16,
    'CharStorage': np.int8,
    'ByteStorage': np.uint8,
    'BoolStorage': np.bool_,
    'BFloat16Storage': None,  # handled specially below
}


class _StorageType:
    def __init__(self, name):
        self.name = name


class _Storage:
    def __init__(self, data: np.ndarray, is_bf16: bool = False):
        self.data = data
        self.is_bf16 = is_bf16


def _rebuild_tensor_v2(storage: _Storage, storage_offset, size, stride,
                       requires_grad=False, backward_hooks=None,
                       metadata=None):
    flat = storage.data
    if len(size) == 0:
        return flat[storage_offset].copy()
    # materialize the strided view
    arr = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * flat.itemsize for s in stride))
    return np.ascontiguousarray(arr)


def _rebuild_parameter(data, requires_grad=False, backward_hooks=None):
    return data


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    # Closed allowlist: checkpoints contain only tensors / OrderedDicts /
    # numpy scalars, so anything else (builtins, os, ...) is rejected —
    # a .pth is untrusted input and must not reach arbitrary globals.
    _NUMPY_ALLOWED = {'_reconstruct', 'scalar', 'ndarray', 'dtype',
                      '_frombuffer'}

    def find_class(self, module, name):
        if module == 'torch._utils':
            if name == '_rebuild_tensor_v2':
                return _rebuild_tensor_v2
            if name == '_rebuild_parameter':
                return _rebuild_parameter
        if module == 'torch' and name in _DTYPES:
            return _StorageType(name)
        if module == 'torch' and name == 'Size':
            return tuple
        if module == 'collections' and name == 'OrderedDict':
            return OrderedDict
        if (module in ('numpy', 'numpy.core.multiarray',
                       'numpy._core.multiarray')
                and name in self._NUMPY_ALLOWED):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f'blocked global in checkpoint pickle: {module}.{name}')

    def persistent_load(self, pid):
        kind, storage_type, key, location, numel = pid
        assert kind == 'storage', kind
        name = storage_type.name if isinstance(storage_type, _StorageType) \
            else str(storage_type)
        raw = self._zf.read(f'{self._prefix}/data/{key}')
        if name == 'BFloat16Storage':
            # read as uint16 then widen: bf16 is the top half of f32
            u16 = np.frombuffer(raw, dtype=np.uint16, count=numel)
            data = (u16.astype(np.uint32) << 16).view(np.float32).copy()
            return _Storage(data, is_bf16=True)
        dtype = _DTYPES[name]
        return _Storage(np.frombuffer(raw, dtype=dtype, count=numel).copy())


def load_torch_zip(path: str) -> Dict[str, Any]:
    """Load a torch zip-format checkpoint into plain python + numpy."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith('/data.pkl'))
        prefix = pkl_name[:-len('/data.pkl')]
        with zf.open(pkl_name) as f:
            unpickler = _Unpickler(io.BytesIO(f.read()), zf, prefix)
            return unpickler.load()

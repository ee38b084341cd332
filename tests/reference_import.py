"""Import the public reference implementation (read-only, for parity tests).

The reference at /root/reference is PyTorch code; torchvision is not
installed in this image, so we register a minimal stub exposing only what
the reference's model-side imports touch:
  - torchvision.ops.roi_pool — reimplemented here in pure torch from the
    documented torchvision kernel semantics (round(coord*scale) box
    quantization, +1 roi size, floor/ceil bin edges, empty bins -> 0).
    This doubles as the ground truth for our JAX roi_pool tests.
  - torchvision.utils.make_grid / transforms.functional — unused by the
    forward paths under test; stubbed with minimal behavior.

Nothing from /root/reference is copied into this repository; tests import
it in place and skip when unavailable.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_SRC = '/root/reference/src'


def torch_roi_pool(feat, boxes_list, spatial_scale, output_size):
    """torchvision.ops.roi_pool reference semantics in pure torch.

    feat: (N, C, H, W); boxes_list: list of (K, 4) [x1, y1, x2, y2] per image
    (torchvision's List[Tensor] form). Returns (N*K, C, ph, pw).
    """
    import torch

    n, c, h, w = feat.shape
    ph, pw = output_size
    out = []
    for b, boxes in enumerate(boxes_list):
        for roi in boxes:
            x1, y1, x2, y2 = [float(v) for v in roi]
            # C++ std::round (half away from zero), not Python banker's
            cround = lambda v: np_floor(v + 0.5) if v >= 0 else -np_floor(-v + 0.5)
            start_w = int(cround(x1 * spatial_scale))
            start_h = int(cround(y1 * spatial_scale))
            end_w = int(cround(x2 * spatial_scale))
            end_h = int(cround(y2 * spatial_scale))
            roi_w = max(end_w - start_w + 1, 1)
            roi_h = max(end_h - start_h + 1, 1)
            # torchvision's kernel does the bin arithmetic in the input
            # dtype (FLOAT32): e.g. f32(114/112) * 56 = 57.0000038 makes
            # bin 55 span three rows — float64 math here would diverge
            # from the real op (verified vs native/roi_pool_golden.cpp)
            import numpy as np
            f32 = np.float32
            bin_h = f32(roi_h) / f32(ph)
            bin_w = f32(roi_w) / f32(pw)
            pooled = torch.zeros((c, ph, pw), dtype=feat.dtype)
            for i in range(ph):
                hstart = min(max(int(np_floor(f32(i) * bin_h)) + start_h, 0), h)
                hend = min(max(int(np_ceil(f32(i + 1) * bin_h)) + start_h, 0), h)
                for j in range(pw):
                    wstart = min(max(int(np_floor(f32(j) * bin_w)) + start_w, 0), w)
                    wend = min(max(int(np_ceil(f32(j + 1) * bin_w)) + start_w, 0), w)
                    if hend <= hstart or wend <= wstart:
                        continue
                    patch = feat[b, :, hstart:hend, wstart:wend]
                    pooled[:, i, j] = patch.reshape(c, -1).max(dim=1).values
            out.append(pooled)
    return torch.stack(out, dim=0)


def np_floor(x):
    import math
    return math.floor(x)


def np_ceil(x):
    import math
    return math.ceil(x)


def install_torchvision_stub():
    if 'torchvision' in sys.modules:
        return sys.modules['torchvision']
    tv = types.ModuleType('torchvision')
    ops = types.ModuleType('torchvision.ops')
    ops.roi_pool = lambda feat, boxes, spatial_scale, output_size: \
        torch_roi_pool(feat, boxes, spatial_scale, output_size)
    utils = types.ModuleType('torchvision.utils')
    utils.make_grid = lambda x, nrow=8: x
    transforms = types.ModuleType('torchvision.transforms')
    functional = types.ModuleType('torchvision.transforms.functional')

    def tv_pad(img, padding, fill=0, padding_mode='constant'):
        """torchvision F.pad semantics: padding (left, top, right, bottom);
        'edge' mode = replicate."""
        import torch
        left, top, right, bottom = padding
        mode = {'edge': 'replicate', 'constant': 'constant',
                'reflect': 'reflect'}[padding_mode]
        out = torch.nn.functional.pad(
            img, (left, right, top, bottom), mode=mode,
            **({'value': fill} if mode == 'constant' else {}))
        return out

    functional.pad = tv_pad
    transforms.functional = functional
    tv.ops = ops
    tv.utils = utils
    tv.transforms = transforms
    sys.modules['torchvision'] = tv
    sys.modules['torchvision.ops'] = ops
    sys.modules['torchvision.utils'] = utils
    sys.modules['torchvision.transforms'] = transforms
    sys.modules['torchvision.transforms.functional'] = functional
    return tv


def import_reference(module_name: str):
    """Import a module from the read-only reference tree (or skip)."""
    import pytest
    if not os.path.isdir(REFERENCE_SRC):
        pytest.skip('reference tree not available')
    install_torchvision_stub()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import importlib
    return importlib.import_module(module_name)

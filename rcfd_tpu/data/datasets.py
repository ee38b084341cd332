"""Datasets (host-side, numpy) mirroring reference src/datasets.py.

Differences from the reference by design:
- NHWC instead of NCHW (TPU-native layout).
- Explicit np.random.Generator plumbed per sample (deterministic across
  runs and worker counts), instead of global np.random/random state.
- RadarNet inference pads the ragged radar point axis to a static maximum
  with a validity mask (TPU static shapes) — see pad_points().
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from . import io as data_utils
from .transport import enabled as _transport_enabled
from .transport import encode_png_int as _encode_png_int


def _reencode_depth_stream_u16(arr_f32):
    """Recover the raw PNG integers from a float x256 decode (the native
    batch decoder returns raw/256 in f32; *256 reconstructs the integers
    exactly — both are power-of-two scalings of exactly-representable
    ints)."""
    raw = np.asarray(arr_f32, np.float32) * np.float32(256.0)
    return _encode_png_int(raw.astype(np.int64))


def random_crop(inputs, shape, crop_type=('none',), rng=None):
    """Joint crop of HWC inputs (reference src/datasets.py:19-109).

    crop_type: none, horizontal, vertical, anchored, top, bottom, left,
    right, center. 'vertical' applies with probability 0.3.
    """
    rng = rng or np.random.default_rng()
    n_height, n_width = shape
    o_height, o_width = inputs[0].shape[0], inputs[0].shape[1]

    d_height = o_height - n_height
    d_width = o_width - n_width

    y_start = d_height // 2
    x_start = d_width // 2

    if 'left' in crop_type:
        x_start = 0
    elif 'right' in crop_type:
        x_start = d_width
    elif 'horizontal' in crop_type:
        if 'anchored' in crop_type:
            widths = [0.0, 0.50 * d_width, 1.0 * d_width]
            x_start = int(widths[rng.integers(0, len(widths))])
        else:
            x_start = int(rng.integers(0, max(d_width, 1)))

    if 'top' in crop_type:
        y_start = 0
    elif 'bottom' in crop_type:
        y_start = d_height
    elif 'vertical' in crop_type and rng.random() <= 0.30:
        if 'anchored' in crop_type:
            heights = [0.0, 0.50 * d_height, 1.0 * d_height]
            y_start = int(heights[rng.integers(0, len(heights))])
        else:
            y_start = int(rng.integers(0, max(d_height, 1)))
    elif 'center' in crop_type:
        pass

    y_end = y_start + n_height
    x_end = x_start + n_width
    return [t[y_start:y_end, x_start:x_end, :] for t in inputs]


def pad_points(points: np.ndarray, max_points: int):
    """Pad a ragged (N, 3) point set to (max_points, 3) + validity mask.

    If N > max_points the set is truncated WITH A LOUD WARNING — dropped
    radar returns silently change metrics vs the reference, which
    processes all N points. Size max_points from the data
    (max_points_in_files) or raise --max_points_inference."""
    n = points.shape[0]
    if n > max_points:
        import warnings
        warnings.warn(
            'pad_points: truncating {} radar points to max_points={} — '
            'dropped returns change results vs the reference; size '
            'max_points from the manifest'.format(n, max_points),
            RuntimeWarning, stacklevel=2)
    out = np.zeros((max_points, 3), dtype=np.float32)
    valid = np.zeros((max_points,), dtype=bool)
    m = min(n, max_points)
    out[:m] = points[:m]
    valid[:m] = True
    return out, valid


def max_points_in_files(radar_paths) -> int:
    """Largest point count across radar .npy files, read from the npy
    HEADERS only (no data I/O) — used to auto-size the static point-axis
    padding so no frame is truncated."""
    best = 0
    for path in radar_paths:
        with open(path, 'rb') as f:
            version = np.lib.format.read_magic(f)
            if version >= (2, 0):
                shape, _, _ = np.lib.format.read_array_header_2_0(f)
            else:
                shape, _, _ = np.lib.format.read_array_header_1_0(f)
        n = shape[0] if len(shape) > 1 else 1
        best = max(best, int(n))
    return best


class RadarNetTrainingDataset:
    """Per-sample: padded image, K sampled radar points, per-point boxes,
    per-point ground-truth crops (reference src/datasets.py:112-271)."""

    def __init__(self,
                 image_paths: List[str],
                 radar_paths: List[str],
                 ground_truth_paths: List[str],
                 patch_size: Tuple[int, int],
                 total_points_sampled: int,
                 sample_probability_of_lidar: float,
                 transport: Optional[bool] = None):
        self.n_sample = len(image_paths)
        assert self.n_sample == len(ground_truth_paths)
        assert self.n_sample == len(radar_paths)
        self.image_paths = image_paths
        self.radar_paths = radar_paths
        self.ground_truth_paths = ground_truth_paths
        self.patch_size = tuple(patch_size)
        self.pad_size_x = patch_size[1] // 2
        self.total_points_sampled = total_points_sampled
        self.sample_probability_of_lidar = sample_probability_of_lidar
        # integer host->device transport (uint8 image, uint16 GT crops);
        # decoded inside the jitted step — see data/transport.py
        self.transport = _transport_enabled(transport)

    def __len__(self):
        return self.n_sample

    def get(self, index: int, rng: np.random.Generator):
        if self.transport:
            image = data_utils.load_image_u8(self.image_paths[index])
            ground_truth = data_utils.load_depth_u16(
                self.ground_truth_paths[index], data_format='HWC')
        else:
            image = data_utils.load_image(
                self.image_paths[index], normalize=False, data_format='HWC')
            ground_truth = data_utils.load_depth(
                self.ground_truth_paths[index], data_format='HWC')
        return self._assemble(index, rng, image, ground_truth)

    def get_batch(self, indices, rngs, n_threads: int = 8):
        """Batched decode via the native loader (see FusionNetTrainingDataset
        .get_batch); same per-sample point sampling afterwards."""
        decoded = _native_batch_decode(
            [self.image_paths[i] for i in indices],
            [[self.ground_truth_paths[i] for i in indices]],
            n_threads=n_threads)
        if decoded is None:
            samples = [self.get(int(i), rng)
                       for i, rng in zip(indices, rngs)]
        else:
            images, (gts,) = decoded
            if self.transport:
                images = images.astype(np.uint8)
                gts = _reencode_depth_stream_u16(gts)
            samples = [self._assemble(int(i), rng, images[b], gts[b])
                       for b, (i, rng) in enumerate(zip(indices, rngs))]
        return tuple(np.stack([s[j] for s in samples], axis=0)
                     for j in range(len(samples[0])))

    def _assemble(self, index: int, rng: np.random.Generator, image,
                  ground_truth):
        pad = self.pad_size_x
        image = np.pad(image, ((0, 0), (pad, pad), (0, 0)), mode='edge')

        radar_points = np.load(self.radar_paths[index])
        if radar_points.ndim == 1:
            radar_points = np.expand_dims(radar_points, axis=0)

        if radar_points.shape[0] <= self.total_points_sampled:
            radar_points = np.repeat(radar_points, 100, axis=0)
        random_idx = rng.integers(radar_points.shape[0],
                                  size=self.total_points_sampled)
        radar_points = radar_points[random_idx, :].astype(np.float32)

        if rng.random() < self.sample_probability_of_lidar:
            gt2d = ground_truth[..., 0]
            # under integer transport gt2d holds raw x256 ints: meters > 1
            # <=> raw > 256, and z_meters = raw/256 exactly
            gt_is_raw = gt2d.dtype != np.float32
            idx_y, idx_x = np.where(gt2d > (256 if gt_is_raw else 1))
            if len(idx_y) >= self.total_points_sampled:
                sel = rng.choice(len(idx_y), size=self.total_points_sampled,
                                 replace=False)
                points_x = idx_x[sel]
                points_y = idx_y[sel]
                points_z = gt2d[points_y, points_x]
                if gt_is_raw:
                    points_z = points_z.astype(np.float32) / np.float32(256.0)
                noise_x = rng.normal(0, 25, self.total_points_sampled)
                noise_z = rng.uniform(0.0, 0.4, self.total_points_sampled)
                fake = np.copy(radar_points)
                fake[:, 0] = np.clip(points_x + noise_x, 0, gt2d.shape[1])
                # y keeps the original (erroneous) radar value on purpose
                # (src/datasets.py:216)
                fake[:, 2] = points_z + noise_z
                fake[:, 0] = fake[:, 0].astype(int)
                fake[:, 1] = fake[:, 1].astype(int)
                radar_points = fake

        # shift x by pad; build full-height fixed-width boxes
        radar_points[:, 0] = radar_points[:, 0] + pad
        x1 = radar_points[:, 0] - pad
        bboxes = np.stack([
            x1,
            np.zeros_like(x1),
            radar_points[:, 0] + pad,
            np.full_like(x1, self.patch_size[0]),
        ], axis=1).astype(np.float32)

        ground_truth = np.pad(ground_truth, ((0, 0), (pad, pad), (0, 0)),
                              mode='constant')

        start_y = image.shape[0] - self.patch_size[0]
        crops = []
        for i in range(radar_points.shape[0]):
            sx = int(radar_points[i, 0] - pad)
            ex = int(radar_points[i, 0] + pad)
            crops.append(ground_truth[start_y:, sx:ex, :])
        ground_truth_crops = np.stack(crops, axis=0)  # (K, ph, pw, 1)

        image = image[start_y:, ...]

        if self.transport:
            return (np.ascontiguousarray(image),
                    radar_points.astype(np.float32),
                    bboxes,
                    np.ascontiguousarray(ground_truth_crops))
        return (image.astype(np.float32),
                radar_points.astype(np.float32),
                bboxes,
                ground_truth_crops.astype(np.float32))


class RadarNetInferenceDataset:
    """Full image + all radar points (padded) + optional ground truth
    (reference src/datasets.py:274-343)."""

    def __init__(self, image_paths, radar_paths, ground_truth_paths=None,
                 max_points: Optional[int] = 128,
                 transport: Optional[bool] = None):
        self.n_sample = len(image_paths)
        assert self.n_sample == len(radar_paths)
        self.image_paths = image_paths
        self.radar_paths = radar_paths
        self.transport = _transport_enabled(transport)
        if max_points is None:
            # auto-size the static point axis from the manifest so no
            # frame is ever truncated (npy headers only; padded up to a
            # multiple of 8 for shape stability across runs)
            actual = max(max_points_in_files(radar_paths), 1)
            max_points = -(-actual // 8) * 8
        self.max_points = max_points
        if ground_truth_paths is not None and None not in ground_truth_paths:
            assert self.n_sample == len(ground_truth_paths)
            self.ground_truth_available = True
        else:
            self.ground_truth_available = False
        self.ground_truth_paths = ground_truth_paths

    def __len__(self):
        return self.n_sample

    def get(self, index: int, rng=None):
        if self.transport:
            image = data_utils.load_image_u8(self.image_paths[index])
        else:
            image = data_utils.load_image(
                self.image_paths[index], normalize=False,
                data_format='HWC').astype(np.float32)
        radar_points = np.load(self.radar_paths[index]).astype(np.float32)
        if radar_points.ndim == 1:
            radar_points = np.expand_dims(radar_points, axis=0)
        points, valid = pad_points(radar_points, self.max_points)
        out = [image, points, valid]
        if self.ground_truth_available:
            if self.transport:
                out.append(data_utils.load_depth_u16(
                    self.ground_truth_paths[index], data_format='HWC'))
            else:
                out.append(data_utils.load_depth(
                    self.ground_truth_paths[index],
                    data_format='HWC').astype(np.float32))
        return tuple(out)


def _native_batch_decode(image_paths, depth_stream_paths, n_threads=8):
    """Decode one batch with the native C++ loader (rcfd_tpu.native): the
    camera images through the JPEG/PNG decoder and each 16-bit depth-PNG
    stream through the x256 codec — one GIL-free threaded native call per
    stream (reference feeds torch workers instead,
    src/fusionnet_main.py:112-123).

    Returns (images (B,H,W,3), [stream (B,H,W,1), ...]) or None when the
    native library is unavailable, disabled, or the files are not
    uniformly sized (the native batch call errors out and the caller
    falls back to the per-sample PIL path).

    RCFD_NATIVE_IO: '1' forces on, '0' forces off; unset -> enabled only
    on multi-core hosts (the batched path exists for parallel decode —
    on one core it has no advantage and this container's shared-host
    scheduling makes spawned decode threads erratic)."""
    import os
    from .raw_cache import cache_dir
    if cache_dir() is not None:
        # decode-once raw cache active: route through the per-sample
        # io.load_* path so reads hit (and populate) the cache — after
        # the first epoch that path is mmap-bound, faster than any decode
        return None
    env = os.environ.get('RCFD_NATIVE_IO')
    if env == '0':
        return None
    if env is None:
        n_cores = len(os.sched_getaffinity(0)) \
            if hasattr(os, 'sched_getaffinity') else (os.cpu_count() or 1)
        if n_cores < 2:
            return None
    try:
        from .. import native
        if native.get_lib() is None:
            return None
        h, w = native.probe(image_paths[0])
        images = native.batch_read_images(image_paths, h, w,
                                          n_threads=n_threads)
        streams = []
        for paths in depth_stream_paths:
            hd, wd = native.probe(paths[0])
            streams.append(native.batch_read_depth(
                paths, hd, wd, n_threads=n_threads)[..., None])
        return images, streams
    except Exception:
        return None


class FusionNetTrainingDataset:
    """image/depth/response/ground-truth/lidar quintuple with joint random
    crop (reference src/datasets.py:346-443)."""

    def __init__(self,
                 image_paths,
                 depth_paths,
                 response_paths,
                 ground_truth_paths,
                 lidar_map_paths,
                 shape: Optional[Tuple[int, int]] = None,
                 random_crop_type: Sequence[str] = ('none',),
                 transport: Optional[bool] = None):
        self.n_sample = len(image_paths)
        for paths in [depth_paths, response_paths, ground_truth_paths, lidar_map_paths]:
            assert len(paths) == self.n_sample
        self.image_paths = image_paths
        self.depth_paths = depth_paths
        self.response_paths = response_paths
        self.ground_truth_paths = ground_truth_paths
        self.lidar_map_paths = lidar_map_paths
        self.shape = shape
        self.do_random_crop = \
            self.shape is not None and all([x > 0 for x in self.shape])
        self.random_crop_type = tuple(random_crop_type)
        # integer host->device transport (uint8 image, uint16 streams);
        # decoded inside the jitted step — see data/transport.py
        self.transport = _transport_enabled(transport)

    def __len__(self):
        return self.n_sample

    def get(self, index: int, rng: np.random.Generator):
        from .raw_cache import cache_dir
        if cache_dir() is not None and self.do_random_crop:
            return self._get_raw_window(index, rng)
        if self.transport:
            image = data_utils.load_image_u8(self.image_paths[index])
            # response too: the reference reads it via the x256 codec
            # (src/datasets.py:412-415), so it's just another raw stream
            streams = [data_utils.load_depth_u16(p[index], data_format='HWC')
                       for p in (self.depth_paths, self.response_paths,
                                 self.ground_truth_paths,
                                 self.lidar_map_paths)]
            sample = [image] + streams
            if self.do_random_crop:
                sample = random_crop(inputs=sample, shape=self.shape,
                                     crop_type=self.random_crop_type, rng=rng)
            return tuple(np.ascontiguousarray(t) for t in sample)
        image = data_utils.load_image(self.image_paths[index], normalize=False,
                                      data_format='HWC')
        # NOTE: the reference loads the response stream with load_depth
        # (x256), not load_response — faithful here (src/datasets.py:412-415)
        depth = data_utils.load_depth(self.depth_paths[index], data_format='HWC')
        response = data_utils.load_depth(self.response_paths[index], data_format='HWC')
        ground_truth = data_utils.load_depth(self.ground_truth_paths[index],
                                             data_format='HWC')
        lidar_map = data_utils.load_depth(self.lidar_map_paths[index],
                                          data_format='HWC')
        if self.do_random_crop:
            image, depth, response, ground_truth, lidar_map = random_crop(
                inputs=[image, depth, response, ground_truth, lidar_map],
                shape=self.shape,
                crop_type=self.random_crop_type,
                rng=rng)
        return tuple(t.astype(np.float32)
                     for t in [image, depth, response, ground_truth, lidar_map])

    def _get_raw_window(self, index: int, rng: np.random.Generator):
        """Raw-cache fast path: crop the mmap'd RAW arrays first, convert
        only the window (the full-frame u16->f32 rescale dominates warm
        loads otherwise). Values identical to get(): crop and the
        elementwise conversions commute, and the crop coordinates use the
        same rng stream (random_crop reads only shapes + rng). Under
        integer transport even the window conversion moves on-device."""
        image_raw = data_utils.load_image_raw(self.image_paths[index])
        stream_raws = [
            data_utils.load_depth_raw(p[index])[..., None]
            for p in (self.depth_paths, self.response_paths,
                      self.ground_truth_paths, self.lidar_map_paths)]
        cropped = random_crop(
            inputs=[image_raw] + stream_raws, shape=self.shape,
            crop_type=self.random_crop_type, rng=rng)
        if self.transport:
            return (np.ascontiguousarray(cropped[0]),
                    *[_encode_png_int(c[..., 0])[..., None]
                      for c in cropped[1:]])
        image = np.asarray(cropped[0], np.float32)
        streams = [data_utils.depth_from_raw(c[..., 0], data_format='HWC')
                   for c in cropped[1:]]
        return (image, *streams)

    def get_batch(self, indices, rngs, n_threads: int = 8):
        """Batched decode via the native loader (one threaded C++ call per
        stream, outside the GIL), then the same per-sample random crop as
        get(). Identical results for PNG-backed images; JPEG camera frames
        may differ from PIL by a couple of levels (different IDCT).
        Falls back to per-sample get() when native decode is unavailable.
        """
        decoded = _native_batch_decode(
            [self.image_paths[i] for i in indices],
            [[self.depth_paths[i] for i in indices],
             [self.response_paths[i] for i in indices],
             [self.ground_truth_paths[i] for i in indices],
             [self.lidar_map_paths[i] for i in indices]],
            n_threads=n_threads)
        if decoded is None:
            samples = [self.get(int(i), rng)
                       for i, rng in zip(indices, rngs)]
            return tuple(np.stack([s[j] for s in samples], axis=0)
                         for j in range(len(samples[0])))

        images, (depths, responses, gts, lidars) = decoded
        if self.transport:
            images = images.astype(np.uint8)
            depths, responses, gts, lidars = (
                _reencode_depth_stream_u16(s)
                for s in (depths, responses, gts, lidars))
        out = [[], [], [], [], []]
        for b, rng in enumerate(rngs):
            sample = [images[b], depths[b], responses[b], gts[b], lidars[b]]
            if self.do_random_crop:
                sample = random_crop(inputs=sample, shape=self.shape,
                                     crop_type=self.random_crop_type, rng=rng)
            for j, t in enumerate(sample):
                out[j].append(t if self.transport else t.astype(np.float32))
        return tuple(np.stack(ts, axis=0) for ts in out)


class FusionNetInferenceDataset:
    """image/depth/response (+ optional GT) at full resolution
    (reference src/datasets.py:446-527)."""

    def __init__(self, image_paths, depth_paths, response_paths,
                 ground_truth_paths=None, transport: Optional[bool] = None):
        self.n_sample = len(image_paths)
        self.image_paths = image_paths
        self.depth_paths = depth_paths
        self.response_paths = response_paths
        if ground_truth_paths is not None and None not in ground_truth_paths:
            assert self.n_sample == len(ground_truth_paths)
            self.ground_truth_available = True
        else:
            self.ground_truth_available = False
        self.ground_truth_paths = ground_truth_paths
        self.transport = _transport_enabled(transport)

    def __len__(self):
        return self.n_sample

    def get(self, index: int, rng=None):
        if self.transport:
            out = [data_utils.load_image_u8(self.image_paths[index]),
                   data_utils.load_depth_u16(self.depth_paths[index],
                                             data_format='HWC'),
                   data_utils.load_depth_u16(self.response_paths[index],
                                             data_format='HWC')]
            if self.ground_truth_available:
                out.append(data_utils.load_depth_u16(
                    self.ground_truth_paths[index], data_format='HWC'))
            return tuple(out)
        image = data_utils.load_image(self.image_paths[index], normalize=False,
                                      data_format='HWC')
        depth = data_utils.load_depth(self.depth_paths[index], data_format='HWC')
        response = data_utils.load_depth(self.response_paths[index],
                                         data_format='HWC')
        out = [image.astype(np.float32), depth.astype(np.float32),
               response.astype(np.float32)]
        if self.ground_truth_available:
            out.append(data_utils.load_depth(
                self.ground_truth_paths[index], data_format='HWC').astype(np.float32))
        return tuple(out)

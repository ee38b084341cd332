"""Native C++ codec parity with the PIL path (byte-compatible formats)."""

import os

import numpy as np
import pytest

from rcfd_tpu.data import io as data_utils
from rcfd_tpu import native


pytestmark = [
    pytest.mark.smoke,
    pytest.mark.skipif(not native.available(),
                       reason='native toolchain unavailable')]


def test_depth_roundtrip_native_reads_pil(tmp_path, rng):
    depth = (rng.random((40, 60), dtype=np.float32) * 80)
    depth[depth < 40] = 0.0
    path = str(tmp_path / 'd.png')
    data_utils.save_depth(depth, path)  # PIL writer
    pil = data_utils.load_depth(path)
    nat = native.read_depth(path)
    np.testing.assert_array_equal(nat, pil)


def test_depth_roundtrip_pil_reads_native(tmp_path, rng):
    depth = (rng.random((40, 60), dtype=np.float32) * 80)
    path = str(tmp_path / 'd.png')
    native.write_depth(path, depth)
    pil = data_utils.load_depth(path)
    nat = native.read_depth(path)
    np.testing.assert_array_equal(nat, pil)


def test_response_codec(tmp_path, rng):
    response = rng.random((30, 50), dtype=np.float32)
    path = str(tmp_path / 'r.png')
    data_utils.save_response(response, path)
    pil = data_utils.load_response(path)
    nat = native.read_depth(path, multiplier=2 ** 14)
    np.testing.assert_array_equal(nat, pil)


def test_image_decode_png(tmp_path, rng):
    from PIL import Image
    img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    path = str(tmp_path / 'i.png')
    Image.fromarray(img).save(path)
    pil = data_utils.load_image(path)
    nat = native.read_image(path)
    np.testing.assert_array_equal(nat, pil)


def test_image_decode_jpeg(tmp_path, rng):
    from PIL import Image
    img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    path = str(tmp_path / 'i.jpg')
    Image.fromarray(img).save(path, quality=95)
    pil = data_utils.load_image(path)
    nat = native.read_image(path)
    # different IDCT implementations may differ by a couple of levels
    assert np.abs(nat - pil).mean() < 1.0
    assert np.abs(nat - pil).max() <= 16.0


def test_corrupt_jpeg_returns_error_not_abort(tmp_path, rng):
    """libjpeg's default error handler calls exit(); the custom
    error_exit must turn a truncated JPEG into an IOError (from any
    rcfd_batch_read worker thread) instead of killing the process."""
    from PIL import Image
    good = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    good_path = str(tmp_path / 'good.jpg')
    Image.fromarray(good).save(good_path, quality=95)
    bad_path = str(tmp_path / 'bad.jpg')
    with open(bad_path, 'wb') as f:
        f.write(b'\xff\xd8\xff\xe0' + b'\x00' * 64)  # truncated JPEG

    with pytest.raises(IOError):
        native.read_image(bad_path)
    with pytest.raises(IOError):
        native.batch_read_images([good_path, bad_path, good_path], 16, 16,
                                 n_threads=3)
    # the library stays usable afterwards
    np.testing.assert_array_equal(native.read_image(good_path).shape,
                                  (16, 16, 3))


def test_batch_read_depth(tmp_path, rng):
    paths = []
    ref = []
    for i in range(6):
        depth = (rng.random((24, 32), dtype=np.float32) * 70)
        p = str(tmp_path / f'{i}.png')
        data_utils.save_depth(depth, p)
        paths.append(p)
        ref.append(data_utils.load_depth(p))
    batch = native.batch_read_depth(paths, 24, 32, n_threads=3)
    np.testing.assert_array_equal(batch, np.stack(ref))

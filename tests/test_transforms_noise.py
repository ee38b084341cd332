"""Point-noise augmentation gates (radarnet transforms)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.data.transforms import Transforms

pytestmark = pytest.mark.smoke


def _run(noise_type, spread, p, rng):
    t = Transforms(normalized_image_range=[0, 255],
                   random_noise_type=noise_type,
                   random_noise_spread=spread)
    images = jnp.asarray(rng.integers(0, 255, (6, 8, 10, 3)).astype(np.float32))
    points = jnp.asarray(rng.random((6, 4, 3)).astype(np.float32) * 50)
    (imgs,), (pts,) = t.transform(
        jax.random.PRNGKey(0), [images], points_arr=[points],
        random_transform_probability=p)
    return np.asarray(points), np.asarray(pts)


def test_noise_disabled_at_p_zero(rng):
    before, after = _run('gaussian', 2.0, 0.0, rng)
    np.testing.assert_array_equal(before, after)


def test_gaussian_noise_perturbs_gated_samples(rng):
    before, after = _run('gaussian', 2.0, 1.0, rng)
    changed = np.any(before != after, axis=(1, 2))
    assert changed.any()
    # unchanged samples are bit-identical; changed ones moved a plausible
    # amount for sigma=2
    diffs = (after - before)[changed]
    assert np.abs(diffs).max() < 2.0 * 6  # ~6 sigma
    assert np.abs(diffs).std() > 0.5


def test_uniform_noise_bounded(rng):
    before, after = _run('uniform', 3.0, 1.0, rng)
    diffs = after - before
    assert np.abs(diffs).max() <= 1.5 + 1e-5  # spread * U(-0.5, 0.5)


def test_unsupported_noise_type_raises(rng):
    with pytest.raises(ValueError):
        _run('poisson', 1.0, 1.0, rng)

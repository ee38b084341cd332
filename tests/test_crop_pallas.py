"""Pallas batched column-window crop vs numpy slicing (interpret mode)."""

import numpy as np

import jax.numpy as jnp

from rcfd_tpu.ops.crop_pallas import batch_column_crop
import pytest

pytestmark = pytest.mark.smoke


def test_crop_matches_numpy(rng):
    ph, w, c, k, win = 20, 53, 8, 7, 12
    rows = rng.random((ph, w, c), dtype=np.float32)
    starts = rng.integers(0, w, size=(k,)).astype(np.int32)

    out = np.asarray(batch_column_crop(
        jnp.asarray(rows), jnp.asarray(starts), win, interpret=True))

    rows_pad = np.pad(rows, ((0, 0), (0, win + 8), (0, 0)))
    for i in range(k):
        expect = rows_pad[:, starts[i]:starts[i] + win, :]
        np.testing.assert_array_equal(out[i], expect)


def test_crop_clips_out_of_range_starts(rng):
    ph, w, c, win = 8, 24, 4, 6
    rows = rng.random((ph, w, c), dtype=np.float32)
    starts = np.array([-3, w + 10, w], np.int32)
    out = np.asarray(batch_column_crop(
        jnp.asarray(rows), jnp.asarray(starts), win, interpret=True))
    # negative start clips to 0; past-the-end clips to w (all zeros)
    np.testing.assert_array_equal(out[0], rows[:, :win, :])
    assert (out[1] == 0).all()
    assert (out[2] == 0).all()

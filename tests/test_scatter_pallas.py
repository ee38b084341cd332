"""Pallas quasi-dense scatter kernel (interpret mode) vs the XLA version."""

import numpy as np
import pytest

import jax.numpy as jnp

from rcfd_tpu.ops.scatter import scatter_quasi_dense
from rcfd_tpu.ops.scatter_pallas import Q_SCALE, scatter_quasi_dense_pallas


def _case(rng, k=6, h=40, w=64, ph=24, pw=16):
    pad = pw // 2
    crops = rng.random((k, ph, pw), dtype=np.float32)
    x = rng.integers(pad, w + pad, size=(k,)).astype(np.float32)
    z = (rng.random(k, dtype=np.float32) * 70 + 1)
    return crops, x, z


@pytest.mark.smoke
def test_pallas_scatter_matches_xla(rng):
    crops, x, z = _case(rng)
    h, w, ph, pw = 40, 64, 24, 16
    valid = np.ones(len(x), bool)
    d_ref, r_ref = scatter_quasi_dense(
        jnp.asarray(crops), jnp.asarray(x), jnp.asarray(z),
        jnp.asarray(valid), h, w, (ph, pw))
    d_pal, r_pal = scatter_quasi_dense_pallas(
        jnp.asarray(crops), jnp.asarray(x), jnp.asarray(z),
        jnp.asarray(valid), h, w, (ph, pw), interpret=True)
    # response agrees exactly at the PNG codec's 14-bit precision
    np.testing.assert_array_equal(
        np.asarray(r_pal), np.floor(np.asarray(r_ref) * Q_SCALE) / Q_SCALE)
    np.testing.assert_array_equal(np.asarray(d_pal), np.asarray(d_ref))


def test_pallas_scatter_padding_mask(rng):
    crops, x, z = _case(rng, k=5)
    h, w, ph, pw = 40, 64, 24, 16
    valid = np.array([True, True, False, False, True])
    d_ref, _ = scatter_quasi_dense(
        jnp.asarray(crops), jnp.asarray(x), jnp.asarray(z),
        jnp.asarray(valid), h, w, (ph, pw))
    d_pal, _ = scatter_quasi_dense_pallas(
        jnp.asarray(crops), jnp.asarray(x), jnp.asarray(z),
        jnp.asarray(valid), h, w, (ph, pw), interpret=True)
    np.testing.assert_array_equal(np.asarray(d_pal), np.asarray(d_ref))


def test_pallas_scatter_tie_break(rng):
    h, w, ph, pw = 12, 20, 6, 8
    pad = pw // 2
    crops = np.zeros((3, ph, pw), np.float32)
    crops[0, 2, :] = 0.75
    crops[1, 2, :] = 0.75
    crops[2, 2, :] = 0.9
    x = np.array([8.0 + pad, 8.0 + pad, 2.0 + pad], np.float32)
    z = np.array([11.0, 22.0, 33.0], np.float32)
    d, r = scatter_quasi_dense_pallas(
        jnp.asarray(crops), jnp.asarray(x), jnp.asarray(z),
        jnp.ones(3, bool), h, w, (ph, pw), interpret=True)
    d = np.asarray(d)
    # point 2 (stronger response) wins where its window overlaps (cols 4-5);
    # ties between points 0 and 1 (cols 6-11) go to the first index
    row = d[h - ph + 2]
    assert np.all(row[4:6] == 33.0)
    assert np.all(row[6:12] == 11.0)


def test_pallas_scatter_bf16_crops_match_f32(rng):
    """bf16 crops (the serving path) give identical maps to the same values
    presented as f32 — the upcast is exact, winners and codec quantization
    unchanged."""
    crops, x, z = _case(rng)
    h, w, ph, pw = 40, 64, 24, 16
    valid = np.ones(len(x), bool)
    crops_bf16 = jnp.asarray(crops).astype(jnp.bfloat16)
    crops_f32 = crops_bf16.astype(jnp.float32)
    d_a, r_a = scatter_quasi_dense_pallas(
        crops_bf16, jnp.asarray(x), jnp.asarray(z), jnp.asarray(valid),
        h, w, (ph, pw), interpret=True)
    d_b, r_b = scatter_quasi_dense_pallas(
        crops_f32, jnp.asarray(x), jnp.asarray(z), jnp.asarray(valid),
        h, w, (ph, pw), interpret=True)
    np.testing.assert_array_equal(np.asarray(r_a), np.asarray(r_b))
    np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_b))
    assert r_a.dtype == jnp.float32 and d_a.dtype == jnp.float32


def test_xla_scatter_bf16_crops_match_f32(rng):
    crops, x, z = _case(rng)
    h, w, ph, pw = 40, 64, 24, 16
    valid = np.ones(len(x), bool)
    crops_bf16 = jnp.asarray(crops).astype(jnp.bfloat16)
    crops_f32 = crops_bf16.astype(jnp.float32)
    d_a, r_a = scatter_quasi_dense(
        crops_bf16, jnp.asarray(x), jnp.asarray(z), jnp.asarray(valid),
        h, w, (ph, pw))
    d_b, r_b = scatter_quasi_dense(
        crops_f32, jnp.asarray(x), jnp.asarray(z), jnp.asarray(valid),
        h, w, (ph, pw))
    np.testing.assert_array_equal(np.asarray(r_a), np.asarray(r_b))
    np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_b))
    assert r_a.dtype == jnp.float32 and d_a.dtype == jnp.float32

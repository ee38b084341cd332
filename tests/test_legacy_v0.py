"""Legacy v0 capability tests. The reference's own legacy pipeline cannot
run (src/models.py passes list kernel sizes into the current net_utils and
raises TypeError — verified below), so these validate our working
re-implementation against the documented semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.models import legacy_v0

from reference_import import import_reference


def test_reference_legacy_model_is_broken():
    """Documents why bit-parity with the legacy net is impossible: it does
    not construct in the reference tree itself."""
    models = import_reference('models')
    with pytest.raises(TypeError):
        models.FusionNet()


def test_legacy_fusionnet_forward_shapes(rng):
    # latent after 5 stride-2 stages: H/32 x W/32 must equal latent_hw
    h, w = 29 * 32, 10 * 32
    net = legacy_v0.LegacyFusionNet(bias_factor=3.0, latent_hw=(29, 10))
    params, state = jax.eval_shape(net.init, jax.random.PRNGKey(0))
    # small-footprint run instead: use a tiny latent grid
    net = legacy_v0.LegacyFusionNet(bias_factor=3.0, latent_hw=(2, 2))
    params, state = net.init(jax.random.PRNGKey(0))
    image = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    radar = jnp.asarray(rng.random((2, 3)).astype(np.float32))
    logits, _ = net(params, state, image, radar, training=True)
    assert logits.shape == (2, 64, 64, 1)

    # the logit-bias trick shifts outputs by exactly -bias_factor
    net0 = legacy_v0.LegacyFusionNet(bias_factor=0.0, latent_hw=(2, 2))
    logits0, _ = net0(params, state, image, radar, training=True)
    np.testing.assert_allclose(np.asarray(logits0 - logits), 3.0, rtol=1e-5)


def test_log_kernel_matches_reference():
    """The reference's LoG_discrete itself crashes (it feeds python floats
    into torch.exp); evaluate its LoG formula with tensor inputs instead."""
    import torch
    losses = import_reference('losses')
    with pytest.raises(TypeError):
        losses.LoG_discrete(1.0, 5)
    for sigma, n in [(1.0, 5), (1.4, 7)]:
        ours = legacy_v0.log_kernel_discrete(sigma, n)
        for i in range(n):
            for j in range(n):
                ref = losses.LoG(sigma,
                                 torch.tensor(i - (n - 1) / 2),
                                 torch.tensor(j - (n - 1) / 2))
                np.testing.assert_allclose(ours[i, j], float(ref), rtol=1e-5,
                                           atol=1e-7)


def test_crop_on_point(rng):
    b, h, w = 3, 20, 40
    crop_h, crop_w = 12, 8
    pad = crop_w // 2
    images = rng.random((b, h, w, 3)).astype(np.float32)
    labels = rng.random((b, h, w, 1)).astype(np.float32)
    points = np.stack([
        rng.integers(0, w, b).astype(np.float32),
        rng.integers(0, h, b).astype(np.float32),
        rng.random(b).astype(np.float32) * 50], axis=1)

    pts, img_crops, lab_crops = legacy_v0.crop_image_to_shape_on_point(
        jnp.asarray(points), jnp.asarray(images), jnp.asarray(labels),
        crop_h, crop_w)
    assert img_crops.shape == (b, crop_h, crop_w, 3)
    assert np.all(np.asarray(pts)[:, 0] == pad)

    # a crop centered at point x covers padded columns [x, x + 2*pad)
    for i in range(b):
        x = int(points[i, 0])
        padded = np.pad(images[i], ((0, 0), (pad, pad), (0, 0)), mode='edge')
        expected = padded[h - crop_h:, x:x + crop_w]
        np.testing.assert_allclose(np.asarray(img_crops)[i], expected)
        lab_padded = np.pad(labels[i], ((0, 0), (pad, pad), (0, 0)),
                            mode='constant', constant_values=2.0)
        np.testing.assert_allclose(
            np.asarray(lab_crops)[i], lab_padded[h - crop_h:, x:x + crop_w])


def test_register_points_matches_sklearn():
    from sklearn.neighbors import KDTree
    rng = np.random.default_rng(0)
    lx = rng.uniform(-30, 30, 200).astype(np.float32)
    lz = rng.uniform(1, 70, 200).astype(np.float32)
    rx = rng.uniform(-30, 30, 20).astype(np.float32)
    rz = rng.uniform(1, 70, 20).astype(np.float32)
    zs = 0.6
    radius = 0.4

    idx, dist = legacy_v0.register_points(lx, lz, rx, rz, radius=radius,
                                          z_scaling_factor=zs)
    idx, dist = np.asarray(idx), np.asarray(dist)

    tree = KDTree(np.stack([lx, lz * zs], axis=1))
    for i in range(20):
        q = np.array([[rx[i], rz[i] * zs]])
        indices, distances = tree.query_radius(
            q, r=radius, count_only=False, return_distance=True,
            sort_results=True)
        if len(indices[0]) == 0:
            assert idx[i] == -1 and np.isinf(dist[i])
        else:
            assert idx[i] == indices[0][0]
            np.testing.assert_allclose(dist[i], distances[0][0], rtol=1e-5)


def test_three_class_labels():
    gt = jnp.asarray([[0.0, 10.05, 12.0], [9.9, 0.0, 10.39]])
    labels = np.asarray(legacy_v0.three_class_labels(gt, 10.0))
    np.testing.assert_array_equal(
        labels, [[2.0, 1.0, 0.0], [1.0, 2.0, 1.0]])

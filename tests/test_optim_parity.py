"""Optimizer parity: our Adam must track torch.optim.Adam step-for-step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.parallel.optim import adam_step, init_adam

pytestmark = pytest.mark.slow  # CLI/train-loop scale


@pytest.mark.parametrize('weight_decay', [0.0, 0.01])
def test_adam_matches_torch(rng, weight_decay):
    import torch
    w0 = rng.standard_normal((4, 5)).astype(np.float32)
    b0 = rng.standard_normal((5,)).astype(np.float32)
    grads_seq = [
        (rng.standard_normal((4, 5)).astype(np.float32),
         rng.standard_normal((5,)).astype(np.float32))
        for _ in range(5)
    ]
    lr = 1e-3

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.Adam([tw, tb], lr=lr, weight_decay=weight_decay)
    for gw, gb in grads_seq:
        opt.zero_grad()
        tw.grad = torch.from_numpy(gw.copy())
        tb.grad = torch.from_numpy(gb.copy())
        opt.step()

    params = {'w': jnp.asarray(w0), 'b': jnp.asarray(b0)}
    opt_state = init_adam(params)
    for gw, gb in grads_seq:
        grads = {'w': jnp.asarray(gw), 'b': jnp.asarray(gb)}
        params, opt_state = adam_step(params, grads, opt_state, lr,
                                      weight_decay=weight_decay)

    np.testing.assert_allclose(np.asarray(params['w']),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params['b']),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_vertical_flip_transform(rng):
    """vflip path: images/labels/range maps flip on height; boxes get the
    sane y fix-up (the reference's own vflip bbox code indexes a 2-D shape
    into a 3-D tensor and cannot run — src/radarnet_transforms.py:214-220)."""
    import jax
    from rcfd_tpu.data.transforms import Transforms
    t = Transforms(normalized_image_range=[0, 255],
                   random_flip_type=['vertical'])
    n, h, w = 8, 10, 12
    images = jnp.asarray(rng.integers(0, 255, (n, h, w, 3)).astype(np.float32))
    maps = jnp.asarray(rng.random((n, h, w, 1)).astype(np.float32))
    boxes = jnp.asarray(np.tile([2.0, 1.0, 6.0, 9.0], (n, 2, 1)))

    (imgs,), (rmaps,), (bxs,) = t.transform(
        jax.random.PRNGKey(0), [images], range_maps_arr=[maps],
        bounding_boxes_arr=[boxes], random_transform_probability=1.0)
    imgs, rmaps, bxs = np.asarray(imgs), np.asarray(rmaps), np.asarray(bxs)
    base = np.floor(np.asarray(images))

    flipped_any = False
    for b in range(n):
        if np.array_equal(imgs[b], base[b]):
            np.testing.assert_array_equal(bxs[b], np.asarray(boxes)[b])
        else:
            flipped_any = True
            np.testing.assert_array_equal(imgs[b], base[b][::-1])
            np.testing.assert_array_equal(rmaps[b], np.asarray(maps)[b][::-1])
            np.testing.assert_array_equal(bxs[b][:, 1], h - 9.0)
            np.testing.assert_array_equal(bxs[b][:, 3], h - 1.0)
    assert flipped_any

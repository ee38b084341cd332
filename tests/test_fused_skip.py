"""Pool2 -> deconv1 skip-conv fusion (ops/fused_skip.py) equivalence:
the deferred/global-conv formulation must reproduce the materialized
windows + per-window conv composition, and the end-to-end model with
RCFD_FUSED_POOL2 on must match the eager path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.nn import functional as F
from rcfd_tpu.ops.fused_skip import (LazyColumnWindows, _corrections,
                                     _fused_pallas, fused_skip_conv_add)
from rcfd_tpu.ops.roi_pool import roi_pool_column


def _make_case(rng, n=2, k=5, h=64, w=96, c=8, co=6, patch_w=32):
    """Build a real pool2 case through roi_pool_column at scale 1/2."""
    feat = rng.standard_normal((n, h // 2, (w + patch_w) // 2, c),
                               dtype=np.float32)
    # x1 spans the full padded range incl. both edges (0 and max)
    x1 = np.stack([
        np.concatenate([[0.0], rng.uniform(0, w, k - 2), [float(w)]])
        for _ in range(n)]).astype(np.float32)
    out_size = (h // 2, patch_w // 2)
    eager = roi_pool_column(jnp.asarray(feat), jnp.asarray(x1),
                            box_width=patch_w, box_y1=0, box_y2=h,
                            spatial_scale=0.5, output_size=out_size)
    lazy = roi_pool_column(jnp.asarray(feat), jnp.asarray(x1),
                           box_width=patch_w, box_y1=0, box_y2=h,
                           spatial_scale=0.5, output_size=out_size,
                           return_global=True)
    assert isinstance(lazy, LazyColumnWindows)
    w_skip = (rng.standard_normal((3, 3, c, co), dtype=np.float32) * 0.1)
    a = rng.standard_normal(
        (n * k, out_size[0], out_size[1], co), dtype=np.float32)
    y1 = rng.standard_normal(
        (n * k, out_size[0], out_size[1], c), dtype=np.float32)
    w_a = (rng.standard_normal((3, 3, c, co), dtype=np.float32) * 0.1)
    return eager, lazy, jnp.asarray(w_skip), jnp.asarray(a), \
        jnp.asarray(y1), jnp.asarray(w_a)


def test_lazy_materialize_matches_eager(rng):
    eager, lazy, _, _, _, _ = _make_case(rng)
    np.testing.assert_array_equal(np.asarray(lazy.materialize()),
                                  np.asarray(eager))
    assert lazy.shape == eager.shape


@pytest.mark.smoke
def test_fused_xla_matches_composition(rng):
    eager, lazy, w_skip, _, y1, w_a = _make_case(rng)
    ref = F.conv2d(y1, w_a, stride=1) + F.conv2d(eager, w_skip, stride=1)
    out = fused_skip_conv_add(y1, w_a, lazy, w_skip, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_pallas_interpret_via_public_api(rng):
    eager, lazy, w_skip, _, y1, w_a = _make_case(rng)
    ref = F.conv2d(y1, w_a, stride=1) + F.conv2d(eager, w_skip, stride=1)
    out = fused_skip_conv_add(y1, w_a, lazy, w_skip, use_pallas=True,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_pallas_interpret_matches_composition(rng):
    eager, lazy, w_skip, a, _, _ = _make_case(rng)
    ref = a + F.conv2d(eager, w_skip, stride=1)
    cg = F.conv2d(lazy.g, w_skip, stride=1)
    corr_l, corr_r = _corrections(lazy, w_skip)
    out = _fused_pallas(a, cg, lazy, corr_l, corr_r, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.smoke
@pytest.mark.parametrize('scale,out_w', [(0.5, 16), (0.25, 8),
                                         (0.125, 4)])
def test_take_gather_matches_slice(rng, monkeypatch, scale, out_w):
    """The take-based window gather (the round-3 serving default,
    RCFD_POOL_WINDOW_GATHER=take) must be bit-identical to the vmapped
    dynamic_slice form at every constant-bin skip scale."""
    h, w, patch_w, c, k = 64, 96, 32, 6, 5
    feat = jnp.asarray(rng.standard_normal(
        (2, int(h * scale), int((w + patch_w) * scale), c),
        dtype=np.float32))
    x1 = jnp.asarray(np.stack([
        np.concatenate([[0.0], rng.uniform(0, w, k - 2), [float(w)]])
        for _ in range(2)]).astype(np.float32))
    kw = dict(box_width=patch_w, box_y1=0, box_y2=h, spatial_scale=scale,
              output_size=(int(h * scale), out_w))
    ref = roi_pool_column(feat, x1, gather_mode='slice', **kw)
    out = roi_pool_column(feat, x1, gather_mode='take', **kw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_lazy_skip_end_to_end_matches_eager(rng, monkeypatch):
    """Tiny RadarNet forward with the fused pool2 path (XLA fallback on
    CPU) vs the eager pool: responses must agree within float tolerance
    (the fusion is tolerance-level, like RCFD_FAST_DECODER)."""
    from rcfd_tpu.models import RadarNetModel

    kwargs = dict(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(64, 32),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_neurons_encoder_depth=[8, 12, 16, 16, 16],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[16, 12, 8, 8, 8])
    model = RadarNetModel(**kwargs)
    params, state = model.init(jax.random.PRNGKey(0))

    image = jnp.asarray(
        rng.standard_normal((1, 64, 96, 3), dtype=np.float32))
    points = jnp.asarray(np.stack([
        rng.uniform(0, 96, 4), rng.uniform(0, 64, 4),
        rng.uniform(1, 60, 4)], axis=1).astype(np.float32))
    x1 = jnp.asarray(points[None, :, 0])

    from rcfd_tpu.nn.perf import with_perf

    ref, _ = model.apply(params, state, image, points, x1, box_height=64,
                         training=False)
    # fused emission + XLA fallback gather (CPU); fast decoder on so the
    # lazy skip reaches the split-conv path — constructor-level toggles
    # via a config-only copy (with_perf)
    for gather in ('take', 'slice'):
        fused = with_perf(model, model.perf.replace(
            fused_pool2=True, fused_pool2_pallas=False, fast_decoder=True,
            fused_pool2_gather=gather))
        out, _ = fused.apply(params, state, image, points, x1,
                             box_height=64, training=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f'gather={gather}')


def test_fused_xla_take_gather_matches_slice(rng):
    """_fused_xla's take-form window gather (round-4: the in-context
    fusion-loss hypothesis) must be bit-identical to the slice form."""
    import jax.numpy as jnp

    from rcfd_tpu.nn import functional as NF
    from rcfd_tpu.ops.fused_skip import (LazyColumnWindows, _corrections,
                                         _fused_xla)

    n, k, ph, pw, c, co = 2, 5, 12, 8, 6, 4
    wf = 30
    g = jnp.asarray(rng.random((n, ph, wf + pw, c), np.float32))
    g = g.at[:, :, wf:, :].set(0)
    starts = jnp.asarray(rng.integers(0, wf + 1, (n, k)).astype(np.int32))
    lazy = LazyColumnWindows(g, starts, pw)
    w_skip = jnp.asarray(rng.random((3, 3, c, co), np.float32) * 0.1)
    a = jnp.asarray(rng.random((n * k, ph, pw, co), np.float32))

    cg = NF.conv2d(lazy.g, w_skip, stride=1)
    cl, cr = _corrections(lazy, w_skip)
    out_take = _fused_xla(a, cg, lazy, cl, cr, gather='take')
    out_slice = _fused_xla(a, cg, lazy, cl, cr, gather='slice')
    np.testing.assert_array_equal(np.asarray(out_take),
                                  np.asarray(out_slice))


def test_lazy_pool4_end_to_end_matches_eager(rng):
    """fused_pool4 (round 4): defer the 1/4-scale pool to deconv2's
    split-conv gather-add — full-model output must match the eager pool
    within float tolerance, for both window-gather forms."""
    from rcfd_tpu.models import RadarNetModel
    from rcfd_tpu.nn.perf import with_perf

    kwargs = dict(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(64, 32),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_neurons_encoder_depth=[8, 12, 16, 16, 16],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[16, 12, 8, 8, 8])
    model = RadarNetModel(**kwargs)
    params, state = model.init(jax.random.PRNGKey(0))

    image = jnp.asarray(
        rng.standard_normal((1, 64, 96, 3), dtype=np.float32))
    points = jnp.asarray(np.stack([
        rng.uniform(0, 96, 4), rng.uniform(0, 64, 4),
        rng.uniform(1, 60, 4)], axis=1).astype(np.float32))
    x1 = jnp.asarray(points[None, :, 0])

    ref, _ = model.apply(params, state, image, points, x1, box_height=64,
                         training=False)
    for gather in ('take', 'slice'):
        fused = with_perf(model, model.perf.replace(
            fused_pool2=True, fused_pool4=True, fused_pool2_pallas=False,
            fast_decoder=True, fused_pool2_gather=gather))
        out, _ = fused.apply(params, state, image, points, x1,
                             box_height=64, training=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=f'gather={gather}')
    # fast decoder OFF: the lazy skips must materialize to the exact pool
    fused_nofast = with_perf(model, model.perf.replace(
        fused_pool2=True, fused_pool4=True, fast_decoder=False))
    out, _ = fused_nofast.apply(params, state, image, points, x1,
                                box_height=64, training=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

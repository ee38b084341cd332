"""PerfConfig: the constructor-threaded performance gates (round 4).

Pins the contract that replaced the round-3 env-var trace-time gates:
env vars are read exactly once (from_env, at construction), gates are
immutable fields, and with_perf re-perfs a module tree without touching
the original.
"""

import numpy as np
import pytest

from rcfd_tpu.nn.perf import PerfConfig, with_perf


@pytest.mark.smoke
def test_from_env_reads_all_gates(monkeypatch):
    for k in ['RCFD_FAST_DECODER', 'RCFD_FAST_MAX_WIDTH',
              'RCFD_FUSED_UPSAMPLE', 'RCFD_FUSED_POOL2',
              'RCFD_FUSED_POOL2_PALLAS', 'RCFD_FUSED_POOL2_GATHER',
              'RCFD_INT8_TAIL', 'RCFD_PACKED_DECONV1', 'RCFD_PACKED_TAIL',
              'RCFD_POOL_WINDOW_GATHER', 'RCFD_PALLAS_CROP',
              'RCFD_PALLAS_SCATTER', 'RCFD_DECODE_CHUNKS',
              'RCFD_S2D_INPUT', 'RCFD_S2D_FACTOR']:
        monkeypatch.delenv(k, raising=False)

    d = PerfConfig.from_env()
    assert d == PerfConfig()  # clean env == defaults

    monkeypatch.setenv('RCFD_FAST_DECODER', '0')
    monkeypatch.setenv('RCFD_FAST_MAX_WIDTH', '1600')
    monkeypatch.setenv('RCFD_FUSED_POOL2', '1')
    monkeypatch.setenv('RCFD_FUSED_POOL2_GATHER', 'slice')
    monkeypatch.setenv('RCFD_PACKED_TAIL', '0')
    monkeypatch.setenv('RCFD_POOL_WINDOW_GATHER', 'slice')
    monkeypatch.setenv('RCFD_PALLAS_SCATTER', '1')
    monkeypatch.setenv('RCFD_DECODE_CHUNKS', '2')
    monkeypatch.setenv('RCFD_S2D_INPUT', '1')
    monkeypatch.setenv('RCFD_S2D_FACTOR', '2')
    c = PerfConfig.from_env()
    assert c.s2d_input is True
    assert c.s2d_factor == 2
    assert c.fast_decoder is False
    assert c.fast_max_width == 1600
    assert c.fused_pool2 is True
    assert c.fused_pool2_gather == 'slice'
    assert c.packed_tail is False
    assert c.pool_window_gather == 'slice'
    assert c.pallas_scatter is True
    assert c.decode_chunks == 2
    # explicit overrides win over env
    assert PerfConfig.from_env(fast_max_width=256).fast_max_width == 256


@pytest.mark.smoke
def test_validation_and_resolved_views():
    with pytest.raises(ValueError):
        PerfConfig(pool_window_gather='gather')
    with pytest.raises(ValueError):
        PerfConfig(fused_pool2_gather='bogus')
    with pytest.raises(ValueError):
        PerfConfig(s2d_factor=3)
    c = PerfConfig()
    assert c.fast_max_width_resolved() == 256
    assert c.replace(fast_max_width=1600).fast_max_width_resolved() == 1600
    # backend defaults resolve on CPU test env
    assert PerfConfig(fast_decoder=True).fast_decoder_enabled() is True
    assert PerfConfig(fast_decoder=False).fast_decoder_enabled() is False
    assert PerfConfig().fast_decoder_enabled() is False  # cpu backend
    # immutability
    with pytest.raises(Exception):
        c.packed_tail = False


@pytest.mark.smoke
def test_with_perf_reperfs_copy_only(monkeypatch):
    monkeypatch.delenv('RCFD_FAST_MAX_WIDTH', raising=False)
    from rcfd_tpu.models import RadarNetModel

    model = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(32, 32),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[4, 8, 8, 8, 8],
        n_neurons_encoder_depth=[4, 8, 8, 8, 8],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[8, 8, 8, 8, 8])
    new = model.perf.replace(fast_max_width=1600, fused_pool2=True)
    copy = with_perf(model, new)
    # every perf-carrying node in the copy got the new config…
    assert copy.perf is new
    assert copy.encoder.perf is new
    assert copy.decoder.perf is new
    for name, block in copy.decoder.children.items():
        if hasattr(block, 'perf'):
            assert block.perf is new, name
    # …and the original tree is untouched
    assert model.perf.fast_max_width is None
    assert model.decoder.children['deconv1'].perf.fast_max_width is None
    # same weights apply to both (config-only copy)
    import jax
    import jax.numpy as jnp
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 32, 96 + 32, 3), np.float32))
    pts = jnp.asarray(rng.random((2, 3), np.float32) * 20)
    x1 = jnp.asarray(rng.integers(0, 96, (1, 2)).astype(np.float32))
    out_a, _ = model.apply(params, state, img, pts, x1, box_height=32,
                           training=False)
    out_b, _ = copy.apply(params, state, img, pts, x1, box_height=32,
                          training=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-6, atol=1e-6)

@pytest.mark.smoke
def test_from_env_flag_semantics(monkeypatch):
    """Truthy strings enable, common falsy strings DISABLE (round-4
    advisor finding: `v != '0'` made 'off'/'false'/'no' silently turn
    gates ON — for RCFD_INT8_TAIL that's an accuracy hazard), empty
    string = unset, unrecognized values raise."""
    for name, attr in [('RCFD_PACKED_TAIL', 'packed_tail'),
                       ('RCFD_FAST_DECODER', 'fast_decoder'),
                       ('RCFD_FUSED_POOL2', 'fused_pool2'),
                       ('RCFD_INT8_TAIL', 'int8_tail')]:
        for truthy in ('1', 'true', 'on', 'yes', 'TRUE', 'On'):
            monkeypatch.setenv(name, truthy)
            assert getattr(PerfConfig.from_env(), attr) is True, (name,
                                                                  truthy)
        for falsy in ('0', 'false', 'off', 'no', 'FALSE', 'Off'):
            monkeypatch.setenv(name, falsy)
            assert getattr(PerfConfig.from_env(), attr) is False, (name,
                                                                   falsy)
        monkeypatch.setenv(name, 'bogus')
        with pytest.raises(ValueError):
            PerfConfig.from_env()
        monkeypatch.delenv(name)
    # empty string behaves as unset (defaults)
    monkeypatch.setenv('RCFD_PACKED_TAIL', '')
    assert PerfConfig.from_env().packed_tail is True
    monkeypatch.setenv('RCFD_FAST_DECODER', '')
    assert PerfConfig.from_env().fast_decoder is None

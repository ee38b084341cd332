"""run_radarnet / run_fusionnet production passes (save_outputs, no
ground truth) take the codec-grid D2H path (uint16 on device); their
PNG artifacts must be byte-identical to the eval pass's float32 path.
Eval availability may only change metrics, never output files."""

import hashlib
import os

import numpy as np
import pytest

import jax

from fixtures import make_fusionnet_fixture, make_radarnet_fixture
from rcfd_tpu import fusionnet_main, radarnet_main
from rcfd_tpu.models import FusionNetModel, RadarNetModel

pytestmark = pytest.mark.slow  # two full run() passes per model


def _hash_dir(d):
    out = {}
    for root, _, files in os.walk(d):
        for f in sorted(files):
            if f.endswith('.png'):
                with open(os.path.join(root, f), 'rb') as fh:
                    out[(os.path.basename(root), f)] = \
                        hashlib.sha1(fh.read()).hexdigest()
    return out


def test_run_radarnet_codec_outputs_identical(tmp_path):
    manifests = make_radarnet_fixture(str(tmp_path / 'data'), n_samples=2,
                                      height=64, width=96, n_points=6)
    model = RadarNetModel(
        input_channels_image=3, input_channels_depth=3,
        input_patch_size_image=(64, 32),
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_neurons_encoder_depth=[8, 12, 16, 16, 16],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[16, 12, 8, 8, 8])
    params, state = model.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / 'rn-1.npz')
    model.save_checkpoint(ckpt, params, state, step=1)

    kwargs = dict(
        restore_path=ckpt,
        image_path=manifests['image'], radar_path=manifests['radar'],
        patch_size=(64, 32), input_channels_image=3, input_channels_depth=3,
        normalized_image_range=[0, 1],
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_neurons_encoder_depth=[8, 12, 16, 16, 16],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[16, 12, 8, 8, 8],
        weight_initializer='kaiming_uniform',
        activation_func='leaky_relu',
        save_outputs=True, keep_input_filenames=False, verbose=False,
        max_points_inference=8, eval_batch_size=2)

    radarnet_main.run(ground_truth_path=None,
                      output_dirpath=str(tmp_path / 'out_codec'), **kwargs)
    radarnet_main.run(ground_truth_path=manifests['ground_truth'],
                      output_dirpath=str(tmp_path / 'out_f32'), **kwargs)

    h_codec = _hash_dir(str(tmp_path / 'out_codec' / 'output_depth_radar'))
    h_f32 = _hash_dir(str(tmp_path / 'out_f32' / 'output_depth_radar'))
    assert h_codec and h_codec == h_f32
    h_codec = _hash_dir(str(tmp_path / 'out_codec' / 'output_response_radar'))
    h_f32 = _hash_dir(str(tmp_path / 'out_f32' / 'output_response_radar'))
    assert h_codec and h_codec == h_f32


def test_run_fusionnet_codec_outputs_identical(tmp_path):
    manifests = make_fusionnet_fixture(str(tmp_path / 'data'), n_samples=2,
                                       height=32, width=48)
    model = FusionNetModel(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=1,
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_filters_encoder_depth=[4, 6, 8, 8, 8],
        n_filters_decoder=[16, 12, 8, 8, 8],
        min_predict_depth=1.0, max_predict_depth=100.0)
    params, state = model.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / 'fn-1.npz')
    model.save_checkpoint(ckpt, params, state, step=1)

    kwargs = dict(
        restore_path=ckpt,
        image_path=manifests['image'], depth_path=manifests['depth'],
        response_path=manifests['response'],
        input_channels_image=3, input_channels_depth=2,
        normalized_image_range=[0, 1],
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_filters_encoder_depth=[4, 6, 8, 8, 8],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[16, 12, 8, 8, 8],
        n_resolutions_decoder=1,
        min_predict_depth=1.0, max_predict_depth=100.0,
        weight_initializer='kaiming_uniform',
        activation_func='leaky_relu',
        save_outputs=True, keep_input_filenames=False, verbose=False,
        eval_batch_size=2)

    fusionnet_main.run(ground_truth_path=None,
                       output_dirpath=str(tmp_path / 'out_codec'), **kwargs)
    fusionnet_main.run(ground_truth_path=manifests['ground_truth'],
                       output_dirpath=str(tmp_path / 'out_f32'), **kwargs)

    h_codec = _hash_dir(str(tmp_path / 'out_codec' / 'output_depth_fusion'))
    h_f32 = _hash_dir(str(tmp_path / 'out_f32' / 'output_depth_fusion'))
    assert h_codec and h_codec == h_f32

"""End-to-end train/validate/run smoke tests on a tiny synthetic fixture,
exercising the 8-virtual-device data-parallel mesh (the TPU-native
replacement for torch DataParallel)."""

import os

import numpy as np
import pytest

import jax

from fixtures import make_fusionnet_fixture, make_radarnet_fixture

from rcfd_tpu import fusionnet_main, radarnet_main

pytestmark = pytest.mark.slow  # CLI/train-loop scale


def test_fusionnet_train_and_run(tmp_path):
    manifests = make_fusionnet_fixture(str(tmp_path / 'data'), n_samples=8)
    ckpt_dir = str(tmp_path / 'ckpt')

    common_net = dict(
        input_channels_image=3,
        input_channels_depth=2,
        normalized_image_range=[0, 1],
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_filters_encoder_depth=[4, 6, 8, 8, 8],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[16, 12, 8, 8, 8],
        n_resolutions_decoder=1,
        min_predict_depth=1.0,
        max_predict_depth=100.0,
        weight_initializer='kaiming_uniform',
        activation_func='leaky_relu',
    )

    best = fusionnet_main.train(
        train_image_path=manifests['image'],
        train_depth_path=manifests['depth'],
        train_response_path=manifests['response'],
        train_ground_truth_path=manifests['ground_truth'],
        train_lidar_map_path=manifests['lidar'],
        val_image_path=manifests['image'],
        val_depth_path=manifests['depth'],
        val_response_path=manifests['response'],
        val_ground_truth_path=manifests['ground_truth'],
        batch_size=8,
        n_height=32,
        n_width=32,
        learning_rates=[1e-3],
        learning_schedule=[2],
        loss_func='l1',
        w_smoothness=0.1,
        w_lidar_loss=2.0,
        w_weight_decay=0.0,
        loss_smoothness_kernel_size=-1,
        outlier_removal_kernel_size=7,
        outlier_removal_threshold=1.5,
        ground_truth_dilation_kernel_size=-1,
        augmentation_probabilities=[1.0],
        augmentation_schedule=[-1],
        augmentation_random_crop_type=['horizontal', 'vertical'],
        augmentation_random_brightness=[0.8, 1.2],
        augmentation_random_contrast=[0.8, 1.2],
        augmentation_random_saturation=[0.8, 1.2],
        augmentation_random_flip_type=['horizontal'],
        min_evaluate_depth=0.0,
        max_evaluate_depth=80.0,
        checkpoint_dirpath=ckpt_dir,
        n_step_per_checkpoint=2,
        n_step_per_summary=2,
        start_step_validation=1,
        restore_path=None,
        n_thread=2,
        seed=0,
        **common_net)

    assert np.isfinite(best['mae'])
    ckpts = [f for f in os.listdir(ckpt_dir) if f.endswith('.pth')]
    assert len(ckpts) >= 1
    assert os.path.exists(os.path.join(ckpt_dir, 'results.txt'))

    # resume from checkpoint (weights + optimizer state round-trip)
    restore = os.path.join(ckpt_dir, sorted(ckpts)[-1])
    out_dir = str(tmp_path / 'out')
    results = fusionnet_main.run(
        restore_path=restore,
        image_path=manifests['image'],
        depth_path=manifests['depth'],
        response_path=manifests['response'],
        ground_truth_path=manifests['ground_truth'],
        output_dirpath=out_dir,
        save_outputs=True,
        keep_input_filenames=False,
        verbose=False,
        min_evaluate_depth=0.0,
        max_evaluate_depth=80.0,
        **common_net)
    assert results is not None and np.isfinite(results['mae'])
    assert os.path.exists(os.path.join(out_dir, 'output_depth_fusion',
                                       '0000000000.png'))


def test_radarnet_train_and_run(tmp_path):
    manifests = make_radarnet_fixture(str(tmp_path / 'data'), n_samples=8)
    ckpt_dir = str(tmp_path / 'ckpt')

    common_net = dict(
        input_channels_image=3,
        input_channels_depth=3,
        normalized_image_range=[0, 1],
        encoder_type='radarnetv1_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_neurons_encoder_depth=[8, 12, 16, 16, 16],
        decoder_type='multiscale_batch_norm',
        n_filters_decoder=[16, 12, 8, 8, 8],
        weight_initializer='kaiming_uniform',
        activation_func='leaky_relu',
    )
    patch_size = [64, 32]

    best = radarnet_main.train(
        train_image_path=manifests['image'],
        train_radar_path=manifests['radar'],
        train_ground_truth_path=manifests['ground_truth'],
        val_image_path=manifests['image'],
        val_radar_path=manifests['radar'],
        val_ground_truth_path=manifests['ground_truth'],
        batch_size=8,
        patch_size=patch_size,
        total_points_sampled=2,
        sample_probability_of_lidar=0.5,
        learning_rates=[2e-4],
        learning_schedule=[2],
        augmentation_probabilities=[1.0],
        augmentation_schedule=[-1],
        augmentation_random_brightness=[0.8, 1.2],
        augmentation_random_contrast=[0.8, 1.2],
        augmentation_random_saturation=[0.8, 1.2],
        augmentation_random_noise_type='none',
        augmentation_random_noise_spread=-1,
        augmentation_random_flip_type=['horizontal'],
        w_weight_decay=0.0,
        w_positive_class=2.0,
        max_distance_correspondence=0.4,
        set_invalid_to_negative_class=True,
        checkpoint_dirpath=ckpt_dir,
        n_step_per_checkpoint=2,
        n_step_per_summary=2,
        start_step_validation=1,
        restore_path=None,
        min_evaluate_depth=0.0,
        max_evaluate_depth=100.0,
        n_thread=2,
        max_points_inference=16,
        seed=0,
        **common_net)

    ckpts = [f for f in os.listdir(ckpt_dir) if f.endswith('.pth')]
    assert len(ckpts) >= 1

    restore = os.path.join(ckpt_dir, sorted(ckpts)[-1])
    out_dir = str(tmp_path / 'out')
    results, depth_paths, response_paths = radarnet_main.run(
        restore_path=restore,
        image_path=manifests['image'],
        radar_path=manifests['radar'],
        ground_truth_path=manifests['ground_truth'],
        patch_size=patch_size,
        output_dirpath=out_dir,
        save_outputs=True,
        keep_input_filenames=False,
        verbose=False,
        min_evaluate_depth=0.0,
        max_evaluate_depth=100.0,
        max_points_inference=16,
        **common_net)
    assert len(depth_paths) == 8
    assert os.path.exists(depth_paths[0])

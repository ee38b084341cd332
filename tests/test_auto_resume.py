"""Elastic-recovery story: training resumes from --restore_path latest with
the step counter, weights and optimizer state carried over."""

import os

import numpy as np
import pytest

from fixtures import make_fusionnet_fixture

from rcfd_tpu import fusionnet_main

pytestmark = pytest.mark.slow  # CLI/train-loop scale

NET = dict(
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
    activation_func='leaky_relu')

TRAIN = dict(
    batch_size=8,
    n_height=32,
    n_width=32,
    learning_rates=[1e-3],
    loss_func='l1',
    w_smoothness=0.0,
    w_lidar_loss=0.0,
    w_weight_decay=0.0,
    loss_smoothness_kernel_size=-1,
    outlier_removal_kernel_size=-1,
    outlier_removal_threshold=-1,
    ground_truth_dilation_kernel_size=-1,
    augmentation_probabilities=[0.0],
    augmentation_schedule=[-1],
    augmentation_random_crop_type=['none'],
    augmentation_random_brightness=[-1, -1],
    augmentation_random_contrast=[-1, -1],
    augmentation_random_saturation=[-1, -1],
    augmentation_random_flip_type=['none'],
    min_evaluate_depth=0.0,
    max_evaluate_depth=80.0,
    n_step_per_checkpoint=1,
    n_step_per_summary=100,
    start_step_validation=10 ** 9,  # skip validation for speed
    n_thread=2,
    seed=0)


def test_restore_latest_continues_training(tmp_path):
    manifests = make_fusionnet_fixture(str(tmp_path / 'data'), n_samples=8,
                                       height=32, width=32)
    data = dict(
        train_image_path=manifests['image'],
        train_depth_path=manifests['depth'],
        train_response_path=manifests['response'],
        train_ground_truth_path=manifests['ground_truth'],
        train_lidar_map_path=manifests['lidar'],
        val_image_path=manifests['image'],
        val_depth_path=manifests['depth'],
        val_response_path=manifests['response'],
        val_ground_truth_path=manifests['ground_truth'])
    ckpt_dir = str(tmp_path / 'ckpt')

    fusionnet_main.train(checkpoint_dirpath=ckpt_dir, restore_path=None,
                         learning_schedule=[1], **data, **NET, **TRAIN)
    first_run = {f for f in os.listdir(ckpt_dir) if f.endswith('.pth')}
    assert 'model-1.pth' in first_run

    fusionnet_main.train(checkpoint_dirpath=ckpt_dir, restore_path='latest',
                         learning_schedule=[1], **data, **NET, **TRAIN)
    second_run = {f for f in os.listdir(ckpt_dir) if f.endswith('.pth')}
    # resumed at the carried-over step counter: new checkpoints continue
    # past the first run's steps (1 epoch of 1 batch -> model-2.pth)
    assert 'model-2.pth' in second_run

    results = open(os.path.join(ckpt_dir, 'results.txt')).read()
    assert 'Auto-resume from' in results

#!/bin/bash
# RadarNet eval protocol: intersection metrics, depth in (0, 100) m.

python run_radarnet.py \
--restore_path trained_radarnet/radarnetv1_tpu/model-best.pth \
--image_path validation/nuscenes/nuscenes_val_image.txt \
--radar_path validation/nuscenes/nuscenes_val_radar.txt \
--ground_truth_path validation/nuscenes/nuscenes_val_ground_truth.txt \
--patch_size 900 288 \
--input_channels_image 3 \
--input_channels_depth 3 \
--normalized_image_range 0 1 \
--encoder_type radarnetv1 batch_norm \
--n_filters_encoder_image 32 64 128 128 128 \
--n_neurons_encoder_depth 32 64 128 128 128 \
--decoder_type multiscale batch_norm \
--n_filters_decoder 256 128 64 32 16 \
--weight_initializer kaiming_uniform \
--activation_func leaky_relu \
--output_dirpath trained_radarnet/radarnetv1_tpu/evaluation_results \
--save_outputs \
--keep_input_filenames \
--verbose \
--min_evaluate_depth 0.0 \
--max_evaluate_depth 100.0

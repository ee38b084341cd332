#!/bin/bash
# Stage 1.5 bridge: RadarNet over train+val manifests.

python setup/setup_dataset_nuscenes_radarnet.py \
--restore_path trained_radarnet/radarnetv1_tpu/model-best.pth \
--train_image_path training/nuscenes/nuscenes_train_image.txt \
--train_radar_path training/nuscenes/nuscenes_train_radar.txt \
--train_ground_truth_path training/nuscenes/nuscenes_train_ground_truth.txt \
--val_image_path validation/nuscenes/nuscenes_val_image.txt \
--val_radar_path validation/nuscenes/nuscenes_val_radar.txt \
--val_ground_truth_path validation/nuscenes/nuscenes_val_ground_truth.txt \
--output_dirpath data/nuscenes_derived \
--verbose

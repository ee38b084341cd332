#!/bin/bash
python setup/setup_dataset_nuscenes_radarnet_test.py \
--restore_path trained_radarnet/radarnetv1_tpu/model-best.pth \
--test_image_path testing/nuscenes/nuscenes_test_image.txt \
--test_radar_path testing/nuscenes/nuscenes_test_radar.txt \
--output_dirpath data/nuscenes_derived_test \
--verbose

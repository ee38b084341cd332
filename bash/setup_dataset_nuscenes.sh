#!/bin/bash
# Stage-0 preprocessing (dense-GT variant, like the reference's canonical
# bash/setup_dataset_nuscenes.sh): +-80 lidar sweeps, panoptic mover masks.

python setup/setup_dataset_nuscenes_with_denseGT.py \
--nuscenes_data_root_dirpath data/nuscenes \
--nuscenes_data_derived_dirpath data/nuscenes_derived \
--n_forward_frames_to_reproject 80 \
--n_backward_frames_to_reproject 80 \
--panoptic_seg_dirpath data/nuscenes_panoptic \
--n_thread 40

#!/bin/bash
python setup/gen_panoptic_seg.py \
--nuscenes_data_root_dirpath data/nuscenes \
--panoptic_seg_dirpath data/nuscenes_panoptic

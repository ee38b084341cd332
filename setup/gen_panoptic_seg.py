"""Generate panoptic mover masks for every CAM_FRONT frame (TPU-side port
of reference setup/gen_panoptic_seg.py).

Output contract (consumed by setup_dataset_nuscenes_with_denseGT.py and
rcfd_tpu.geometry.nuscenes_adapter.load_panoptic_mask):
  <output_dirpath>/<camera_sample_data_token>.npy
  boolean H x W array, True where a pixel belongs to a MOVER — the COCO
  "thing" classes 0-8 (person, bicycle, car, motorcycle, airplane, bus,
  train, truck, boat) of a Panoptic FPN R101 model
  (reference setup/gen_panoptic_seg.py:71-81).

The segmentation model itself is an external dependency (the reference
uses detectron2's COCO-PanopticSegmentation/panoptic_fpn_R_101_3x): this
script gates on detectron2 and otherwise documents the mask contract so
masks produced by any segmenter can be dropped in.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MOVER_THING_IDS = set(range(0, 9))  # person .. boat (COCO thing ids 0-8)


def build_predictor(device='cuda'):
    try:
        from detectron2 import model_zoo
        from detectron2.config import get_cfg
        from detectron2.engine import DefaultPredictor
    except ImportError as e:
        raise ImportError(
            'detectron2 is required to GENERATE panoptic masks; masks from '
            'any segmenter matching the documented .npy contract work too.'
        ) from e
    cfg = get_cfg()
    config = 'COCO-PanopticSegmentation/panoptic_fpn_R_101_3x.yaml'
    cfg.merge_from_file(model_zoo.get_config_file(config))
    cfg.MODEL.WEIGHTS = model_zoo.get_checkpoint_url(config)
    cfg.MODEL.DEVICE = device
    return DefaultPredictor(cfg)


def mover_mask_from_panoptic(panoptic_seg, segments_info) -> np.ndarray:
    """Boolean mask of mover 'thing' segments (ids 0-8)."""
    seg = panoptic_seg.to('cpu').numpy() if hasattr(panoptic_seg, 'to') \
        else np.asarray(panoptic_seg)
    mask = np.zeros(seg.shape, bool)
    for info in segments_info:
        if info.get('isthing', False) and \
                info.get('category_id', -1) in MOVER_THING_IDS:
            mask |= (seg == info['id'])
    return mask


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--nuscenes_data_root_dirpath', type=str, required=True)
    parser.add_argument('--version', type=str, default='v1.0-trainval')
    parser.add_argument('--panoptic_seg_dirpath', type=str, required=True)
    parser.add_argument('--device', type=str, default='cuda')
    parser.add_argument('--debug', action='store_true')
    args = parser.parse_args()

    import cv2
    from nuscenes.nuscenes import NuScenes

    nusc = NuScenes(version=args.version,
                    dataroot=args.nuscenes_data_root_dirpath, verbose=False)
    predictor = build_predictor(args.device)
    os.makedirs(args.panoptic_seg_dirpath, exist_ok=True)

    scenes = nusc.scene[:1] if args.debug else nusc.scene
    for scene in scenes:
        sample_token = scene['first_sample_token']
        while sample_token != '':
            sample = nusc.get('sample', sample_token)
            # walk the full CAM_FRONT sample_data chain (keyframes + sweeps)
            sd = nusc.get('sample_data', sample['data']['CAM_FRONT'])
            image = cv2.imread(os.path.join(nusc.dataroot, sd['filename']))
            panoptic_seg, segments_info = predictor(image)['panoptic_seg']
            mask = mover_mask_from_panoptic(panoptic_seg, segments_info)
            np.save(os.path.join(args.panoptic_seg_dirpath,
                                 sd['token'] + '.npy'), mask)
            sample_token = sample['next']
        print('scene {} done'.format(scene['name']))


if __name__ == '__main__':
    main()

"""CLI: legacy v0 training from single-pickle Data_Struct manifests
(drop-in for reference src/save_depth_radar.py).

The reference entry point (src/save_depth_radar.py:42-80) is bit-rotted:
it calls main.train(path_to_pickle_file_train=...) against a signature
that only accepts gt_train_paths/... (src/main.py:26-31), so it raises
TypeError on every invocation — as does bash/train_nuscenes.sh, which
passes the same single-pickle flags to src/train.py. What the pair
*specifies* is the manifest contract: one pickled dict of Data_Struct
records per split (scene_id, sample_idx, image_path, radar points,
label/depth paths — the format setup/data_gen.py writes). This port
honors that contract by unpacking each record's label + radar paths and
driving the working legacy trainer (rcfd_tpu.legacy_main.train), instead
of reproducing the crash.
"""

import argparse
import os
import pickle
import tempfile

from rcfd_tpu import legacy_main


def unpack_data_struct_manifest(pickle_path, materialize_dirpath=None,
                                materialize_prefix=''):
    """Single Data_Struct-dict pickle -> (gt_label_paths, radar_paths).

    Accepts dicts of records (setup/data_gen.py's output) or lists of
    records. The reference's data_gen_{train,val,test}.py all store
    data_dict[(scene_id, sample_id)] = [data_item] — a ONE-ELEMENT LIST
    per key (reference setup/data_gen_train.py:1211-1212) — so each value
    is unwrapped first. Records may be NamedTuples or plain tuples in
    either reference field order:
      train (6 fields, data_gen_train.py:42-48):  scene_id, sample_idx,
        image_path, input_points(path), label_path, depth_path
      val/test (7 fields, data_gen_val.py:42-49): scene_id, sample_idx,
        image_path, ground_truth_points(ndarray), input_points(ndarray),
        label_path, depth_path
    val/test radar entries are in-memory arrays; they are saved to
    ``materialize_dirpath`` as .npy files so the path-based legacy
    datasets can load them. Distinct manifests sharing one
    ``materialize_dirpath`` must pass distinct ``materialize_prefix``
    values — filenames are otherwise keyed only by record index and the
    second call would overwrite the first call's arrays.
    """
    import numpy as np
    with open(pickle_path, 'rb') as f:
        manifest = pickle.load(f)
    records = (list(manifest.values()) if isinstance(manifest, dict)
               else list(manifest))
    gt_paths, radar_paths = [], []
    for i, rec in enumerate(records):
        # data_gen wraps each record in a one-element list; a real record
        # has >= 6 fields so an accidental unwrap of a field-tuple is
        # impossible at length 1.
        if isinstance(rec, (list, tuple)) and len(rec) == 1:
            rec = rec[0]
        if hasattr(rec, 'ground_truth_label_path'):
            gt_paths.append(rec.ground_truth_label_path)
            radar = getattr(rec, 'radar_points_path',
                            getattr(rec, 'input_points', None))
        elif len(rec) >= 7:
            gt_paths.append(rec[5])
            radar = rec[4]
        else:
            gt_paths.append(rec[4])
            radar = rec[3]
        if isinstance(radar, np.ndarray):
            if materialize_dirpath is None:
                raise ValueError(
                    'manifest stores in-memory radar arrays but no '
                    'materialize_dirpath was given')
            radar_path = os.path.join(
                materialize_dirpath,
                f'{materialize_prefix}radar_points_{i}.npy')
            np.save(radar_path, radar)
            radar = radar_path
        radar_paths.append(radar)
    return gt_paths, radar_paths


def _as_path_pickle(paths, tmpdir, name):
    out = os.path.join(tmpdir, name)
    with open(out, 'wb') as f:
        pickle.dump(paths, f)
    return out


parser = argparse.ArgumentParser()

# Training and validation input filepaths (the single-pickle flavor,
# reference src/save_depth_radar.py:21-25)
parser.add_argument('--path_to_pickle_file_train', type=str, required=True,
                    help='pickled dict of Data_Struct records (train)')
parser.add_argument('--path_to_pickle_file_val', type=str, required=True,
                    help='pickled dict of Data_Struct records (val)')
parser.add_argument('--data_path', type=str, default='')
parser.add_argument('--image_path', type=str, required=True)
parser.add_argument('--epsilon', type=float, default=0.4)
# Input settings
parser.add_argument('--batch_size', type=int, default=64)
parser.add_argument('--patch_size', nargs='+', type=int, default=[900, 60])
parser.add_argument('--normalized_image_range', nargs='+', type=float,
                    default=[0, 1])
# Training settings (defaults = bash/train_nuscenes.sh values)
parser.add_argument('--learning_rates', nargs='+', type=float,
                    default=[5e-5, 1e-4, 2e-4, 1e-4, 5e-5])
parser.add_argument('--learning_schedule', nargs='+', type=int,
                    default=[2, 5, 10, 12, 15])
parser.add_argument('--augmentation_probabilities', nargs='+', type=float,
                    default=[1.0])
parser.add_argument('--augmentation_schedule', nargs='+', type=int,
                    default=[-1])
parser.add_argument('--augmentation_random_brightness', nargs='+',
                    type=float, default=[-1, -1])
parser.add_argument('--augmentation_random_noise_type', type=str,
                    default='none')
parser.add_argument('--augmentation_random_noise_spread', type=float,
                    default=0.0)
parser.add_argument('--augmentation_random_flip_type', nargs='+', type=str,
                    default=['none'])
# Loss settings
parser.add_argument('--w_cross_entropy', type=float, default=1.0)
parser.add_argument('--w_smoothness', type=float, default=1e-7)
parser.add_argument('--w_weight_decay', type=float, default=0.0)
parser.add_argument('--kernel_size_smoothness', nargs='+', type=int,
                    default=[11, 3])
parser.add_argument('--set_invalid_to_negative', action='store_true')
parser.add_argument('--w_positive_class', type=float, default=1.0)
# Checkpoint settings
parser.add_argument('--checkpoint_dirpath', type=str, required=True)
parser.add_argument('--num_step_per_checkpoint', type=int, default=5000)
parser.add_argument('--num_step_per_summary', type=int, default=1000)
parser.add_argument('--start_step_validation', type=int, default=5000)
parser.add_argument('--restore_path', type=str, default=None)
parser.add_argument('--min_evaluate_depth', type=float, default=0)
parser.add_argument('--max_evaluate_depth', type=float, default=100)
parser.add_argument('--max_points_inference', type=int, default=128)
# Hardware and debugging
parser.add_argument('--debug', action='store_true')
parser.add_argument('--num_workers', type=int, default=10)
parser.add_argument('--seed', type=int, default=0)


if __name__ == '__main__':
    args = parser.parse_args()
    restore_path = None if args.restore_path in (None, '') \
        else args.restore_path

    with tempfile.TemporaryDirectory() as tmpdir:
        gt_train, radar_train = unpack_data_struct_manifest(
            args.path_to_pickle_file_train, materialize_dirpath=tmpdir,
            materialize_prefix='train_')
        gt_val, radar_val = unpack_data_struct_manifest(
            args.path_to_pickle_file_val, materialize_dirpath=tmpdir,
            materialize_prefix='val_')
        legacy_main.train(
            path_to_pickle_file_gt_train_paths=_as_path_pickle(
                gt_train, tmpdir, 'gt_train.pkl'),
            path_to_pickle_file_radar_train_numpys=_as_path_pickle(
                radar_train, tmpdir, 'radar_train.pkl'),
            path_to_pickle_file_gt_val_paths=_as_path_pickle(
                gt_val, tmpdir, 'gt_val.pkl'),
            path_to_pickle_file_radar_val_numpys=_as_path_pickle(
                radar_val, tmpdir, 'radar_val.pkl'),
            data_path=args.data_path,
            image_path=args.image_path,
            epsilon=args.epsilon,
            batch_size=args.batch_size,
            patch_size=args.patch_size,
            normalized_image_range=args.normalized_image_range,
            learning_rates=args.learning_rates,
            learning_schedule=args.learning_schedule,
            augmentation_probabilities=args.augmentation_probabilities,
            augmentation_schedule=args.augmentation_schedule,
            augmentation_random_brightness=args.augmentation_random_brightness,
            augmentation_random_noise_type=args.augmentation_random_noise_type,
            augmentation_random_noise_spread=args.augmentation_random_noise_spread,
            augmentation_random_flip_type=args.augmentation_random_flip_type,
            w_cross_entropy=args.w_cross_entropy,
            w_smoothness=args.w_smoothness,
            w_weight_decay=args.w_weight_decay,
            kernel_size_smoothness=args.kernel_size_smoothness,
            set_invalid_to_negative=args.set_invalid_to_negative,
            w_positive_class=args.w_positive_class,
            checkpoint_dirpath=args.checkpoint_dirpath,
            num_step_per_summary=args.num_step_per_summary,
            num_step_per_checkpoint=args.num_step_per_checkpoint,
            start_step_validation=args.start_step_validation,
            restore_path=restore_path,
            min_evaluate_depth=args.min_evaluate_depth,
            max_evaluate_depth=args.max_evaluate_depth,
            max_points_inference=args.max_points_inference,
            debug=args.debug,
            num_workers=args.num_workers,
            seed=args.seed)

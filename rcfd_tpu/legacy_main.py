"""Legacy v0 pipeline driver: train / validate / save_stage_1 / eval_stage_1.

TPU-native port of the reference's v0 surface (src/main.py:26-872,
src/save_stage_1_depth.py, src/eval_stage_1_depth.py, src/train.py):
pickle-manifest datasets, ONE random radar point per training sample,
point-centered 900x288 crops, the v0 FusionNet (tall 17x3 kernels, BN MLP
radar branch, VOICED decoder, logit bias), 3-class pseudo ground truth
(0 no-match / 1 match / 2 invalid), masked pos-weighted BCE + optional
sobel smoothness, and scatter-composite validation identical to the
stage-1 path.

Differences by design (documented, not silent):
- NHWC, explicit RNG keys, jitted SPMD step (replacing DataParallel).
- The reference's Transforms crops on the point INSIDE its augmentation
  pipeline; here the point-centered crop runs first and the photometric /
  flip augmentations act on the crops (same distribution — the point sits
  at the crop's center column, so a horizontal flip preserves the
  correspondence geometry).
- Checkpoints keep the reference's v0 .pth keys
  {train_step, optimizer_state_dict, model_state_dict} (src/main.py:819-842);
  the reference's own v0 model class is broken in-tree
  (src/models.py:58-63 passes list kernel sizes into net_utils.Conv2d),
  so state-dict key names inside model_state_dict follow our working v0
  network.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data import io as data_utils
from .data.legacy_datasets import (BinaryClassificationDataset,
                                   BinaryClassificationDatasetVal,
                                   SaveStage1OutputDataset,
                                   load_pickle_paths, save_pickle_paths)
from .data.loader import DataLoader
from .data.transforms import Transforms
from .models.legacy_v0 import LegacyFusionNet, crop_image_to_shape_on_point
from .models.losses import (binary_cross_entropy_with_logits,
                            sobel_smoothness_loss_func)
from .ops.scatter import scatter_quasi_dense
from .parallel.optim import adam_step, init_adam
from .utils import eval_utils
from .utils.checkpoint import (load_torch_checkpoint, save_torch_checkpoint,
                               torch_state_dict_to_tree,
                               tree_to_torch_state_dict, conform_to_template)
from .utils.log_utils import log
from .utils.summary import SummaryWriter


def build_model(patch_size=(900, 288)) -> LegacyFusionNet:
    h, w = patch_size
    latent_hw = (int(np.ceil(h / 32.0)), int(np.ceil(w / 32.0)))
    return LegacyFusionNet(radar_input_dim=3, latent_hw=latent_hw)


def save_model(model, path, params, state, step, opt_sd=None):
    """Legacy checkpoint keys (reference src/main.py:819-842)."""
    sd = tree_to_torch_state_dict(params, state)
    ckpt = {'train_step': int(step),
            'optimizer_state_dict': opt_sd or {},
            'model_state_dict': sd}
    if path.endswith('.pth'):
        try:
            save_torch_checkpoint(path, ckpt)
            return
        except ImportError:
            path = os.path.splitext(path)[0] + '.npz'
    np.savez(path, **{'model_state_dict/' + k: np.asarray(v)
                      for k, v in sd.items()},
             train_step=step)


def restore_model(model, path, params_template, state_template):
    if path.endswith('.npz'):
        raw = np.load(path)
        sd = {k.split('/', 1)[1]: raw[k] for k in raw.files
              if k.startswith('model_state_dict/')}
        step = int(raw['train_step'])
    else:
        ckpt = load_torch_checkpoint(path)
        sd = ckpt['model_state_dict']
        step = int(ckpt.get('train_step', 0))
    p, s = torch_state_dict_to_tree(sd)
    params = conform_to_template(params_template, p)
    state = conform_to_template(state_template, s, fill_missing=True)
    return params, state, step


def _make_train_step(model, transforms, patch_size, epsilon,
                     set_invalid_to_negative, w_cross_entropy, w_smoothness,
                     w_positive_class, w_weight_decay,
                     kernel_size_smoothness):

    def step(params, state, opt_state, batch, key, lr, aug_prob):
        image, radar_point, ground_truth = batch
        # 3-class pseudo GT (src/main.py:322-335)
        z = radar_point[:, 2].reshape(-1, 1, 1, 1)
        label = jnp.where(jnp.abs(ground_truth - z) < epsilon, 1.0, 0.0)
        label = jnp.where(ground_truth > 0, label, 2.0)

        points, image_crops, label_crops = crop_image_to_shape_on_point(
            radar_point, image, label, patch_size[0], patch_size[1],
            label_fill=2.0)
        (image_t,), (label_crops,) = transforms.transform(
            key, [image_crops], labels_arr=[label_crops],
            random_transform_probability=aug_prob)

        if set_invalid_to_negative:
            label_c = jnp.where(label_crops > 1, 0.0, label_crops)
            validity = jnp.ones_like(label_c)
        else:
            label_c = label_crops
            validity = jnp.where(label_crops > 1, 0.0, 1.0)

        def loss_fn(p):
            logits, new_state = model(p, state, image_t, points,
                                      training=True)
            ce = binary_cross_entropy_with_logits(
                logits, label_c, pos_weight=w_positive_class)
            loss_ce = jnp.sum(validity * ce) / jnp.maximum(
                jnp.sum(validity), 1.0)
            if w_smoothness > 0:
                sig = jax.nn.sigmoid(logits)
                loss_sm = sobel_smoothness_loss_func(
                    sig, image_t, jnp.ones_like(sig),
                    filter_size=(1, 1) + tuple(kernel_size_smoothness))
            else:
                loss_sm = jnp.float32(0.0)
            loss = w_cross_entropy * loss_ce + w_smoothness * loss_sm
            return loss, (new_state, {'loss': loss,
                                      'loss_cross_entropy': loss_ce,
                                      'loss_smoothness': loss_sm})

        grads, (new_state, info) = jax.grad(loss_fn, has_aux=True)(params)
        params, opt_state = adam_step(params, grads, opt_state, lr,
                                      weight_decay=w_weight_decay)
        return params, new_state, opt_state, info

    return step


def make_forward_fn(model, transforms, image_height, image_width,
                    patch_size=(900, 288)):
    """Scatter inference over one full frame with the v0 network: crop a
    patch per point, sigmoid, threshold, max/argmax composite, legacy
    index->z rewrite (reference src/main.py:565-617)."""

    @jax.jit
    def forward(params, state, image, points, valid):
        (image_t,) = transforms.transform(
            jax.random.PRNGKey(0), [image], random_transform_probability=0.0)
        k = points.shape[0]
        images_rep = jnp.broadcast_to(
            image_t, (k,) + image_t.shape[1:])
        dummy_labels = jnp.zeros(image_t.shape[:1] + image_t.shape[1:3] + (1,))
        dummy_labels = jnp.broadcast_to(dummy_labels, (k,) +
                                        image_t.shape[1:3] + (1,))
        pts, image_crops, _ = crop_image_to_shape_on_point(
            points, images_rep, dummy_labels, patch_size[0], patch_size[1])
        logits, _ = model(params, state, image_crops, pts, training=False)
        crops = jax.nn.sigmoid(logits)[..., 0]
        x_shifted = points[:, 0] + patch_size[1] // 2
        depth_map, response_map = scatter_quasi_dense(
            crops, x_shifted, points[:, 2], valid,
            image_height=image_height, image_width=image_width,
            patch_size=patch_size)
        return depth_map, response_map

    return forward


def train(path_to_pickle_file_gt_train_paths,
          path_to_pickle_file_radar_train_numpys,
          path_to_pickle_file_gt_val_paths,
          path_to_pickle_file_radar_val_numpys,
          data_path,
          image_path,
          epsilon,
          batch_size,
          patch_size,
          normalized_image_range,
          learning_rates,
          learning_schedule,
          augmentation_probabilities,
          augmentation_schedule,
          augmentation_random_brightness,
          augmentation_random_noise_type,
          augmentation_random_noise_spread,
          augmentation_random_flip_type,
          w_cross_entropy,
          w_smoothness,
          w_weight_decay,
          kernel_size_smoothness,
          set_invalid_to_negative,
          w_positive_class,
          checkpoint_dirpath,
          num_step_per_summary,
          num_step_per_checkpoint,
          start_step_validation,
          restore_path=None,
          min_evaluate_depth=0.0,
          max_evaluate_depth=100.0,
          max_points_inference=128,
          debug=False,
          num_workers=10,
          seed=0):
    """v0 training loop (reference src/main.py:26-505)."""
    os.makedirs(checkpoint_dirpath, exist_ok=True)
    checkpoint_path = os.path.join(checkpoint_dirpath, 'model-{}.pth')
    log_path = os.path.join(checkpoint_dirpath, 'results.txt')
    event_path = os.path.join(checkpoint_dirpath, 'events')

    gt_train = load_pickle_paths(path_to_pickle_file_gt_train_paths)
    radar_train = load_pickle_paths(path_to_pickle_file_radar_train_numpys)
    gt_val = load_pickle_paths(path_to_pickle_file_gt_val_paths)
    radar_val = load_pickle_paths(path_to_pickle_file_radar_val_numpys)
    if debug:
        gt_train, radar_train = gt_train[:100], radar_train[:100]
        gt_val, radar_val = gt_val[100:150], radar_val[100:150]

    train_dataset = BinaryClassificationDataset(
        gt_train, radar_train, image_dirpath=image_path,
        data_dirpath=data_path)
    val_dataset = BinaryClassificationDatasetVal(
        gt_val, radar_val, image_dirpath=image_path, data_dirpath=data_path,
        max_points=max_points_inference)

    train_loader = DataLoader(train_dataset, batch_size=batch_size,
                              shuffle=True, num_workers=num_workers,
                              seed=seed, drop_last=True)

    train_transforms = Transforms(
        normalized_image_range=list(normalized_image_range),
        random_brightness=list(augmentation_random_brightness),
        random_noise_type=augmentation_random_noise_type,
        random_noise_spread=augmentation_random_noise_spread,
        random_flip_type=list(augmentation_random_flip_type))
    val_transforms = Transforms(
        normalized_image_range=list(normalized_image_range))

    model = build_model(patch_size)
    params, state = model.init(jax.random.PRNGKey(seed))
    opt_state = init_adam(params)

    train_step = 0
    if restore_path:
        params, state, train_step = restore_model(model, restore_path,
                                                  params, state)

    step_fn = _make_train_step(
        model, train_transforms, tuple(patch_size), epsilon,
        set_invalid_to_negative, w_cross_entropy, w_smoothness,
        w_positive_class, w_weight_decay, kernel_size_smoothness)
    step_jit = jax.jit(step_fn, donate_argnums=(0, 1, 2))

    sample = val_dataset.get(0) if len(val_dataset) else None
    ih, iw = (sample[0].shape[0], sample[0].shape[1]) if sample else (900, 1600)
    forward_fn = make_forward_fn(model, val_transforms, ih, iw,
                                 tuple(patch_size))

    train_writer = SummaryWriter(event_path + '-train')
    val_writer = SummaryWriter(event_path + '-val')
    best_results = {'step': -1, 'mae_intersection': np.inf,
                    'rmse_intersection': np.inf, 'imae_intersection': np.inf,
                    'irmse_intersection': np.inf,
                    'n_valid_points_intersection': 0}

    n_train_step = int(learning_schedule[-1] *
                       np.ceil(len(train_dataset) / batch_size))
    log('Legacy v0 training: n_sample={} n_step={}'.format(
        len(train_dataset), n_train_step), log_path)

    lr_pos = aug_pos = 0
    lr = learning_rates[0]
    aug_prob = augmentation_probabilities[0]
    rng = jax.random.PRNGKey(seed + 1)
    time_start = time.time()

    for epoch in range(1, learning_schedule[-1] + 1):
        if epoch > learning_schedule[lr_pos]:
            lr_pos += 1
            lr = learning_rates[lr_pos]
        if -1 not in augmentation_schedule and \
                epoch > augmentation_schedule[aug_pos]:
            aug_pos += 1
            aug_prob = augmentation_probabilities[aug_pos]

        train_loader.set_epoch(epoch)
        for batch in train_loader:
            train_step += 1
            rng, key = jax.random.split(rng)
            batch_j = tuple(jnp.asarray(b) for b in batch)
            params, state, opt_state, info = step_jit(
                params, state, opt_state, batch_j, key, jnp.float32(lr),
                jnp.float32(aug_prob))

            if train_step % num_step_per_summary == 0:
                for k, v in info.items():
                    train_writer.add_scalar('train-' + k, float(v),
                                            global_step=train_step)
            if train_step % num_step_per_checkpoint == 0:
                log('Step={}/{} Loss={:.5f} ({:.2f} h elapsed)'.format(
                    train_step, n_train_step, float(info['loss']),
                    (time.time() - time_start) / 3600), log_path)
                if train_step >= start_step_validation and len(val_dataset):
                    best_results = validate(
                        model, params, state, forward_fn, val_dataset,
                        train_step, best_results, min_evaluate_depth,
                        max_evaluate_depth, val_writer, log_path)
                save_model(model, checkpoint_path.format(train_step),
                           params, state, train_step)

    if len(val_dataset):
        best_results = validate(model, params, state, forward_fn,
                                val_dataset, train_step, best_results,
                                min_evaluate_depth, max_evaluate_depth,
                                val_writer, log_path)
    save_model(model, checkpoint_path.format(train_step), params, state,
               train_step)
    return best_results


def validate(model, params, state, forward_fn, dataset, step, best_results,
             min_evaluate_depth, max_evaluate_depth, summary_writer,
             log_path=None):
    """Scatter validation with intersection metrics (src/main.py:507-720)."""
    n = len(dataset)
    mae = np.full(n, np.nan)
    rmse = np.full(n, np.nan)
    imae = np.full(n, np.nan)
    irmse = np.full(n, np.nan)
    n_inter = np.zeros(n)
    for i in range(n):
        image, points, valid, gt = dataset.get(i)
        depth_map, _ = forward_fn(params, state, jnp.asarray(image)[None],
                                  jnp.asarray(points), jnp.asarray(valid))
        out = np.asarray(depth_map)
        g = gt[..., 0]
        inter = (out > 0) & (g > 0)
        n_inter[i] = inter.sum()
        mask = inter & (g > min_evaluate_depth) & (g < max_evaluate_depth)
        o, t = out[mask], g[mask]
        mae[i] = eval_utils.mean_abs_err(1000. * o, 1000. * t)
        rmse[i] = eval_utils.root_mean_sq_err(1000. * o, 1000. * t)
        imae[i] = eval_utils.inv_mean_abs_err(0.001 * o, 0.001 * t)
        irmse[i] = eval_utils.inv_root_mean_sq_err(0.001 * o, 0.001 * t)
    results = {
        'mae_intersection': float(np.nanmean(mae)),
        'rmse_intersection': float(np.nanmean(rmse)),
        'imae_intersection': float(np.nanmean(imae)),
        'irmse_intersection': float(np.nanmean(irmse)),
        'n_valid_points_intersection': float(np.mean(n_inter)),
    }
    if summary_writer is not None:
        for k, v in results.items():
            summary_writer.add_scalar('eval-' + k, v, global_step=step)
    log('Legacy validation step {}: {}'.format(step, results), log_path)
    n_improve = sum(
        int(np.round(results[k], 2) <= np.round(best_results[k], 2))
        for k in ['mae_intersection', 'rmse_intersection',
                  'imae_intersection', 'irmse_intersection'])
    n_improve += int(np.round(results['n_valid_points_intersection'], 2) >=
                     np.round(best_results['n_valid_points_intersection'], 2))
    if n_improve > 3:
        best_results = dict(results, step=step)
    return best_results


def save_stage_1(restore_path,
                 path_to_pickle_file_gt_paths,
                 path_to_pickle_file_radar_numpy_paths,
                 image_dirpath,
                 output_dirpath,
                 patch_size=(900, 288),
                 data_path='',
                 max_points_inference=128,
                 normalized_image_range=(0, 1),
                 file_to_save_radar_output_paths=None,
                 file_to_save_radar_response_paths=None,
                 verbose=False):
    """Run the trained v0 model over a split, writing quasi-dense depth +
    response PNGs and pickled output-path manifests (reference
    src/save_stage_1_depth.py + save_stage_1_utils.run)."""
    gt_paths = load_pickle_paths(path_to_pickle_file_gt_paths)
    radar_paths = load_pickle_paths(path_to_pickle_file_radar_numpy_paths)
    dataset = SaveStage1OutputDataset(
        gt_paths, radar_paths, image_dirpath=image_dirpath,
        data_dirpath=data_path, max_points=max_points_inference)

    model = build_model(patch_size)
    params, state = model.init(jax.random.PRNGKey(0))
    params, state, _ = restore_model(model, restore_path, params, state)

    sample = dataset.get(0)
    ih, iw = sample[0].shape[0], sample[0].shape[1]
    transforms = Transforms(
        normalized_image_range=list(normalized_image_range))
    forward_fn = make_forward_fn(model, transforms, ih, iw,
                                 tuple(patch_size))

    depth_dir = os.path.join(output_dirpath, 'radar_output')
    response_dir = os.path.join(output_dirpath, 'radar_response')
    os.makedirs(depth_dir, exist_ok=True)
    os.makedirs(response_dir, exist_ok=True)
    depth_paths, response_paths = [], []
    for i in range(len(dataset)):
        image, points, valid, gt, name = dataset.get(i)
        depth_map, response_map = forward_fn(
            params, state, jnp.asarray(image)[None], jnp.asarray(points),
            jnp.asarray(valid))
        dp = os.path.join(depth_dir, name + '.png')
        rp = os.path.join(response_dir, name + '.png')
        data_utils.save_depth(np.asarray(depth_map), dp)
        data_utils.save_response(np.asarray(response_map), rp)
        depth_paths.append(dp)
        response_paths.append(rp)
        if verbose:
            print('[save_stage_1] {}/{}'.format(i + 1, len(dataset)),
                  end='\r')
    if file_to_save_radar_output_paths:
        save_pickle_paths(file_to_save_radar_output_paths, depth_paths)
    if file_to_save_radar_response_paths:
        save_pickle_paths(file_to_save_radar_response_paths, response_paths)
    return depth_paths, response_paths


def eval_stage_1(path_to_pickle_file_output_paths,
                 path_to_pickle_file_gt_paths,
                 data_path='',
                 min_evaluate_depth=0.0,
                 max_evaluate_depth=100.0,
                 log_path=None):
    """Evaluate saved stage-1 quasi-dense maps against ground truth
    (reference src/eval_stage_1_depth.py): intersection MAE/RMSE/iMAE/iRMSE."""
    out_paths = load_pickle_paths(path_to_pickle_file_output_paths)
    gt_paths = load_pickle_paths(path_to_pickle_file_gt_paths)
    assert len(out_paths) == len(gt_paths)
    n = len(out_paths)
    mae = np.full(n, np.nan)
    rmse = np.full(n, np.nan)
    imae = np.full(n, np.nan)
    irmse = np.full(n, np.nan)
    for i in range(n):
        out = data_utils.load_depth(os.path.join(data_path, out_paths[i]))
        gt = data_utils.load_depth(os.path.join(data_path, gt_paths[i]))
        mask = (out > 0) & (gt > min_evaluate_depth) & \
            (gt < max_evaluate_depth)
        o, t = out[mask], gt[mask]
        mae[i] = eval_utils.mean_abs_err(1000. * o, 1000. * t)
        rmse[i] = eval_utils.root_mean_sq_err(1000. * o, 1000. * t)
        imae[i] = eval_utils.inv_mean_abs_err(0.001 * o, 0.001 * t)
        irmse[i] = eval_utils.inv_root_mean_sq_err(0.001 * o, 0.001 * t)
    results = {
        'mae': float(np.nanmean(mae)), 'rmse': float(np.nanmean(rmse)),
        'imae': float(np.nanmean(imae)), 'irmse': float(np.nanmean(irmse)),
    }
    log('Stage-1 eval over {} samples: {}'.format(n, results), log_path)
    return results

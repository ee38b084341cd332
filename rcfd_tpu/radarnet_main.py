"""RadarNet driver: train / validate / run (scatter inference).

TPU-native port of reference src/radarnet_main.py. Training flattens the
per-image radar point axis into the batch; inference pads the ragged point
set to a static K and runs the whole scatter/argmax composite as one jitted
program (reference builds K full frames and loops in Python,
src/radarnet_main.py:534-591).
"""

from __future__ import annotations

import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data import io as data_utils
from .data import transport
from .data.datasets import (RadarNetInferenceDataset, RadarNetTrainingDataset)
from .data.loader import DataLoader, iter_device_batches
from .data.transforms import Transforms
from .models.radarnet import RadarNetModel
from .ops.scatter import scatter_quasi_dense
from .parallel.optim import adam_step, init_adam
from .utils import eval_utils
from .utils.log_utils import log
from .utils.summary import SummaryWriter


def _build_model(input_channels_image, input_channels_depth, patch_size,
                 encoder_type, n_filters_encoder_image,
                 n_neurons_encoder_depth, decoder_type, n_filters_decoder,
                 weight_initializer, activation_func):
    return RadarNetModel(
        input_channels_image=input_channels_image,
        input_channels_depth=input_channels_depth,
        input_patch_size_image=tuple(patch_size),
        encoder_type=encoder_type,
        n_filters_encoder_image=n_filters_encoder_image,
        n_neurons_encoder_depth=n_neurons_encoder_depth,
        decoder_type=decoder_type,
        n_filters_decoder=n_filters_decoder,
        weight_initializer=weight_initializer,
        activation_func=activation_func)


def _make_train_step(model: RadarNetModel,
                     transforms: Transforms,
                     patch_size: Tuple[int, int],
                     max_distance_correspondence: float,
                     set_invalid_to_negative_class: bool,
                     w_positive_class: float,
                     w_weight_decay: float,
                     axis_name: Optional[str] = None):
    """Build the pure per-shard train step.

    RCFD_TRAIN_DTYPE=bfloat16 enables mixed precision like the FusionNet
    step: f32 master weights and optimizer state, bf16 network inputs
    (layers compute in the input dtype on the MXU), f32 labels/losses."""
    compute_dtype = jnp.bfloat16 \
        if os.environ.get('RCFD_TRAIN_DTYPE') == 'bfloat16' else None

    def step(params, state, opt_state, batch, key, lr, aug_prob):
        # integer transport (uint8 image, uint16 GT crops) decodes to the
        # exact float32 values the host loader used to ship (transport.py)
        image, radar_points, bounding_boxes, ground_truth = \
            transport.decode(batch)
        # image: (B, ph, W_pad, 3); radar_points: (B, K, 3)
        # bounding_boxes: (B, K, 4); ground_truth: (B, K, ph, pw, 1)

        (image_t,), (ground_truth,), (radar_points,), (bounding_boxes,) = \
            transforms.transform(
                key, [image], labels_arr=[ground_truth],
                points_arr=[radar_points],
                bounding_boxes_arr=[bounding_boxes],
                random_transform_probability=aug_prob)

        b, k = radar_points.shape[0], radar_points.shape[1]
        points_flat = radar_points.reshape(b * k, radar_points.shape[2])
        radar_depth = points_flat[:, 2].reshape(b * k, 1, 1, 1)
        gt_flat = ground_truth.reshape(b * k, *ground_truth.shape[2:])

        # Correspondence labels: |gt - z| < tau, valid where gt > 0
        # (src/radarnet_main.py:354-378)
        distance = jnp.abs(gt_flat - radar_depth)
        label = jnp.where(distance < max_distance_correspondence, 1.0, 0.0)
        label = jnp.where(gt_flat > 0, label, 0.0)
        if set_invalid_to_negative_class:
            validity_map = jnp.ones_like(gt_flat)
        else:
            validity_map = jnp.where(gt_flat <= 0, 0.0, 1.0)

        x1 = bounding_boxes[..., 0]  # (B, K)

        if compute_dtype is not None:
            # cast the image only: points are pixel coordinates up to
            # ~1900 where bf16 quantizes in steps of 8, and the MLP point
            # encoder is negligible compute (its first layer casts weights
            # to the input dtype, so the conv stack still runs bf16)
            image_t = image_t.astype(compute_dtype)

        def loss_fn(p):
            logits, new_state = model.apply(
                p, state, image_t, points_flat, x1,
                box_height=patch_size[0], training=True, return_logits=True)
            loss, loss_info = model.compute_loss(
                logits=logits, ground_truth=label, validity_map=validity_map,
                w_positive_class=w_positive_class)
            # summary scalars (reference src/radarnet_main.py:451-457)
            response = jax.nn.sigmoid(logits)
            pred_label = jnp.where(response > 0.5, 1.0, 0.0)
            loss_info['average_ground_truth_label_per_point'] = \
                jnp.mean(jnp.sum(label, axis=(1, 2, 3)))
            loss_info['average_predicted_label_per_point'] = \
                jnp.mean(jnp.sum(pred_label, axis=(1, 2, 3)))
            return loss, (new_state, loss_info)

        grads, (new_state, loss_info) = jax.grad(loss_fn, has_aux=True)(params)

        if axis_name is not None:
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, axis_name), grads)
            new_state = jax.tree_util.tree_map(
                lambda s: jax.lax.pmean(s, axis_name)
                if jnp.issubdtype(s.dtype, jnp.floating) else s, new_state)
            loss_info = jax.tree_util.tree_map(
                lambda v: jax.lax.pmean(v, axis_name), loss_info)

        params, opt_state = adam_step(params, grads, opt_state, lr,
                                      weight_decay=w_weight_decay)
        return params, new_state, opt_state, loss_info

    return step


def _make_summary_forward(model: RadarNetModel, transforms: Transforms,
                          patch_size: Tuple[int, int],
                          max_distance_correspondence: float,
                          n_display: int = 4):
    """Jitted forward returning the display tensors for TB image panels
    (reference src/radarnet_model.py:268-477): per-patch image crop,
    response, thresholded output label, GT label, validity."""
    ph, pw = patch_size

    @jax.jit
    def summary_tensors(params, state, batch, key):
        image, radar_points, bounding_boxes, ground_truth = \
            transport.decode(batch)
        (image_t,) = transforms.transform(
            key, [image], random_transform_probability=0.0)
        b, k = radar_points.shape[0], radar_points.shape[1]
        n = min(n_display, b * k)
        points_flat = radar_points.reshape(b * k, radar_points.shape[2])[:n]
        gt_flat = ground_truth.reshape(
            b * k, *ground_truth.shape[2:])[:n]
        x1 = bounding_boxes[..., 0].reshape(b * k)[:n]

        radar_depth = points_flat[:, 2].reshape(n, 1, 1, 1)
        distance = jnp.abs(gt_flat - radar_depth)
        label = jnp.where(distance < max_distance_correspondence, 1.0, 0.0)
        label = jnp.where(gt_flat > 0, label, 0.0)
        validity = jnp.where(gt_flat > 0, 1.0, 0.0)

        # display images come from the owning batch sample
        sample_idx = jnp.arange(n) // k
        crop_top = image_t.shape[1] - ph

        def crop_one(si, x):
            return jax.lax.dynamic_slice(
                image_t[si], (crop_top, x.astype(jnp.int32), 0),
                (ph, pw, 3))

        image_crops = jax.vmap(crop_one)(sample_idx, x1)

        response, _ = model.apply(
            params, state, image_t,
            radar_points.reshape(b * k, -1),
            bounding_boxes[..., 0], box_height=ph, training=False,
            return_logits=False)
        response = response[:n]
        return {
            'image': image_crops,
            'response': response,
            'output_label': jnp.where(response > 0.5, 1.0, 0.0),
            'ground_truth_label': label,
            'validity_map': validity,
        }

    return summary_tensors


def _log_image_summary(writer, tag, step, tensors):
    """Colorized montage (image | response | output label | label error |
    gt label | validity) x n_display + distributions, mirroring reference
    src/radarnet_model.py:268-477. Best-effort when TB is unavailable."""
    if writer is None or getattr(writer, '_writer', None) is None:
        return
    try:
        from .utils.log_utils import colorize
        t = {k: np.asarray(v) for k, v in tensors.items()}
        out_label = t['output_label']
        gt_label = t['ground_truth_label']
        label_valid = (gt_label > 0).astype(np.float32)
        error = np.abs(out_label - gt_label)
        error = np.where(label_valid == 1.0,
                         (error + 1e-8) / (gt_label + 1e-8), label_valid)
        rows = [
            np.clip(t['image'], 0.0, 1.0),
            colorize(t['response'], 'inferno'),
            colorize(out_label, 'inferno'),
            colorize(error, 'inferno'),
            colorize(gt_label, 'inferno'),
            colorize(t['validity_map'], 'inferno'),
        ]
        panel = np.concatenate(
            [np.concatenate(list(r), axis=1) for r in rows], axis=0)
        writer.add_image(
            tag + '-image-output_response-output_label-error-'
            'ground_truth_label-validity_map', panel, global_step=step)
        writer.add_histogram(tag + '-output_response_distro', t['response'],
                             global_step=step)
        writer.add_histogram(tag + '-output_label_distro', out_label,
                             global_step=step)
        writer.add_histogram(tag + '_ground_truth_label_distro', gt_label,
                             global_step=step)
    except Exception:
        pass


def make_forward_fn(model: RadarNetModel, transforms: Transforms,
                    image_height: int, image_width: int,
                    threshold: float = 0.5):
    """Jitted scatter inference over one frame with a padded point set
    (reference forward(), src/radarnet_main.py:534-591).

    model.perf.pallas_scatter (RCFD_PALLAS_SCATTER at construction)
    routes the scatter composite through the Pallas VMEM-accumulation
    kernel (ops/scatter_pallas.py) instead of XLA scatters; identical winners, response quantized at the PNG codec's
    14-bit precision."""
    patch_size = model.input_patch_size_image
    pad = patch_size[1] // 2
    ps = getattr(getattr(model, 'perf', None), 'pallas_scatter', None)
    if ps is not None:
        use_pallas = ps
    else:
        # default ON for TPU backends (1.68x over the XLA scatter); the
        # depth maps are identical and responses match at the PNG codec's
        # precision. CPU lacks compiled pallas -> XLA path.
        use_pallas = jax.default_backend() in ('tpu', 'axon')

    @jax.jit
    def forward(params, state, image, points, valid):
        # image: (1, H, W, 3) unnormalized (uint8 under integer
        # transport); points: (K, 3); valid: (K,)
        image = transport.decode(image)
        (image_t,) = transforms.transform(
            jax.random.PRNGKey(0), [image], random_transform_probability=0.0)
        image_pad = jnp.pad(image_t, ((0, 0), (0, 0), (pad, pad), (0, 0)),
                            mode='edge')
        x_shifted = points[:, 0] + pad
        points_shifted = points.at[:, 0].set(x_shifted)
        x1 = (x_shifted - pad)[None, :]  # (1, K)

        # follow the params' compute dtype (bf16 serving: cast params
        # once). The IMAGE only: points are pixel coordinates that bf16
        # would quantize (steps of 8 above x=1024 — up to 4 px of box /
        # scatter-column shift); the MLP runs f32 and its features join
        # the image branch in the compute dtype at the bottleneck.
        pdtype = jax.tree_util.tree_leaves(params)[0].dtype
        responses, _ = model.apply(
            params, state, image_pad.astype(pdtype), points_shifted, x1,
            box_height=image_height, training=False, return_logits=False)
        # keep crops in the compute dtype (bf16 serving halves the
        # scatter's HBM read; the f32 upcast inside the scatters is exact)
        crops = responses[..., 0]  # (K, ph, pw)

        from .ops.scatter_pallas import MAX_POINTS as _pallas_max_k
        if use_pallas and points.shape[0] <= _pallas_max_k:
            from .ops.scatter_pallas import scatter_quasi_dense_pallas
            depth_map, response_map = scatter_quasi_dense_pallas(
                crops, x_shifted, points[:, 2], valid,
                image_height=image_height, image_width=image_width,
                patch_size=patch_size, threshold=threshold)
        else:
            depth_map, response_map = scatter_quasi_dense(
                crops, x_shifted, points[:, 2], valid,
                image_height=image_height, image_width=image_width,
                patch_size=patch_size, threshold=threshold)
        return depth_map, response_map

    return forward


def make_forward_fn_batched(model: RadarNetModel, transforms: Transforms,
                            image_height: int, image_width: int,
                            threshold: float = 0.5,
                            codec_encode: bool = False):
    """Frame-batched scatter inference: B frames per dispatch (identical
    per-frame results to make_forward_fn — same kernels, mapped over the
    batch). The bulk-inference surfaces (validate/run/the stage-1.5
    bridge over ~34k frames) were per-frame in the reference
    (src/radarnet_main.py:958) and dominated by dispatch overhead at
    batch 1; this amortizes it and raises MXU occupancy on the small
    stages. The per-point decode is chunked so its patch-pyramid peak
    stays ~256 patches regardless of B (see pipeline.py)."""
    patch_size = model.input_patch_size_image
    pad = patch_size[1] // 2
    ps = getattr(getattr(model, 'perf', None), 'pallas_scatter', None)
    if ps is not None:
        use_pallas = ps
    else:
        use_pallas = jax.default_backend() in ('tpu', 'axon')
    decode_chunks = getattr(getattr(model, 'perf', None),
                            'decode_chunks', None)

    @jax.jit
    def forward(params, state, images, points, valid):
        # images: (B, H, W, 3) unnormalized (uint8 under integer
        # transport); points: (B, K, 3); valid: (B, K)
        images = transport.decode(images)
        b, k = points.shape[0], points.shape[1]
        (images_t,) = transforms.transform(
            jax.random.PRNGKey(0), [images], random_transform_probability=0.0)
        images_pad = jnp.pad(images_t, ((0, 0), (0, 0), (pad, pad), (0, 0)),
                             mode='edge')
        x_shifted = points[..., 0] + pad              # (B, K)
        points_shifted = points.at[..., 0].set(x_shifted)
        x1 = x_shifted - pad                          # (B, K)

        pdtype = jax.tree_util.tree_leaves(params)[0].dtype
        images_pad = images_pad.astype(pdtype)

        if decode_chunks is not None:
            n_chunks = max(1, decode_chunks)
        else:
            n_chunks = max(1, (b * k) // 512)
        while n_chunks > 1 and k % n_chunks != 0:
            n_chunks -= 1

        if n_chunks > 1:
            responses, _ = model.apply_chunked(
                params, state, images_pad, points_shifted, x1,
                n_chunks=n_chunks, box_height=image_height, training=False,
                return_logits=False)
            crops = responses[..., 0]                 # (B, K, ph, pw)
        else:
            responses, _ = model.apply(
                params, state, images_pad, points_shifted.reshape(b * k, 3),
                x1, box_height=image_height, training=False,
                return_logits=False)
            crops = responses[..., 0].reshape(b, k, *responses.shape[1:3])

        xs = x_shifted.astype(jnp.float32)
        zs = points[..., 2].astype(jnp.float32)

        from .ops.scatter_pallas import MAX_POINTS as _pallas_max_k

        def scatter_one(args):
            crops_i, xs_i, zs_i, valid_i = args
            if use_pallas and k <= _pallas_max_k:
                from .ops.scatter_pallas import scatter_quasi_dense_pallas
                return scatter_quasi_dense_pallas(
                    crops_i, xs_i, zs_i, valid_i, image_height=image_height,
                    image_width=image_width, patch_size=patch_size,
                    threshold=threshold)
            return scatter_quasi_dense(
                crops_i, xs_i, zs_i, valid_i, image_height=image_height,
                image_width=image_width, patch_size=patch_size,
                threshold=threshold)

        depth_map, response_map = jax.lax.map(
            scatter_one, (crops, xs, zs, valid))      # (B, H, W) each
        if codec_encode:
            # quantize to the 16-bit PNG codec grid ON DEVICE: floor(x*m)
            # in f32 exactly matches the host codec (data/io.py
            # save_depth/save_response — np.uint32(np.asarray(z) * m));
            # both multipliers are powers of two so the f32 product is
            # exact. Halves D2H bytes for the bulk bridge surfaces; the
            # written PNGs are byte-identical (tests/test_batched_
            # inference.py).
            depth_map = (depth_map.astype(jnp.float32) *
                         jnp.float32(256.0)).astype(jnp.uint16)
            response_map = (response_map.astype(jnp.float32) *
                            jnp.float32(2 ** 14)).astype(jnp.uint16)
        return depth_map, response_map

    return forward


def iter_scatter_outputs(forward_fn_b, params, state, dataset,
                         eval_batch_size: int):
    """Drive a batched scatter forward over a RadarNetInferenceDataset,
    yielding per-frame (idx, sample_tuple, depth_np, response_np) in
    order. The tail batch is padded by repeating its last sample so one
    compiled shape serves the whole manifest; padded outputs are
    dropped. Per-frame results are identical to the batch-1 path.

    Host decode + H2D transfer for batch i+1 overlap the device compute
    of batch i (iter_device_batches double buffer — the stage-1.5 bridge
    runs this over ~34k frames); the device receives integer-transport
    arrays, the yielded host samples are decoded to the float32 values
    downstream numpy consumers expect."""
    for idxs, samples, (images, points, valid) in iter_device_batches(
            dataset, eval_batch_size, fields=(0, 1, 2)):
        depth_b, response_b = forward_fn_b(params, state, images, points,
                                           valid)
        depth_b = np.asarray(depth_b)
        response_b = np.asarray(response_b)
        for j, idx in enumerate(idxs):
            yield idx, transport.decode_np(samples[j]), depth_b[j], \
                response_b[j]


def train(train_image_path,
          train_radar_path,
          train_ground_truth_path,
          val_image_path,
          val_radar_path,
          val_ground_truth_path,
          # Batch settings
          batch_size,
          patch_size,
          total_points_sampled,
          sample_probability_of_lidar,
          # Input settings
          input_channels_image,
          input_channels_depth,
          normalized_image_range,
          # Network settings
          encoder_type,
          n_filters_encoder_image,
          n_neurons_encoder_depth,
          decoder_type,
          n_filters_decoder,
          # Weight settings
          weight_initializer,
          activation_func,
          # Training settings
          learning_rates,
          learning_schedule,
          # Augmentation settings
          augmentation_probabilities,
          augmentation_schedule,
          augmentation_random_brightness,
          augmentation_random_contrast,
          augmentation_random_saturation,
          augmentation_random_noise_type,
          augmentation_random_noise_spread,
          augmentation_random_flip_type,
          # Loss settings
          w_weight_decay,
          w_positive_class,
          max_distance_correspondence,
          set_invalid_to_negative_class,
          # Checkpoint settings
          checkpoint_dirpath,
          n_step_per_checkpoint,
          n_step_per_summary,
          start_step_validation,
          restore_path,
          # Evaluation settings
          min_evaluate_depth,
          max_evaluate_depth,
          # Hardware settings
          n_thread=8,
          n_data_parallel: Optional[int] = None,
          max_points_inference: int = 0,
          eval_batch_size: int = 1,
          seed: int = 0):
    """Training loop (reference src/radarnet_main.py:18-532).
    eval_batch_size: frames per dispatch during validation (identical
    metrics at any value; default 1 keeps validation HBM headroom while
    optimizer state is resident)."""

    if not os.path.exists(checkpoint_dirpath):
        os.makedirs(checkpoint_dirpath)
    checkpoint_path = os.path.join(checkpoint_dirpath, 'model-{}.pth')
    log_path = os.path.join(checkpoint_dirpath, 'results.txt')
    event_path = os.path.join(checkpoint_dirpath, 'events')

    best_results = {
        'step': -1,
        'mae_intersection': np.inf,
        'rmse_intersection': np.inf,
        'imae_intersection': np.inf,
        'irmse_intersection': np.inf,
        'n_valid_points_output': 0,
        'n_valid_points_ground_truth': 0,
        'n_valid_points_intersection': 0,
    }

    train_image_paths = data_utils.read_paths(train_image_path)
    train_radar_paths = data_utils.read_paths(train_radar_path)
    train_ground_truth_paths = data_utils.read_paths(train_ground_truth_path)
    n_train_sample = len(train_image_paths)
    for paths in [train_radar_paths, train_ground_truth_paths]:
        assert n_train_sample == len(paths)

    n_train_step = int(
        learning_schedule[-1] * np.ceil(n_train_sample / batch_size))

    # multi-host (DCN) data parallelism: one process per host, the
    # global 'data' mesh spans all hosts, each host feeds its slice
    from .parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()

    train_loader = DataLoader(
        RadarNetTrainingDataset(
            image_paths=train_image_paths,
            radar_paths=train_radar_paths,
            ground_truth_paths=train_ground_truth_paths,
            patch_size=patch_size,
            total_points_sampled=total_points_sampled,
            sample_probability_of_lidar=sample_probability_of_lidar),
        batch_size=batch_size,
        shuffle=True,
        num_workers=n_thread,
        seed=seed,
        drop_last=True,
        process_index=jax.process_index(),
        process_count=jax.process_count())

    train_transforms = Transforms(
        normalized_image_range=normalized_image_range,
        random_brightness=augmentation_random_brightness,
        random_contrast=augmentation_random_contrast,
        random_saturation=augmentation_random_saturation,
        random_noise_type=augmentation_random_noise_type,
        random_noise_spread=augmentation_random_noise_spread,
        random_flip_type=augmentation_random_flip_type)

    val_transforms = Transforms(normalized_image_range=normalized_image_range)

    val_image_paths = data_utils.read_paths(val_image_path)
    val_radar_paths = data_utils.read_paths(val_radar_path)
    val_ground_truth_paths = data_utils.read_paths(val_ground_truth_path)
    val_dataset = RadarNetInferenceDataset(
        image_paths=val_image_paths,
        radar_paths=val_radar_paths,
        ground_truth_paths=val_ground_truth_paths,
        max_points=(None if max_points_inference is None or
                    max_points_inference <= 0 else max_points_inference))

    model = _build_model(
        input_channels_image, input_channels_depth, patch_size, encoder_type,
        n_filters_encoder_image, n_neurons_encoder_depth, decoder_type,
        n_filters_decoder, weight_initializer, activation_func)

    params, state = model.init(jax.random.PRNGKey(seed))
    opt_state = init_adam(params)

    train_step = 0
    if restore_path == 'latest':
        from .utils.profiling import find_latest_checkpoint
        restore_path = find_latest_checkpoint(checkpoint_dirpath)
        log('Auto-resume from: {}'.format(restore_path), log_path)
    if restore_path is not None and restore_path != '':
        params, state, train_step, opt_sd = model.restore_checkpoint(restore_path)
        if opt_sd:
            from .utils.checkpoint import torch_adam_to_optax
            try:
                opt_state = torch_adam_to_optax(params, opt_sd)
            except Exception as e:
                log('Could not restore optimizer state ({}); reinitializing'.format(e),
                    log_path)
                opt_state = init_adam(params)

    n_devices = n_data_parallel or jax.device_count()
    use_mesh = n_devices > 1
    axis_name = 'data' if use_mesh else None

    step_fn = _make_train_step(
        model, train_transforms, tuple(patch_size),
        max_distance_correspondence, set_invalid_to_negative_class,
        w_positive_class, w_weight_decay, axis_name=axis_name)

    if use_mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .parallel.mesh import data_parallel_step, get_mesh
        mesh = get_mesh(n_devices)
        assert batch_size % n_devices == 0
        step_jit = data_parallel_step(mesh, step_fn)
        batch_sharding = NamedSharding(mesh, P('data'))
        replicated = NamedSharding(mesh, P())
        params = jax.device_put(params, replicated)
        state = jax.device_put(state, replicated)
        opt_state = jax.device_put(opt_state, replicated)
    else:
        batch_sharding = None
        step_jit = jax.jit(step_fn, donate_argnums=(0, 1, 2))

    # Validation images are full nuScenes frames
    sample_image = data_utils.load_image(val_image_paths[0]) \
        if len(val_image_paths) > 0 else None
    if sample_image is not None:
        image_height, image_width = sample_image.shape[0], sample_image.shape[1]
    else:
        image_height, image_width = 900, 1600
    forward_fn = make_forward_fn_batched(model, val_transforms, image_height,
                                         image_width)
    summary_forward = _make_summary_forward(
        model, val_transforms, tuple(patch_size),
        max_distance_correspondence)

    is_lead = jax.process_index() == 0
    train_summary_writer = SummaryWriter(event_path + '-train',
                                         enabled=is_lead)
    val_summary_writer = SummaryWriter(event_path + '-val',
                                       enabled=is_lead)

    log('Tensorboard summaries: {} ({})'.format(
        'enabled' if train_summary_writer.enabled else 'DISABLED',
        event_path), log_path)
    log('Network: {} / {}  n_parameters={}'.format(
        encoder_type, decoder_type, model.n_parameters(params)), log_path)
    log('Training: batch_size={} patch_size={} K={} n_train_step={} '
        'n_devices={}'.format(batch_size, patch_size, total_points_sampled,
                              n_train_step, n_devices if use_mesh else 1),
        log_path)

    learning_schedule_pos = 0
    augmentation_schedule_pos = 0
    learning_rate = learning_rates[0]
    augmentation_probability = augmentation_probabilities[0]

    rng = jax.random.PRNGKey(seed + 1)
    time_start = time.time()
    from .utils.profiling import TraceWindow
    trace_window = TraceWindow()
    log('Begin training...', log_path)

    for epoch in range(1, learning_schedule[-1] + 1):
        if epoch > learning_schedule[learning_schedule_pos]:
            learning_schedule_pos += 1
            learning_rate = learning_rates[learning_schedule_pos]

        if -1 not in augmentation_schedule and \
                epoch > augmentation_schedule[augmentation_schedule_pos]:
            augmentation_schedule_pos += 1
            augmentation_probability = \
                augmentation_probabilities[augmentation_schedule_pos]

        train_loader.set_epoch(epoch)
        from .data.loader import device_prefetch
        for batch in device_prefetch(train_loader, batch_sharding):
            train_step += 1
            rng, step_key = jax.random.split(rng)

            params, state, opt_state, loss_info = step_jit(
                params, state, opt_state, batch, step_key,
                jnp.float32(learning_rate),
                jnp.float32(augmentation_probability))

            trace_window.after_step(train_step)
            if (train_step % n_step_per_summary) == 0:
                for name, value in loss_info.items():
                    train_summary_writer.add_scalar(
                        'train-' + name, float(value), global_step=train_step)
                if getattr(train_summary_writer, '_writer', None) is not None:
                    _log_image_summary(
                        train_summary_writer, 'train', train_step,
                        summary_forward(params, state, batch, step_key))

            if (train_step % n_step_per_checkpoint) == 0:
                loss_val = float(loss_info['loss'])
                time_elapse = (time.time() - time_start) / 3600
                time_remain = \
                    (n_train_step - train_step) * time_elapse / train_step
                log('Step={:6}/{} Time Elapsed={:.2f}h  Time Remaining={:.2f}h'
                    .format(train_step, n_train_step, time_elapse, time_remain),
                    log_path)
                log('Loss={:.5f}'.format(loss_val), log_path)

                if train_step >= start_step_validation:
                    best_results = validate(
                        model=model, params=params, state=state,
                        forward_fn=forward_fn, dataset=val_dataset,
                        step=train_step, best_results=best_results,
                        min_evaluate_depth=min_evaluate_depth,
                        max_evaluate_depth=max_evaluate_depth,
                        summary_writer=val_summary_writer, log_path=log_path,
                        eval_batch_size=eval_batch_size)

                if is_lead:
                    model.save_checkpoint(
                    checkpoint_path.format(train_step), params, state,
                    step=train_step)

    trace_window.close()
    best_results = validate(
        model=model, params=params, state=state, forward_fn=forward_fn,
        dataset=val_dataset, step=train_step, best_results=best_results,
        min_evaluate_depth=min_evaluate_depth,
        max_evaluate_depth=max_evaluate_depth,
        summary_writer=val_summary_writer, log_path=log_path,
        eval_batch_size=eval_batch_size)

    if is_lead:
        model.save_checkpoint(checkpoint_path.format(train_step), params,
                              state, step=train_step)
    return best_results


def validate(model, params, state, forward_fn, dataset, step, best_results,
             min_evaluate_depth, max_evaluate_depth, summary_writer,
             log_path=None, eval_batch_size: int = 1):
    """Scatter-inference validation with intersection metrics
    (reference src/radarnet_main.py:593-787). forward_fn must be the
    frame-batched forward (make_forward_fn_batched); eval_batch_size
    frames go through one dispatch with identical per-frame metrics."""
    n_sample = len(dataset)
    mae_i = np.zeros(n_sample)
    rmse_i = np.zeros(n_sample)
    imae_i = np.zeros(n_sample)
    irmse_i = np.zeros(n_sample)
    n_valid_output = np.zeros(n_sample)
    n_valid_gt = np.zeros(n_sample)
    n_valid_inter = np.zeros(n_sample)

    for idx, data, output_depth, response_np in iter_scatter_outputs(
            forward_fn, params, state, dataset, eval_batch_size):
        image, points, valid, ground_truth = data
        response_map = response_np
        gt = ground_truth[..., 0]

        # validation image panel for the first sample (reference logs
        # colorized response/depth/gt montages during validate,
        # src/radarnet_main.py:668-702)
        if idx == 0 and summary_writer is not None and \
                getattr(summary_writer, '_writer', None) is not None:
            try:
                from .utils.log_utils import colorize
                panel = np.concatenate([
                    np.clip(image / 255.0, 0.0, 1.0),
                    colorize(np.asarray(response_map)[None], 'inferno')[0],
                    colorize(output_depth[None] / 100.0, 'viridis')[0],
                    colorize(gt[None] / 100.0, 'viridis')[0],
                ], axis=0)
                summary_writer.add_image(
                    'val-image-output_response-output_depth-ground_truth',
                    panel, global_step=step)
            except Exception:
                pass

        v_out = (output_depth > 0).astype(np.int32)
        v_gt = (gt > 0).astype(np.int32)
        v_inter = v_out * v_gt
        n_valid_inter[idx] = v_inter.sum()
        n_valid_output[idx] = v_out.sum()
        n_valid_gt[idx] = v_gt.sum()

        min_max = np.logical_and(gt > min_evaluate_depth,
                                 gt < max_evaluate_depth)
        mask = np.where(np.logical_and(v_inter, min_max) > 0)
        out_i = output_depth[mask]
        gt_i = gt[mask]
        mae_i[idx] = eval_utils.mean_abs_err(1000.0 * out_i, 1000.0 * gt_i)
        rmse_i[idx] = eval_utils.root_mean_sq_err(1000.0 * out_i, 1000.0 * gt_i)
        imae_i[idx] = eval_utils.inv_mean_abs_err(0.001 * out_i, 0.001 * gt_i)
        irmse_i[idx] = eval_utils.inv_root_mean_sq_err(0.001 * out_i, 0.001 * gt_i)

    n_valid_output = np.mean(n_valid_output)
    n_valid_inter_mean = np.mean(n_valid_inter)
    n_valid_gt = np.mean(n_valid_gt)

    mae = np.mean(mae_i[~np.isnan(mae_i)])
    rmse = np.mean(rmse_i[~np.isnan(rmse_i)])
    imae = np.mean(imae_i[~np.isnan(imae_i)])
    irmse = np.mean(irmse_i[~np.isnan(irmse_i)])

    if summary_writer is not None:
        for k, v in [('mae_intersection', mae), ('rmse_intersection', rmse),
                     ('imae_intersection', imae), ('irmse_intersection', irmse),
                     ('n_valid_points_output', n_valid_output),
                     ('n_valid_points_intersection', n_valid_inter_mean)]:
            summary_writer.add_scalar('eval-' + k, v, global_step=step)

    log_evaluation_results(
        'Validation results', mae, rmse, imae, irmse, n_valid_output,
        n_valid_inter_mean, n_valid_gt, step, log_path)

    n_improve = 0
    n_improve += int(np.round(mae, 2) <= np.round(best_results['mae_intersection'], 2))
    n_improve += int(np.round(rmse, 2) <= np.round(best_results['rmse_intersection'], 2))
    n_improve += int(np.round(imae, 2) <= np.round(best_results['imae_intersection'], 2))
    n_improve += int(np.round(irmse, 2) <= np.round(best_results['irmse_intersection'], 2))
    n_improve += int(np.round(n_valid_inter_mean, 2) >=
                     np.round(best_results['n_valid_points_intersection'], 2))

    if n_improve > 3:
        best_results.update({
            'step': step,
            'mae_intersection': mae,
            'rmse_intersection': rmse,
            'imae_intersection': imae,
            'irmse_intersection': irmse,
            'n_valid_points_output': n_valid_output,
            'n_valid_points_ground_truth': n_valid_gt,
            'n_valid_points_intersection': n_valid_inter_mean,
        })

    log_evaluation_results(
        'Best results', best_results['mae_intersection'],
        best_results['rmse_intersection'], best_results['imae_intersection'],
        best_results['irmse_intersection'],
        best_results['n_valid_points_output'],
        best_results['n_valid_points_intersection'],
        best_results['n_valid_points_ground_truth'],
        best_results['step'], log_path)
    return best_results


def run(restore_path,
        image_path,
        radar_path,
        ground_truth_path,
        # Input settings
        patch_size,
        input_channels_image,
        input_channels_depth,
        normalized_image_range,
        # Network settings
        encoder_type,
        n_filters_encoder_image,
        n_neurons_encoder_depth,
        decoder_type,
        n_filters_decoder,
        # Weight settings
        weight_initializer,
        activation_func,
        # Output settings
        output_dirpath,
        save_outputs,
        keep_input_filenames,
        verbose=True,
        # Evaluation settings
        min_evaluate_depth=0.0,
        max_evaluate_depth=100.0,
        max_points_inference: int = 0,
        response_thr: float = 0.5,
        eval_batch_size: int = 8):
    """Scatter inference over a manifest; writes quasi-dense depth +
    response PNGs (reference src/radarnet_main.py:789-1101).
    eval_batch_size frames go through one dispatch (identical per-frame
    outputs to batch 1; the reference loops frame-at-a-time)."""

    os.makedirs(output_dirpath, exist_ok=True)
    log_path = os.path.join(output_dirpath, 'results.txt')

    image_paths = data_utils.read_paths(image_path)
    radar_paths = data_utils.read_paths(radar_path)
    n_sample = len(image_paths)

    ground_truth_available = (
        ground_truth_path is not None and ground_truth_path != '' and
        os.path.exists(ground_truth_path))
    ground_truth_paths = data_utils.read_paths(ground_truth_path) \
        if ground_truth_available else None

    dataset = RadarNetInferenceDataset(
        image_paths=image_paths,
        radar_paths=radar_paths,
        ground_truth_paths=ground_truth_paths,
        max_points=(None if max_points_inference is None or
                    max_points_inference <= 0 else max_points_inference))

    transforms = Transforms(normalized_image_range=normalized_image_range)

    model = _build_model(
        input_channels_image, input_channels_depth, patch_size, encoder_type,
        n_filters_encoder_image, n_neurons_encoder_depth, decoder_type,
        n_filters_decoder, weight_initializer, activation_func)
    params, state, step, _ = model.restore_checkpoint(restore_path)
    # inference-only optimizations: fold BN into conv weights; optional
    # bfloat16 serving (RCFD_COMPUTE_DTYPE=bfloat16)
    from .nn.core import cast_tree
    from .nn.optimize import fold_batch_norm
    params, state = fold_batch_norm(params, state)
    if os.environ.get('RCFD_COMPUTE_DTYPE') == 'bfloat16':
        params = cast_tree(params, jnp.bfloat16)
        state = cast_tree(state, jnp.bfloat16)

    sample_image = data_utils.load_image(image_paths[0])
    image_height, image_width = sample_image.shape[0], sample_image.shape[1]
    # production passes (saving PNGs, no eval) fetch codec-grid uint16
    # outputs — half the D2H bytes, byte-identical files (the bridge's
    # round-5 mode); eval passes keep f32 so the intersection metrics
    # run on unquantized maps like the reference's
    codec_d2h = bool(save_outputs) and not ground_truth_available
    forward_fn_b = make_forward_fn_batched(
        model, transforms, image_height, image_width, threshold=response_thr,
        codec_encode=codec_d2h)

    if save_outputs:
        output_dirs = {
            name: os.path.join(output_dirpath, name)
            for name in ['image', 'ground_truth', 'output_depth_radar',
                         'output_response_radar']
        }
        for dirpath in output_dirs.values():
            os.makedirs(dirpath, exist_ok=True)

    if ground_truth_available:
        mae_i = np.zeros(n_sample)
        rmse_i = np.zeros(n_sample)
        imae_i = np.zeros(n_sample)
        irmse_i = np.zeros(n_sample)

    output_depth_paths = []
    output_response_paths = []

    for idx, data, output_depth, output_response in iter_scatter_outputs(
            forward_fn_b, params, state, dataset, eval_batch_size):
        if ground_truth_available:
            image, points, valid, ground_truth = data
        else:
            image, points, valid = data

        if verbose:
            print('Processed {}/{} samples'.format(idx + 1, n_sample), end='\r')

        if ground_truth_available:
            gt = ground_truth[..., 0]
            v_inter = ((output_depth > 0) & (gt > 0))
            min_max = np.logical_and(gt > min_evaluate_depth,
                                     gt < max_evaluate_depth)
            mask = np.where(np.logical_and(v_inter, min_max))
            out_i, gt_i = output_depth[mask], gt[mask]
            mae_i[idx] = eval_utils.mean_abs_err(1000.0 * out_i, 1000.0 * gt_i)
            rmse_i[idx] = eval_utils.root_mean_sq_err(1000.0 * out_i, 1000.0 * gt_i)
            imae_i[idx] = eval_utils.inv_mean_abs_err(0.001 * out_i, 0.001 * gt_i)
            irmse_i[idx] = eval_utils.inv_root_mean_sq_err(0.001 * out_i, 0.001 * gt_i)

        if save_outputs:
            if keep_input_filenames:
                filename = os.path.splitext(
                    os.path.basename(image_paths[idx]))[0] + '.png'
            else:
                filename = '{:010d}.png'.format(idx)
            data_utils.save_image(
                image / 255.0, os.path.join(output_dirs['image'], filename))
            depth_out_path = os.path.join(
                output_dirs['output_depth_radar'], filename)
            response_out_path = os.path.join(
                output_dirs['output_response_radar'], filename)
            if codec_d2h:
                data_utils.save_depth_encoded(output_depth, depth_out_path)
                data_utils.save_response_encoded(output_response,
                                                 response_out_path)
            else:
                data_utils.save_depth(output_depth, depth_out_path)
                data_utils.save_response(output_response, response_out_path)
            output_depth_paths.append(depth_out_path)
            output_response_paths.append(response_out_path)
            if ground_truth_available:
                data_utils.save_depth(
                    gt, os.path.join(output_dirs['ground_truth'], filename))

    results = None
    if ground_truth_available:
        mae = np.mean(mae_i[~np.isnan(mae_i)])
        rmse = np.mean(rmse_i[~np.isnan(rmse_i)])
        imae = np.mean(imae_i[~np.isnan(imae_i)])
        irmse = np.mean(irmse_i[~np.isnan(irmse_i)])
        log_evaluation_results(
            'Evaluation results', mae, rmse, imae, irmse, 0, 0, 0, step,
            log_path)
        results = {'mae_intersection': float(mae),
                   'rmse_intersection': float(rmse),
                   'imae_intersection': float(imae),
                   'irmse_intersection': float(irmse)}
    return results, output_depth_paths, output_response_paths


def log_evaluation_results(title, mae, rmse, imae, irmse, n_valid_output,
                           n_valid_intersection, n_valid_ground_truth, step,
                           log_path=None):
    log('{}:'.format(title), log_path)
    log('{:>8}  {:>8}  {:>8}  {:>8}  {:>8}  {:>10}  {:>10}  {:>10}'.format(
        'Step', 'MAE', 'RMSE', 'iMAE', 'iRMSE', 'n_output', 'n_isect',
        'n_gt'), log_path)
    log('{:8}  {:8.3f}  {:8.3f}  {:8.3f}  {:8.3f}  {:10.1f}  {:10.1f}  {:10.1f}'
        .format(step, mae, rmse, imae, irmse, n_valid_output,
                n_valid_intersection, n_valid_ground_truth), log_path)

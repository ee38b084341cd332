"""FusionNet driver: train / validate / run.

TPU-native port of reference src/fusionnet_main.py. The hot path is one
jitted SPMD step: device-side augmentation -> forward -> GT dilation /
outlier removal -> masked multi-scale loss -> Adam, with gradients
psum-reduced over a 'data' mesh axis (replacing torch DataParallel).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .data import io as data_utils
from .data import transport
from .data.datasets import FusionNetInferenceDataset, FusionNetTrainingDataset
from .data.loader import DataLoader, iter_device_batches
from .data.transforms import Transforms
from .models.fusionnet import FusionNetModel
from .nn import functional as NF
from .parallel.mesh import get_mesh
from .parallel.optim import adam_step, init_adam
from .utils import eval_utils
from .utils.log_utils import log
from .utils.summary import SummaryWriter


def _build_model(input_channels_image, input_channels_depth, encoder_type,
                 n_filters_encoder_image, n_filters_encoder_depth, fusion_type,
                 decoder_type, n_resolutions_decoder, n_filters_decoder,
                 weight_initializer, activation_func, min_predict_depth,
                 max_predict_depth):
    return FusionNetModel(
        input_channels_image=input_channels_image,
        input_channels_depth=input_channels_depth,
        encoder_type=encoder_type,
        n_filters_encoder_image=n_filters_encoder_image,
        n_filters_encoder_depth=n_filters_encoder_depth,
        fusion_type=fusion_type,
        decoder_type=decoder_type,
        n_resolution_decoder=n_resolutions_decoder,
        n_filters_decoder=n_filters_decoder,
        deconv_type='up',
        activation_func=activation_func,
        weight_initializer=weight_initializer,
        min_predict_depth=min_predict_depth,
        max_predict_depth=max_predict_depth)


def _make_train_step(model: FusionNetModel,
                     transforms: Transforms,
                     loss_func: str,
                     w_smoothness: float,
                     w_lidar_loss: float,
                     w_weight_decay: float,
                     loss_smoothness_kernel_size: int,
                     outlier_kernel_size: int,
                     outlier_threshold: float,
                     dilation_kernel_size: int,
                     axis_name: Optional[str] = None):
    """Build the pure per-shard train step.

    RCFD_TRAIN_DTYPE=bfloat16 enables mixed precision: f32 master weights
    and optimizer state, bf16 network inputs (layers compute in the input
    dtype on the MXU), f32 losses/gradient accumulation."""
    compute_dtype = jnp.bfloat16 \
        if os.environ.get('RCFD_TRAIN_DTYPE') == 'bfloat16' else None

    def step(params, state, opt_state, batch, key, lr, aug_prob):
        # integer transport (uint8 image, uint16 streams) decodes to the
        # exact float32 values the host loader used to ship (transport.py)
        image, depth, response, ground_truth, lidar_map = transport.decode(batch)

        (image_t,), (depth, response, ground_truth, lidar_map) = \
            transforms.transform(
                key, [image],
                range_maps_arr=[depth, response, ground_truth, lidar_map],
                random_transform_probability=aug_prob)

        input_depth = jnp.concatenate([depth, response], axis=-1)
        if compute_dtype is not None:
            image_t = image_t.astype(compute_dtype)
            input_depth = input_depth.astype(compute_dtype)

        if dilation_kernel_size > 1:
            ground_truth = NF.max_pool2d(
                ground_truth, kernel_size=dilation_kernel_size, stride=1,
                padding=dilation_kernel_size // 2)
        if outlier_kernel_size > 1 and outlier_threshold > 0:
            ground_truth = NF.outlier_removal(
                ground_truth, outlier_kernel_size, outlier_threshold)

        validity_map_loss_smoothness = jnp.where(ground_truth > 0, 0.0, 1.0)

        def loss_fn(p):
            output_depth, new_state = model.apply(
                p, state, image_t, input_depth, training=True)
            loss, loss_info = model.compute_loss(
                image=image_t,
                output_depth=output_depth,
                ground_truth=ground_truth,
                lidar_map=lidar_map,
                loss_func=loss_func,
                w_smoothness=w_smoothness,
                loss_smoothness_kernel_size=loss_smoothness_kernel_size,
                validity_map_loss_smoothness=validity_map_loss_smoothness,
                w_lidar_loss=w_lidar_loss)
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


def make_forward_fn(model: FusionNetModel, transforms: Transforms,
                    codec_encode: bool = False):
    """Jitted inference forward over one normalized full-res frame.

    Accepts unpacked (B, H, W, C) streams or the loader's 2x2
    space-to-depth packed form (B, H/2, W/2, 4C) — detected by the image
    channel count; jit keys the graph on the shape. Packed depth and
    response interleave per phase so the concatenation equals
    pack2x2(concat(depth, response)), the channel order the packed stems
    assume (tests/test_s2d_stem.py pins the interleave).

    codec_encode: return the depth map quantized to the 16-bit PNG codec
    grid (uint16, floor(z*256) in f32 — the host codec's exact
    arithmetic) for production passes that only write PNGs: half the
    D2H bytes, byte-identical files via save_depth_encoded."""

    @jax.jit
    def forward(params, state, image, depth, response):
        image, depth, response = transport.decode((image, depth, response))
        (image_t,) = transforms.transform(
            jax.random.PRNGKey(0), [image], random_transform_probability=0.0)
        if image.shape[-1] in (4 * model.input_channels_image,
                               16 * model.input_channels_image):
            stacked = jnp.stack([depth, response], axis=-1)  # (B,h,w,4,2)
            input_depth = stacked.reshape(*depth.shape[:-1],
                                          2 * depth.shape[-1])
        else:
            input_depth = jnp.concatenate([depth, response], axis=-1)
        # follow the params' compute dtype (bf16 serving: cast params once)
        pdtype = jax.tree_util.tree_leaves(params)[0].dtype
        output_depth, _ = model.apply(
            params, state, image_t.astype(pdtype), input_depth.astype(pdtype),
            training=False)
        if codec_encode:
            return (output_depth.astype(jnp.float32) *
                    jnp.float32(256.0)).astype(jnp.uint16)
        return output_depth.astype(jnp.float32)

    return forward


def train(train_image_path,
          train_depth_path,
          train_response_path,
          train_ground_truth_path,
          train_lidar_map_path,
          val_image_path,
          val_depth_path,
          val_response_path,
          val_ground_truth_path,
          # Batch settings
          batch_size,
          n_height,
          n_width,
          # Input settings
          input_channels_image,
          input_channels_depth,
          normalized_image_range,
          # Network settings
          encoder_type,
          n_filters_encoder_image,
          n_filters_encoder_depth,
          fusion_type,
          decoder_type,
          n_filters_decoder,
          n_resolutions_decoder,
          min_predict_depth,
          max_predict_depth,
          # Weight settings
          weight_initializer,
          activation_func,
          # Training settings
          learning_rates,
          learning_schedule,
          # Loss settings
          loss_func,
          w_smoothness,
          w_lidar_loss,
          w_weight_decay,
          loss_smoothness_kernel_size,
          outlier_removal_kernel_size,
          outlier_removal_threshold,
          ground_truth_dilation_kernel_size,
          # Augmentation settings
          augmentation_probabilities,
          augmentation_schedule,
          augmentation_random_crop_type,
          augmentation_random_brightness,
          augmentation_random_contrast,
          augmentation_random_saturation,
          augmentation_random_flip_type,
          # Evaluation settings
          min_evaluate_depth,
          max_evaluate_depth,
          # Checkpoint settings
          checkpoint_dirpath,
          n_step_per_checkpoint,
          n_step_per_summary,
          start_step_validation,
          restore_path,
          # Hardware settings
          device='tpu',
          n_thread=8,
          n_data_parallel: Optional[int] = None,
          eval_batch_size: int = 1,
          seed: int = 0):
    """Training loop (reference src/fusionnet_main.py:13-474).
    eval_batch_size: full-res frames per dispatch during validation
    (identical metrics at any value; default 1 keeps HBM headroom while
    optimizer state is resident)."""

    _apply_device_preference(device)

    if not os.path.exists(checkpoint_dirpath):
        os.makedirs(checkpoint_dirpath)

    checkpoint_path = os.path.join(checkpoint_dirpath, 'model-{}.pth')
    log_path = os.path.join(checkpoint_dirpath, 'results.txt')
    event_path = os.path.join(checkpoint_dirpath, 'events')

    best_results = {
        'step': -1, 'mae': np.inf, 'rmse': np.inf,
        'imae': np.inf, 'irmse': np.inf,
    }

    # Paths
    train_image_paths = data_utils.read_paths(train_image_path)
    train_depth_paths = data_utils.read_paths(train_depth_path)
    train_response_paths = data_utils.read_paths(train_response_path)
    train_ground_truth_paths = data_utils.read_paths(train_ground_truth_path)
    train_lidar_map_paths = data_utils.read_paths(train_lidar_map_path)

    n_train_sample = len(train_image_paths)
    for paths in [train_depth_paths, train_response_paths,
                  train_ground_truth_paths, train_lidar_map_paths]:
        assert n_train_sample == len(paths)

    n_train_step = int(
        learning_schedule[-1] * np.ceil(n_train_sample / batch_size))

    # multi-host (DCN) data parallelism: one process per host, the
    # global 'data' mesh spans all hosts, each host feeds its slice
    from .parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()

    train_loader = DataLoader(
        FusionNetTrainingDataset(
            image_paths=train_image_paths,
            depth_paths=train_depth_paths,
            response_paths=train_response_paths,
            ground_truth_paths=train_ground_truth_paths,
            lidar_map_paths=train_lidar_map_paths,
            shape=(n_height, n_width),
            random_crop_type=augmentation_random_crop_type),
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
        random_flip_type=augmentation_random_flip_type)

    val_transforms = Transforms(normalized_image_range=normalized_image_range)

    val_image_paths = data_utils.read_paths(val_image_path)
    val_depth_paths = data_utils.read_paths(val_depth_path)
    val_response_paths = data_utils.read_paths(val_response_path)
    val_ground_truth_paths = data_utils.read_paths(val_ground_truth_path)
    n_val_sample = len(val_image_paths)
    for paths in [val_depth_paths, val_response_paths, val_ground_truth_paths]:
        assert n_val_sample == len(paths)

    val_dataset = FusionNetInferenceDataset(
        image_paths=val_image_paths,
        depth_paths=val_depth_paths,
        response_paths=val_response_paths,
        ground_truth_paths=val_ground_truth_paths)

    # Model
    model = _build_model(
        input_channels_image, input_channels_depth, encoder_type,
        n_filters_encoder_image, n_filters_encoder_depth, fusion_type,
        decoder_type, n_resolutions_decoder, n_filters_decoder,
        weight_initializer, activation_func, min_predict_depth,
        max_predict_depth)

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

    # Device mesh (data parallel)
    n_devices = n_data_parallel or jax.device_count()
    use_mesh = n_devices > 1
    axis_name = 'data' if use_mesh else None

    step_fn = _make_train_step(
        model, train_transforms, loss_func, w_smoothness, w_lidar_loss,
        w_weight_decay, loss_smoothness_kernel_size,
        outlier_removal_kernel_size, outlier_removal_threshold,
        ground_truth_dilation_kernel_size, axis_name=axis_name)

    if use_mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .parallel.mesh import data_parallel_step
        mesh = get_mesh(n_devices)
        assert batch_size % n_devices == 0, \
            'batch_size must divide the data-parallel device count'
        step_jit = data_parallel_step(mesh, step_fn)
        batch_sharding = NamedSharding(mesh, P('data'))
        replicated = NamedSharding(mesh, P())
        params = jax.device_put(params, replicated)
        state = jax.device_put(state, replicated)
        opt_state = jax.device_put(opt_state, replicated)
    else:
        batch_sharding = None
        step_jit = jax.jit(step_fn, donate_argnums=(0, 1, 2))
    forward_fn = make_forward_fn(model, val_transforms)

    is_lead = jax.process_index() == 0
    train_summary_writer = SummaryWriter(event_path + '-train',
                                         enabled=is_lead)
    val_summary_writer = SummaryWriter(event_path + '-val',
                                       enabled=is_lead)

    log('Tensorboard summaries: {} ({})'.format(
        'enabled' if train_summary_writer.enabled else 'DISABLED',
        event_path), log_path)
    log_training_banner(
        log_path, model=model, params=params, batch_size=batch_size,
        n_train_sample=n_train_sample, n_train_step=n_train_step,
        learning_rates=learning_rates, learning_schedule=learning_schedule,
        encoder_type=encoder_type, decoder_type=decoder_type,
        fusion_type=fusion_type, loss_func=loss_func,
        n_devices=n_devices if use_mesh else 1)

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
                jnp.float32(learning_rate), jnp.float32(augmentation_probability))

            trace_window.after_step(train_step)
            if (train_step % n_step_per_summary) == 0:
                for name, value in loss_info.items():
                    train_summary_writer.add_scalar(
                        'train-' + name, float(value), global_step=train_step)
                _log_image_summary(
                    train_summary_writer, 'train', train_step, forward_fn,
                    params, state, batch, max_predict_depth)

            if (train_step % n_step_per_checkpoint) == 0:
                loss_val = float(loss_info['loss'])
                time_elapse = (time.time() - time_start) / 3600
                time_remain = (n_train_step - train_step) * time_elapse / train_step
                steps_per_s = train_step / max(time.time() - time_start, 1e-6)
                log('Step={:6}/{}  Loss={:.5f}  Time Elapsed={:.2f}h  '
                    'Time Remaining={:.2f}h  {:.2f} steps/s '
                    '({:.1f} samples/s)'.format(
                        train_step, n_train_step, loss_val, time_elapse,
                        time_remain, steps_per_s, steps_per_s * batch_size),
                    log_path)

                if train_step >= start_step_validation:
                    best_results = validate(
                        model=model, params=params, state=state,
                        forward_fn=forward_fn, dataset=val_dataset,
                        step=train_step, best_results=best_results,
                        min_evaluate_depth=min_evaluate_depth,
                        max_evaluate_depth=max_evaluate_depth,
                        summary_writer=val_summary_writer,
                        log_path=log_path,
                        eval_batch_size=eval_batch_size)

                if is_lead:
                    model.save_checkpoint(
                    checkpoint_path.format(train_step), params, state,
                    step=train_step,
                    optimizer_state_dict=_export_opt(params, opt_state,
                                                     learning_rate,
                                                     w_weight_decay))

    trace_window.close()
    best_results = validate(
        model=model, params=params, state=state, forward_fn=forward_fn,
        dataset=val_dataset, step=train_step, best_results=best_results,
        min_evaluate_depth=min_evaluate_depth,
        max_evaluate_depth=max_evaluate_depth,
        summary_writer=val_summary_writer, log_path=log_path,
        eval_batch_size=eval_batch_size)

    if is_lead:
        model.save_checkpoint(
            checkpoint_path.format(train_step), params, state,
            step=train_step,
            optimizer_state_dict=_export_opt(params, opt_state,
                                             learning_rate,
                                             w_weight_decay))
    return best_results


def _log_image_summary(writer, tag, step, forward_fn, params, state, batch,
                       max_depth, n_display=4):
    """Colorized image panel + histograms (reference
    src/fusionnet_model.py:403-587). Best-effort: skipped when tensorboard
    is unavailable."""
    if writer is None or getattr(writer, '_writer', None) is None:
        return
    try:
        from .utils.log_utils import colorize
        image, depth, response, ground_truth, _ = transport.decode_np(
            [np.asarray(t[:n_display]) for t in batch])
        output = np.asarray(forward_fn(
            params, state, jnp.asarray(image), jnp.asarray(depth),
            jnp.asarray(response)))
        rows = [
            np.clip(image / 255.0, 0, 1),
            colorize(depth / max_depth, 'viridis'),
            colorize(output / max_depth, 'viridis'),
            colorize(ground_truth / max_depth, 'viridis'),
        ]
        panel = np.concatenate(
            [np.concatenate(list(r), axis=1) for r in rows], axis=0)
        writer.add_image(tag + '-image-depth-output-gt', panel,
                         global_step=step)
        writer.add_histogram(tag + '-output_depth_distro', output,
                             global_step=step)
        writer.add_histogram(tag + '-ground_truth_distro', ground_truth,
                             global_step=step)
    except Exception:
        pass


def _export_opt(params, opt_state, lr, weight_decay):
    from .utils.checkpoint import optax_adam_to_torch_state
    try:
        return optax_adam_to_torch_state(
            jax.device_get(params), jax.device_get(opt_state), lr, weight_decay)
    except Exception:
        return {}


def _apply_device_preference(device: str):
    """Honor the --device flag (reference runs torch .to(device); here it
    selects the JAX default device). 'tpu' (or 'cuda'/'gpu') means the
    accelerator backend JAX initialized with; 'cpu' forces host execution."""
    if device is None:
        return
    device = str(device).lower()
    if device in ('tpu', 'gpu', 'cuda', ''):
        return  # the accelerator backend is already the default
    if device == 'cpu':
        cpus = jax.devices('cpu')
        jax.config.update('jax_default_device', cpus[0])
    else:
        raise ValueError('unsupported device: {}'.format(device))


def iter_forward_outputs(forward_fn, params, state, dataset,
                         eval_batch_size: int, pack_s2d: bool = False,
                         pack_factor: int = 4):
    """Drive the (batch-polymorphic) FusionNet forward over an inference
    dataset, yielding per-frame (idx, sample_tuple, output_depth (H, W))
    in order. The tail batch is padded by repeating its last sample so
    one compiled shape serves the whole manifest; padded outputs are
    dropped. Per-frame results identical to batch 1.

    Host decode + H2D transfer for batch i+1 overlap the device compute
    of batch i (iter_device_batches double buffer); the device receives
    integer-transport arrays, the yielded host samples are decoded to the
    float32 values downstream numpy consumers expect.

    pack_s2d: space-to-depth pack (pack_factor x pack_factor) the device
    streams on the host (ops/s2d_stem.py; exact — the packed stems dodge
    the 128-lane padding tax on full-res reads). Frames whose dims do not
    divide by the factor fall back unpacked."""
    for idxs, samples, (images, depths, responses) in iter_device_batches(
            dataset, eval_batch_size, fields=(0, 1, 2),
            pack_fields=(0, 1, 2) if pack_s2d else (),
            pack_factor=pack_factor):
        outputs = np.asarray(
            forward_fn(params, state, images, depths, responses))
        for j, idx in enumerate(idxs):
            yield idx, transport.decode_np(samples[j]), outputs[j, :, :, 0]


def validate(model, params, state, forward_fn, dataset, step, best_results,
             min_evaluate_depth, max_evaluate_depth, summary_writer,
             log_path=None, eval_batch_size: int = 1):
    """Full-resolution validation (reference src/fusionnet_main.py:476-606).
    eval_batch_size frames go through one dispatch (identical per-frame
    metrics at any value)."""
    n_sample = len(dataset)
    mae = np.zeros(n_sample)
    rmse = np.zeros(n_sample)
    imae = np.zeros(n_sample)
    irmse = np.zeros(n_sample)

    for idx, sample, output_depth in iter_forward_outputs(
            forward_fn, params, state, dataset, eval_batch_size,
            pack_s2d=model.perf.s2d_input_enabled(),
            pack_factor=model.perf.s2d_factor):
        image, depth, response, ground_truth = sample
        gt = ground_truth[..., 0]

        # validation image panel for the first sample (the reference also
        # logs image/depth/output/gt montages during validation,
        # src/fusionnet_main.py:550-560)
        if idx == 0 and summary_writer is not None and \
                getattr(summary_writer, '_writer', None) is not None:
            try:
                from .utils.log_utils import colorize
                panel = np.concatenate([
                    np.clip(image / 255.0, 0.0, 1.0),
                    colorize(depth[None, ..., 0] / 100.0, 'viridis')[0],
                    colorize(output_depth[None] / 100.0, 'viridis')[0],
                    colorize(gt[None] / 100.0, 'viridis')[0],
                ], axis=0)
                summary_writer.add_image(
                    'val-image-input_depth-output_depth-ground_truth',
                    panel, global_step=step)
            except Exception:
                pass

        m = eval_utils.compute_all(output_depth, gt, min_evaluate_depth,
                                   max_evaluate_depth)
        mae[idx], rmse[idx] = m['mae'], m['rmse']
        imae[idx], irmse[idx] = m['imae'], m['irmse']

    mae, rmse, imae, irmse = (np.mean(mae), np.mean(rmse), np.mean(imae),
                              np.mean(irmse))

    if summary_writer is not None:
        for k, v in [('mae', mae), ('rmse', rmse), ('imae', imae),
                     ('irmse', irmse)]:
            summary_writer.add_scalar('eval-' + k, v, global_step=step)

    log_evaluation_results('Validation results', mae, rmse, imae, irmse, step,
                           log_path)

    n_improve = 0
    n_improve += int(np.round(mae, 2) <= np.round(best_results['mae'], 2))
    n_improve += int(np.round(rmse, 2) <= np.round(best_results['rmse'], 2))
    n_improve += int(np.round(imae, 2) <= np.round(best_results['imae'], 2))
    n_improve += int(np.round(irmse, 2) <= np.round(best_results['irmse'], 2))

    if n_improve > 2:
        best_results.update(
            {'step': step, 'mae': mae, 'rmse': rmse, 'imae': imae,
             'irmse': irmse})

    log_evaluation_results(
        'Best results', best_results['mae'], best_results['rmse'],
        best_results['imae'], best_results['irmse'], best_results['step'],
        log_path)
    return best_results


def run(restore_path,
        image_path,
        depth_path,
        response_path,
        ground_truth_path,
        # Input settings
        input_channels_image,
        input_channels_depth,
        normalized_image_range,
        # Network settings
        encoder_type,
        n_filters_encoder_image,
        n_filters_encoder_depth,
        fusion_type,
        decoder_type,
        n_filters_decoder,
        n_resolutions_decoder,
        min_predict_depth,
        max_predict_depth,
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
        eval_batch_size: int = 8):
    """Inference + evaluation over a manifest
    (reference src/fusionnet_main.py:608-896).

    eval_batch_size > 1 batches frames through one dispatch (identical
    per-sample metrics; the reference evaluates one frame at a time)."""

    os.makedirs(output_dirpath, exist_ok=True)
    log_path = os.path.join(output_dirpath, 'results.txt')

    image_paths = data_utils.read_paths(image_path)
    depth_paths = data_utils.read_paths(depth_path)
    response_paths = data_utils.read_paths(response_path)
    n_sample = len(image_paths)

    ground_truth_available = (
        ground_truth_path is not None and os.path.exists(ground_truth_path))
    if ground_truth_available:
        ground_truth_paths = data_utils.read_paths(ground_truth_path)
    else:
        ground_truth_paths = [None] * n_sample

    dataset = FusionNetInferenceDataset(
        image_paths=image_paths,
        depth_paths=depth_paths,
        response_paths=response_paths,
        ground_truth_paths=ground_truth_paths)

    transforms = Transforms(normalized_image_range=normalized_image_range)

    if save_outputs:
        output_dirs = {
            name: os.path.join(output_dirpath, name)
            for name in ['image', 'ground_truth', 'output_depth_fusion',
                         'output_depth_radar', 'output_response_radar']
        }
        for dirpath in output_dirs.values():
            os.makedirs(dirpath, exist_ok=True)

    model = _build_model(
        input_channels_image, input_channels_depth, encoder_type,
        n_filters_encoder_image, n_filters_encoder_depth, fusion_type,
        decoder_type, n_resolutions_decoder, n_filters_decoder,
        weight_initializer, activation_func, min_predict_depth,
        max_predict_depth)
    params, state, step, _ = model.restore_checkpoint(restore_path)
    # inference-only optimizations: fold BN into conv weights; optional
    # bfloat16 serving (RCFD_COMPUTE_DTYPE=bfloat16)
    from .nn.core import cast_tree
    from .nn.optimize import fold_batch_norm
    params, state = fold_batch_norm(params, state)
    if os.environ.get('RCFD_COMPUTE_DTYPE') == 'bfloat16':
        params = cast_tree(params, jnp.bfloat16)
        state = cast_tree(state, jnp.bfloat16)
    # production passes (PNGs only, no eval) fetch the codec-grid uint16
    # depth map — half the D2H bytes, byte-identical files; eval passes
    # keep f32 so metrics run on unquantized maps like the reference's
    codec_d2h = bool(save_outputs) and not ground_truth_available
    forward_fn = make_forward_fn(model, transforms, codec_encode=codec_d2h)

    log('Evaluation input paths:', log_path)
    for p in [image_path, depth_path, response_path] + \
            ([ground_truth_path] if ground_truth_available else []):
        log(str(p), log_path)
    log('', log_path)

    if ground_truth_available:
        mae = np.zeros(n_sample)
        rmse = np.zeros(n_sample)
        imae = np.zeros(n_sample)
        irmse = np.zeros(n_sample)

    for idx, sample, output_depth_fusion in iter_forward_outputs(
            forward_fn, params, state, dataset, eval_batch_size,
            pack_s2d=model.perf.s2d_input_enabled(),
            pack_factor=model.perf.s2d_factor):
        image, depth, response = sample[:3]
        if ground_truth_available:
            ground_truth = sample[3]

        if verbose:
            print('Processed {}/{} samples'.format(idx + 1, n_sample),
                  end='\r')

        if ground_truth_available:
            gt = ground_truth[..., 0]
            m = eval_utils.compute_all(
                output_depth_fusion, gt, min_evaluate_depth,
                max_evaluate_depth)
            mae[idx], rmse[idx] = m['mae'], m['rmse']
            imae[idx], irmse[idx] = m['imae'], m['irmse']

        if save_outputs:
            if keep_input_filenames:
                filename = os.path.splitext(
                    os.path.basename(image_paths[idx]))[0] + '.png'
            else:
                filename = '{:010d}.png'.format(idx)
            data_utils.save_image(
                image / 255.0,
                os.path.join(output_dirs['image'], filename))
            if codec_d2h:
                data_utils.save_depth_encoded(
                    output_depth_fusion,
                    os.path.join(output_dirs['output_depth_fusion'],
                                 filename))
            else:
                data_utils.save_depth(
                    output_depth_fusion,
                    os.path.join(output_dirs['output_depth_fusion'],
                                 filename))
            data_utils.save_depth(
                depth[..., 0],
                os.path.join(output_dirs['output_depth_radar'], filename))
            data_utils.save_response(
                response[..., 0],
                os.path.join(output_dirs['output_response_radar'],
                             filename))
            if ground_truth_available:
                data_utils.save_depth(
                    gt, os.path.join(output_dirs['ground_truth'],
                                     filename))

    if ground_truth_available:
        log_evaluation_results(
            'Evaluation results', np.mean(mae), np.mean(rmse), np.mean(imae),
            np.mean(irmse), step, log_path)
        return {'mae': float(np.mean(mae)), 'rmse': float(np.mean(rmse)),
                'imae': float(np.mean(imae)), 'irmse': float(np.mean(irmse))}
    return None


'''
Logging helpers
'''


def log_evaluation_results(title, mae, rmse, imae, irmse, step,
                           log_path=None):
    log('{}:'.format(title), log_path)
    log('{:>8}  {:>8}  {:>8}  {:>8}  {:>8}'.format(
        'Step', 'MAE', 'RMSE', 'iMAE', 'iRMSE'), log_path)
    log('{:8}  {:8.3f}  {:8.3f}  {:8.3f}  {:8.3f}'.format(
        step, mae, rmse, imae, irmse), log_path)


def log_training_banner(log_path, model, params, batch_size, n_train_sample,
                        n_train_step, learning_rates, learning_schedule,
                        encoder_type, decoder_type, fusion_type, loss_func,
                        n_devices):
    log('Network settings:', log_path)
    log('encoder_type={}  decoder_type={}  fusion_type={}'.format(
        encoder_type, decoder_type, fusion_type), log_path)
    log('n_parameters={}'.format(model.n_parameters(params)), log_path)
    log('', log_path)
    log('Training settings:', log_path)
    log('batch_size={}  n_train_sample={}  n_train_step={}  n_devices={}'.format(
        batch_size, n_train_sample, n_train_step, n_devices), log_path)
    log('learning_rates={}  learning_schedule={}  loss_func={}'.format(
        learning_rates, learning_schedule, loss_func), log_path)
    log('', log_path)

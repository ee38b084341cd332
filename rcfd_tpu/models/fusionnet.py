"""FusionNet model wrapper (TPU port of reference src/fusionnet_model.py).

Holds architecture config and provides pure apply/loss functions over
(params, state) pytrees, plus reference-compatible checkpoint I/O.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn import functional as F
from ..nn.core import tree_size
from ..utils import checkpoint as ckpt
from . import losses
from .networks import FusionNetEncoder, MultiScaleDecoder, ResNetEncoder


class FusionNetModel:
    """Two-branch fusion encoder + multi-scale decoder with sigmoid depth
    mapping (src/fusionnet_model.py:46-170)."""

    def __init__(self,
                 input_channels_image: int,
                 input_channels_depth: int,
                 encoder_type: str,
                 n_filters_encoder_image: List[int],
                 n_filters_encoder_depth: List[int],
                 fusion_type: str,
                 decoder_type: str,
                 n_resolution_decoder: int,
                 n_filters_decoder: List[int],
                 deconv_type: str = 'up',
                 activation_func: str = 'leaky_relu',
                 weight_initializer: str = 'kaiming_uniform',
                 min_predict_depth: float = 1.5,
                 max_predict_depth: float = 100.0,
                 perf=None):
        from ..nn.perf import PerfConfig
        self.perf = perf if perf is not None else PerfConfig.from_env()
        self.encoder_type = encoder_type
        self.input_channels_image = input_channels_image
        self.min_predict_depth = min_predict_depth
        self.max_predict_depth = max_predict_depth

        if fusion_type in ('add', 'weight', 'weight_and_project'):
            n_filters_encoder = list(n_filters_encoder_image)
        elif fusion_type == 'concat':
            n_filters_encoder = [
                i + z for i, z in zip(n_filters_encoder_image, n_filters_encoder_depth)
            ]
        else:
            raise ValueError('Unsupported fusion type: {}'.format(fusion_type))
        latent_channels = n_filters_encoder[-1]

        if 'fusionnet18' in encoder_type or 'resnet18' in encoder_type:
            n_layer = 18
        elif 'fusionnet34' in encoder_type or 'resnet34' in encoder_type:
            n_layer = 34
        else:
            raise ValueError('Unsupported encoder type: {}'.format(encoder_type))

        if 'fusionnet18' in encoder_type or 'fusionnet34' in encoder_type:
            self.encoder = FusionNetEncoder(
                n_layer=n_layer,
                input_channels_image=input_channels_image,
                input_channels_depth=input_channels_depth,
                n_filters_encoder_image=n_filters_encoder_image,
                n_filters_encoder_depth=n_filters_encoder_depth,
                weight_initializer=weight_initializer,
                activation_func=activation_func,
                use_batch_norm='batch_norm' in encoder_type,
                fusion_type=fusion_type,
                perf=self.perf)
            self.image_only = False
        else:
            self.encoder = ResNetEncoder(
                n_layer=n_layer,
                input_channels=input_channels_image,
                n_filters=n_filters_encoder_image,
                weight_initializer=weight_initializer,
                activation_func=activation_func,
                use_batch_norm='batch_norm' in encoder_type)
            n_filters_encoder = list(n_filters_encoder_image)
            latent_channels = n_filters_encoder[-1]
            self.image_only = True

        n_skips = n_filters_encoder[:-1]
        n_skips = n_skips[::-1] + [0]

        if 'multiscale' in decoder_type:
            self.decoder = MultiScaleDecoder(
                input_channels=latent_channels,
                output_channels=1,
                n_resolution=n_resolution_decoder,
                n_filters=n_filters_decoder,
                n_skips=n_skips,
                weight_initializer=weight_initializer,
                activation_func=activation_func,
                output_func='linear',
                use_batch_norm='batch_norm' in decoder_type,
                deconv_type=deconv_type,
                perf=self.perf)
        else:
            raise ValueError('Unsupported decoder type: {}'.format(decoder_type))

    # -- init / apply ---------------------------------------------------------

    def init(self, key) -> Tuple[Dict, Dict]:
        k_enc, k_dec = jax.random.split(key)
        enc_p, enc_s = self.encoder.init(k_enc)
        dec_p, dec_s = self.decoder.init(k_dec)
        params = {'encoder': enc_p, 'decoder': dec_p}
        state = {'encoder': enc_s, 'decoder': dec_s}
        return params, state

    def apply(self, params, state, image, input_depth, training: bool = False,
              return_multiscale: bool = False):
        """Forward pass. image/input_depth are NHWC; returns depth in
        [min_predict_depth, max_predict_depth] via
        min_d / (sigmoid(x) + min_d / max_d) (src/fusionnet_model.py:162-165)."""
        new_state = dict(state)
        if self.image_only:
            latent, skips, new_state['encoder'] = self.encoder(
                params['encoder'], state['encoder'], image, training=training)
        else:
            latent, skips, new_state['encoder'] = self.encoder(
                params['encoder'], state['encoder'], image, input_depth,
                training=training)
        h, w = image.shape[1:3]
        if image.shape[-1] == 4 * self.input_channels_image:
            # 2x2 space-to-depth packed input (ops/s2d_stem.py): the
            # full-res frame is (2h, 2w); the stems consume the packed
            # layout directly, everything downstream is scale-identical.
            h, w = 2 * h, 2 * w
        elif image.shape[-1] == 16 * self.input_channels_image:
            # 4x4-packed input (ops/packed_stage1.py)
            h, w = 4 * h, 4 * w
        outputs, new_state['decoder'] = self.decoder(
            params['decoder'], state['decoder'], latent, skips,
            shape=(h, w), training=training)
        outputs = [
            self.min_predict_depth /
            (jax.nn.sigmoid(out) + self.min_predict_depth / self.max_predict_depth)
            for out in outputs
        ]
        if return_multiscale:
            return outputs, new_state
        return outputs[-1], new_state

    # -- loss -----------------------------------------------------------------

    def compute_loss(self,
                     image,
                     output_depth,
                     ground_truth,
                     lidar_map,
                     loss_func: str,
                     w_smoothness: float,
                     loss_smoothness_kernel_size: int,
                     validity_map_loss_smoothness,
                     w_lidar_loss: float):
        """Masked multi-scale supervised + lidar + smoothness loss
        (src/fusionnet_model.py:172-302). All maps NHWC with C=1."""
        loss_supervised = 0.0
        loss_smoothness = 0.0
        loss_lidar = 0.0

        if w_lidar_loss > 0.0:
            mask_lidar = jnp.where(lidar_map > 0.0, 0.0, 1.0)
            ground_truth = ground_truth * mask_lidar

        validity_map_ground_truth = (ground_truth > 0).astype(jnp.float32)
        validity_map_lidar = (lidar_map > 0).astype(jnp.float32)

        if not isinstance(output_depth, (list, tuple)):
            output_depth = [output_depth]

        if loss_func == 'l1':
            loss_fn = losses.l1_loss
        elif loss_func == 'l2':
            loss_fn = losses.l2_loss
        elif loss_func == 'smoothl1':
            loss_fn = losses.smooth_l1_loss
        else:
            raise ValueError('No such loss: {}'.format(loss_func))

        n_scales = len(output_depth)
        for scale, output in enumerate(output_depth):
            oh, ow = output.shape[1:3]
            th, tw = ground_truth.shape[1:3]
            if oh > th and ow > tw:
                output = F.resize_bilinear_align_corners(output, (th, tw))

            w_scale = 1.0 / (2 ** (n_scales - scale - 1))

            loss_supervised = loss_supervised + w_scale * loss_fn(
                output, ground_truth, weight=validity_map_ground_truth)
            if w_lidar_loss > 0.0:
                loss_lidar = loss_lidar + w_scale * loss_fn(
                    output, lidar_map, weight=validity_map_lidar)

            if w_smoothness > 0.0:
                if loss_smoothness_kernel_size <= 1:
                    loss_smoothness = loss_smoothness + w_scale * \
                        losses.smoothness_loss_func(image=image, predict=output)
                else:
                    ks = (1, 1, loss_smoothness_kernel_size, loss_smoothness_kernel_size)
                    loss_smoothness = loss_smoothness + w_scale * \
                        losses.sobel_smoothness_loss_func(
                            predict=output,
                            image=image,
                            weights=validity_map_loss_smoothness,
                            filter_size=ks)

        loss = loss_supervised + w_smoothness * loss_smoothness + \
            w_lidar_loss * loss_lidar
        loss_info = {
            'loss': loss,
            'loss_supervised': loss_supervised,
            'loss_smoothness': loss_smoothness,
            'loss_lidar': loss_lidar,
        }
        return loss, loss_info

    # -- checkpointing ---------------------------------------------------------

    def save_checkpoint(self, path: str, params, state, step: int,
                        optimizer_state_dict: Optional[dict] = None):
        """Save in the reference .pth format (keys: train_step,
        optimizer_state_dict, encoder_state_dict, decoder_state_dict) or the
        native .npz format when the extension is .npz."""
        params = jax.device_get(params)
        state = jax.device_get(state)
        if path.endswith('.orbax'):
            ckpt.save_orbax_checkpoint(
                path, {'params': params, 'state': state},
                meta={'train_step': int(step), 'model': 'fusionnet'})
            return
        if path.endswith('.npz'):
            ckpt.save_native_checkpoint(
                path,
                {'params': params, 'state': state},
                meta={'train_step': int(step), 'model': 'fusionnet'})
            return
        checkpoint = {
            'train_step': int(step),
            'optimizer_state_dict': optimizer_state_dict or {},
            'encoder_state_dict': ckpt._merge_state_dict_order(
                params['encoder'], state['encoder']),
            'decoder_state_dict': ckpt._merge_state_dict_order(
                params['decoder'], state['decoder']),
        }
        ckpt.save_torch_checkpoint(path, checkpoint)

    def restore_checkpoint(self, path: str):
        """Returns (params, state, train_step, optimizer_state_dict)."""
        if path.endswith('.orbax') or path.endswith('.npz'):
            if path.endswith('.orbax'):
                trees, meta = ckpt.load_orbax_checkpoint(path)
            else:
                trees, meta = ckpt.load_native_checkpoint(path)
            # modules without buffers serialize as missing keys; conform to
            # the model's template so the state tree has every node
            tpl_p, tpl_s = jax.eval_shape(self.init, jax.random.PRNGKey(0))
            params = ckpt.conform_to_template(tpl_p, trees['params'])
            state = ckpt.conform_to_template(tpl_s, trees['state'],
                                             fill_missing=True)
            return params, state, int(meta.get('train_step', 0)), None
        checkpoint = ckpt.load_torch_checkpoint(path)
        enc_p, enc_s = ckpt.torch_state_dict_to_tree(checkpoint['encoder_state_dict'])
        dec_p, dec_s = ckpt.torch_state_dict_to_tree(checkpoint['decoder_state_dict'])
        params = {'encoder': enc_p, 'decoder': dec_p}
        state = {'encoder': enc_s, 'decoder': dec_s}
        tpl_p, tpl_s = jax.eval_shape(self.init, jax.random.PRNGKey(0))
        params = ckpt.conform_to_template(tpl_p, params)
        state = ckpt.conform_to_template(tpl_s, state, fill_missing=True)
        return params, state, int(checkpoint.get('train_step', 0)), \
            checkpoint.get('optimizer_state_dict')

    def n_parameters(self, params) -> int:
        return tree_size(params)

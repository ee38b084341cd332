"""RadarNet model wrapper (TPU port of reference src/radarnet_model.py)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.core import tree_size
from ..utils import checkpoint as ckpt
from . import losses
from .networks import MultiScaleDecoder, RadarNetV1Encoder


class RadarNetModel:
    """Per-radar-point correspondence network: ResNet image encoder +
    per-point ROI pooling + MLP point encoder + multi-scale decoder
    (src/radarnet_model.py:36-124)."""

    def __init__(self,
                 input_channels_image: int,
                 input_channels_depth: int,
                 input_patch_size_image: Tuple[int, int],
                 encoder_type: str,
                 n_filters_encoder_image: List[int],
                 n_neurons_encoder_depth: List[int],
                 decoder_type: str,
                 n_filters_decoder: List[int],
                 weight_initializer: str = 'kaiming_uniform',
                 activation_func: str = 'leaky_relu',
                 perf=None):
        from ..nn.perf import PerfConfig
        self.perf = perf if perf is not None else PerfConfig.from_env()
        self.input_patch_size_image = tuple(input_patch_size_image)

        height, width = self.input_patch_size_image
        latent_height = int(height // 32)
        latent_width = int(width // 32)
        latent_size_depth = latent_height * latent_width * list(n_neurons_encoder_depth)[-1]

        if 'radarnetv1' in encoder_type:
            self.encoder = RadarNetV1Encoder(
                input_channels_image=input_channels_image,
                input_channels_depth=input_channels_depth,
                input_patch_size_image=input_patch_size_image,
                n_filters_encoder_image=n_filters_encoder_image,
                n_neurons_encoder_depth=n_neurons_encoder_depth,
                latent_size_depth=latent_size_depth,
                weight_initializer=weight_initializer,
                activation_func=activation_func,
                use_batch_norm='batch_norm' in encoder_type,
                perf=self.perf)
        else:
            raise ValueError('Encoder type {} not supported.'.format(encoder_type))

        n_skips = list(n_filters_encoder_image)[:-1]
        n_skips = n_skips[::-1] + [0]
        latent_channels = list(n_filters_encoder_image)[-1] + \
            list(n_neurons_encoder_depth)[-1]

        if 'multiscale' in decoder_type:
            self.decoder = MultiScaleDecoder(
                input_channels=latent_channels,
                output_channels=1,
                n_resolution=1,
                n_filters=n_filters_decoder,
                n_skips=n_skips,
                weight_initializer=weight_initializer,
                activation_func=activation_func,
                output_func='linear',
                use_batch_norm='batch_norm' in decoder_type,
                deconv_type='up',
                perf=self.perf)
        else:
            raise ValueError('Decoder type {} not supported.'.format(decoder_type))

    def init(self, key):
        k_enc, k_dec = jax.random.split(key)
        enc_p, enc_s = self.encoder.init(k_enc)
        dec_p, dec_s = self.decoder.init(k_dec)
        return ({'encoder': enc_p, 'decoder': dec_p},
                {'encoder': enc_s, 'decoder': dec_s})

    def apply(self, params, state, image, points, x1, box_height=None,
              training: bool = False, return_logits: bool = True):
        """Forward pass.

        Arg(s):
            image : (B, H, W_pad, 3) padded image (NHWC)
            points : (B*K, 3) radar points
            x1 : (B, K) left edges of per-point boxes in padded coords
            box_height : static box height (defaults to image height)
            return_logits : logits if set, else sigmoid responses
        Returns:
            (B*K, ph, pw, 1) correspondence map, new_state
        """
        new_state = dict(state)
        latent, skips, new_state['encoder'] = self.encoder(
            params['encoder'], state['encoder'], image, points, x1,
            box_height=box_height, training=training)
        outputs, new_state['decoder'] = self.decoder(
            params['decoder'], state['decoder'], latent, skips,
            shape=self.input_patch_size_image, training=training)
        logits = outputs[-1]
        if return_logits:
            return logits, new_state
        return jax.nn.sigmoid(logits), new_state

    def apply_chunked(self, params, state, image, points, x1,
                      n_chunks: int, box_height=None,
                      training: bool = False, return_logits: bool = True):
        """Forward pass with the per-point half (ROI pools + MLP + patch
        decode) evaluated in `n_chunks` sequential chunks along the point
        axis. Identical results to apply(); peak memory for the per-point
        patch pyramids drops by n_chunks, which unlocks larger frame
        batches in the fused pipeline (serving throughput).

        Arg(s):
            points : (B, K, 3); x1 : (B, K); K must divide n_chunks
        Returns:
            (B, K, ph, pw, 1) maps, new_state
        """
        b, k = points.shape[0], points.shape[1]
        assert k % n_chunks == 0, (k, n_chunks)
        kc = k // n_chunks
        if box_height is None:
            box_height = image.shape[1]

        new_state = dict(state)
        latent_image, skips_image, new_state['encoder'] = {}, None, None
        enc_state = dict(state['encoder'])
        latent_image, skips_image, enc_state['encoder_image'] = \
            self.encoder.encode_image(params['encoder'], state['encoder'],
                                      image, training=training)

        # (B, n_chunks, kc, ...) -> map over chunks
        pts_c = jnp.transpose(
            points.reshape(b, n_chunks, kc, 3), (1, 0, 2, 3))
        x1_c = jnp.transpose(x1.reshape(b, n_chunks, kc), (1, 0, 2))

        def chunk_fn(args):
            pts, x1s = args  # (B, kc, 3), (B, kc)
            latent, skips, depth_state = self.encoder.fuse_points(
                params['encoder'], state['encoder'], latent_image,
                skips_image, pts.reshape(b * kc, 3), x1s,
                box_height, training=training)
            outputs, dec_state = self.decoder(
                params['decoder'], state['decoder'], latent, skips,
                shape=self.input_patch_size_image, training=training)
            out = outputs[-1].reshape(b, kc, *outputs[-1].shape[1:])
            return out, (depth_state, dec_state)

        outs, (depth_states, dec_states) = jax.lax.map(
            chunk_fn, (pts_c, x1_c))
        # (n_chunks, B, kc, ph, pw, 1) -> (B, K, ph, pw, 1)
        outs = jnp.transpose(outs, (1, 0, 2, 3, 4, 5)).reshape(
            b, k, *outs.shape[3:])

        # eval-mode states are unchanged; training should use apply()
        enc_state['encoder_depth'] = state['encoder']['encoder_depth']
        new_state['encoder'] = enc_state
        new_state['decoder'] = state['decoder']
        if return_logits:
            return outs, new_state
        return jax.nn.sigmoid(outs), new_state

    def compute_loss(self, logits, ground_truth, validity_map,
                     w_positive_class: float = 1.0):
        """Masked positive-weighted BCE normalized by the validity count
        (src/radarnet_model.py:126-167)."""
        loss = losses.binary_cross_entropy_with_logits(
            logits, ground_truth, pos_weight=w_positive_class)
        loss = validity_map * loss
        loss = jnp.sum(loss) / jnp.sum(validity_map)
        return loss, {'loss': loss}

    # -- checkpointing ---------------------------------------------------------

    def save_checkpoint(self, path: str, params, state, step: int,
                        optimizer_state_dict: Optional[dict] = None):
        """Reference .pth keys: train_step, radarnet_optimizer_state_dict,
        radarnet_encoder_state_dict, radarnet_decoder_state_dict."""
        params = jax.device_get(params)
        state = jax.device_get(state)
        if path.endswith('.orbax'):
            ckpt.save_orbax_checkpoint(
                path, {'params': params, 'state': state},
                meta={'train_step': int(step), 'model': 'radarnet'})
            return
        if path.endswith('.npz'):
            ckpt.save_native_checkpoint(
                path,
                {'params': params, 'state': state},
                meta={'train_step': int(step), 'model': 'radarnet'})
            return
        checkpoint = {
            'train_step': int(step),
            'radarnet_optimizer_state_dict': optimizer_state_dict or {},
            'radarnet_encoder_state_dict': ckpt._merge_state_dict_order(
                params['encoder'], state['encoder']),
            'radarnet_decoder_state_dict': ckpt._merge_state_dict_order(
                params['decoder'], state['decoder']),
        }
        ckpt.save_torch_checkpoint(path, checkpoint)

    def restore_checkpoint(self, path: str):
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
        enc_p, enc_s = ckpt.torch_state_dict_to_tree(
            checkpoint['radarnet_encoder_state_dict'])
        dec_p, dec_s = ckpt.torch_state_dict_to_tree(
            checkpoint['radarnet_decoder_state_dict'])
        params = {'encoder': enc_p, 'decoder': dec_p}
        state = {'encoder': enc_s, 'decoder': dec_s}
        tpl_p, tpl_s = jax.eval_shape(self.init, jax.random.PRNGKey(0))
        params = ckpt.conform_to_template(tpl_p, params)
        state = ckpt.conform_to_template(tpl_s, state, fill_missing=True)
        return params, state, int(checkpoint.get('train_step', 0)), \
            checkpoint.get('radarnet_optimizer_state_dict')

    def n_parameters(self, params) -> int:
        return tree_size(params)

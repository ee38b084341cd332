"""Fused two-stage pipeline: RadarNet -> quasi-dense scatter -> FusionNet
as ONE jitted program per frame.

The reference composes the stages through the filesystem (stage 1.5 writes
16-bit PNGs that stage 2 reads back — setup/setup_dataset_nuscenes_radarnet.py);
here the full camera+radar -> dense-depth path runs on device with no host
round trip, while the PNG/manifest path is retained for drop-in CLI parity
(setup/ and run_*.py).

Faithful detail: the bridge writes responses with save_response (x2^14) but
FusionNet's datasets read them back with load_depth (x256)
(src/datasets.py:412-415), so the fused path scales the response by
2^14/256 = 64 to reproduce what a FusionNet checkpoint actually saw.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .data import transport
from .data.transforms import Transforms
from .models.fusionnet import FusionNetModel
from .models.radarnet import RadarNetModel
from .nn.perf import PerfConfig, with_perf
from .ops.scatter import scatter_quasi_dense

# load_depth(multiplier=256) applied to a save_response(x2^14) PNG
RESPONSE_DECODE_SCALE = float(2 ** 14) / 256.0


def _codec_encode_outputs(dense, quasi, response):
    """Quantize the three serving outputs to the 16-bit PNG codec grid
    (uint16) on device: floor(x*256) for the depths, floor(x*2^14) for
    the response — exactly the host codec's f32 arithmetic (data/io.py
    save_depth/save_response; both multipliers are powers of two so the
    product is exact). Halves D2H bytes; files via save_*_encoded are
    byte-identical to the float32 path's."""
    m = jnp.float32(256.0)
    r = jnp.float32(2.0 ** 14)
    return ((dense.astype(jnp.float32) * m).astype(jnp.uint16),
            (quasi.astype(jnp.float32) * m).astype(jnp.uint16),
            (response.astype(jnp.float32) * r).astype(jnp.uint16))


class TwoStagePipeline:
    """End-to-end camera+radar -> dense depth."""

    def __init__(self,
                 radarnet: RadarNetModel,
                 fusionnet: FusionNetModel,
                 radarnet_variables: Tuple,
                 fusionnet_variables: Tuple,
                 image_height: int,
                 image_width: int,
                 normalized_image_range=(0, 1),
                 quantize_bridge: bool = True,
                 optimize: bool = False,
                 compute_dtype=None,
                 codec_encode: bool = False):
        """quantize_bridge: round the quasi-dense maps through the 16-bit
        PNG codec quantization (x256 / x2^14) to bit-match the file-based
        two-stage path. optimize: fold BN into conv weights (inference
        only). compute_dtype: e.g. jnp.bfloat16 for MXU serving.
        codec_encode: return all three output streams quantized to the
        16-bit PNG codec grid as uint16 ON DEVICE (floor(x*256) for the
        depths, floor(x*2^14) for the response — the host codec's exact
        arithmetic) for production passes that only write PNGs: half the
        D2H bytes, byte-identical files via save_*_encoded."""
        self.radarnet = radarnet
        # Widen FusionNet's fast-decoder width gate to the frame width
        # inside the fused pipeline ONLY (measured 40.9 -> 40.1 ms/frame
        # at B=4 K=64): the conservative 256 default protects standalone
        # batch-32 FusionNet serving, which OOMs with the gate lifted.
        # with_perf re-perfs a config-only copy, so a standalone trace of
        # the caller's model object is unaffected (no env mutation — this
        # replaces the round-3 _default_env trace-time hack).
        fn_perf = getattr(fusionnet, 'perf', None) or PerfConfig.from_env()
        if fn_perf.fast_max_width is None:
            self.fusionnet = with_perf(
                fusionnet,
                fn_perf.replace(fast_max_width=max(image_width, 256)))
        else:
            self.fusionnet = fusionnet
        # Serving-graph composite choices (PerfConfig; RCFD_* env vars are
        # honored once, at construction): the XLA scatter fuses better
        # than the Pallas kernel INSIDE this graph (39.9 vs 40.1 ms/frame
        # with the take window gather) even though Pallas wins isolated.
        rn_perf = getattr(radarnet, 'perf', None) or PerfConfig.from_env()
        self._use_pallas_scatter = bool(rn_perf.pallas_scatter)
        self._decode_chunks = rn_perf.decode_chunks
        # host-side space-to-depth packing of the padded camera frame for
        # the batched serving paths (exact; PerfConfig.s2d_input)
        self._s2d_pack = (rn_perf.s2d_factor
                          if rn_perf.s2d_input_enabled() else 0)
        self.radarnet_params, self.radarnet_state = radarnet_variables
        self.fusionnet_params, self.fusionnet_state = fusionnet_variables
        if optimize:
            from .nn.optimize import fold_batch_norm
            self.radarnet_params, self.radarnet_state = fold_batch_norm(
                self.radarnet_params, self.radarnet_state)
            self.fusionnet_params, self.fusionnet_state = fold_batch_norm(
                self.fusionnet_params, self.fusionnet_state)
        if compute_dtype is not None:
            from .nn.core import cast_tree
            self.radarnet_params = cast_tree(self.radarnet_params, compute_dtype)
            self.radarnet_state = cast_tree(self.radarnet_state, compute_dtype)
            self.fusionnet_params = cast_tree(self.fusionnet_params, compute_dtype)
            self.fusionnet_state = cast_tree(self.fusionnet_state, compute_dtype)
        self.compute_dtype = compute_dtype
        self.image_height = image_height
        self.image_width = image_width
        self.transforms = Transforms(
            normalized_image_range=list(normalized_image_range))
        self.quantize_bridge = quantize_bridge
        self.codec_encode = codec_encode
        self._forward = jax.jit(self._build_forward())

    def _build_forward(self):
        patch_size = self.radarnet.input_patch_size_image
        pad = patch_size[1] // 2
        h, w = self.image_height, self.image_width
        quantize = self.quantize_bridge
        codec = self.codec_encode

        compute_dtype = self.compute_dtype

        def forward(rn_params, rn_state, fn_params, fn_state, image, points,
                    valid):
            # image: (1, H, W, 3) in [0, 255] (uint8 under integer
            # transport; the decode is an exact cast — data/transport.py)
            image = transport.decode(image)
            (image_t,) = self.transforms.transform(
                jax.random.PRNGKey(0), [image],
                random_transform_probability=0.0)
            if compute_dtype is not None:
                # image only: points are pixel coordinates (bf16 steps of
                # 8 above x=1024 would shift boxes/scatter columns by up
                # to 4 px); the MLP runs f32 and its features join the
                # image branch in bf16 at the bottleneck
                image_t = image_t.astype(compute_dtype)

            # ---- stage 1: RadarNet ------------------------------------
            image_pad = jnp.pad(image_t, ((0, 0), (0, 0), (pad, pad), (0, 0)),
                                mode='edge')
            x_shifted = points[:, 0] + pad
            points_shifted = points.at[:, 0].set(x_shifted)
            x1 = (x_shifted - pad)[None, :]
            responses, _ = self.radarnet.apply(
                rn_params, rn_state, image_pad, points_shifted, x1,
                box_height=h, training=False, return_logits=False)
            # keep crops in the compute dtype: bf16 halves the scatter's
            # dominant HBM read and the f32 upcast inside both scatter
            # impls is exact (winners and the 14-bit codec quantization
            # are unchanged)
            crops = responses[..., 0]
            xs = x_shifted.astype(jnp.float32)
            zs = points[:, 2].astype(jnp.float32)
            # XLA scatter default — fuses better than the Pallas kernel
            # inside the serving graph since the take window gather
            # (see _build_forward_batched); PerfConfig.pallas_scatter
            # opts in
            use_pallas = self._use_pallas_scatter
            from .ops.scatter_pallas import MAX_POINTS as _PALLAS_MAX_K
            if use_pallas and crops.shape[0] <= _PALLAS_MAX_K:
                from .ops.scatter_pallas import scatter_quasi_dense_pallas
                depth_map, response_map = scatter_quasi_dense_pallas(
                    crops, xs, zs, valid, image_height=h, image_width=w,
                    patch_size=patch_size)
            else:
                depth_map, response_map = scatter_quasi_dense(
                    crops, xs, zs, valid, image_height=h, image_width=w,
                    patch_size=patch_size)

            # ---- bridge (PNG codec emulation) --------------------------
            if quantize:
                depth_map = jnp.floor(depth_map * 256.0) / 256.0
                response_map = jnp.floor(response_map * (2.0 ** 14)) / (2.0 ** 14)
            response_in = response_map * RESPONSE_DECODE_SCALE

            # ---- stage 2: FusionNet -----------------------------------
            input_depth = jnp.stack([depth_map, response_in], axis=-1)[None]
            if compute_dtype is not None:
                input_depth = input_depth.astype(compute_dtype)
            # self.fusionnet is the re-perfed (frame-width fast-decoder
            # gate) copy built in __init__
            output_depth, _ = self.fusionnet.apply(
                fn_params, fn_state, image_t, input_depth,
                training=False)
            outs = (output_depth[0, :, :, 0].astype(jnp.float32),
                    depth_map, response_map)
            return _codec_encode_outputs(*outs) if codec else outs

        return forward

    def __call__(self, image, points, valid):
        """Returns (dense_depth (H, W), quasi_depth (H, W), response (H, W))."""
        return self._forward(
            self.radarnet_params, self.radarnet_state,
            self.fusionnet_params, self.fusionnet_state,
            image, points, valid)

    def _build_forward_batched(self):
        """Batched-over-frames variant: amortizes fixed costs and raises
        MXU utilization on the small stages — the throughput serving path
        (fps = B / t). Per-frame results identical to __call__."""
        patch_size = self.radarnet.input_patch_size_image
        pad = patch_size[1] // 2
        h, w = self.image_height, self.image_width
        quantize = self.quantize_bridge
        codec = self.codec_encode
        compute_dtype = self.compute_dtype

        def forward(rn_params, rn_state, fn_params, fn_state, images, points,
                    valid):
            # images: (B, H, W, 3) uint8 under integer transport — or the
            # space-to-depth packed PADDED frame
            # (B, H/f, (W+2*pad)/f, f*f*3) produced by the host packer
            # (forward_batched packs when PerfConfig.s2d_input is on):
            # the edge pad happens on the host BEFORE packing (exact; an
            # edge pad of the packed layout would replicate 2-4 column
            # phases instead of the last column), and pad % f == 0 keeps
            # the unpadded frame a contiguous phase-aligned slice.
            packed_f = 0
            for f in (2, 4):
                if images.shape[-1] == f * f * 3:
                    packed_f = f
            images = transport.decode(images)
            b, k = points.shape[0], points.shape[1]
            (images_t,) = self.transforms.transform(
                jax.random.PRNGKey(0), [images],
                random_transform_probability=0.0)
            if compute_dtype is not None:
                # image only — see _build_forward: coordinates stay f32
                images_t = images_t.astype(compute_dtype)

            if packed_f:
                fp = pad // packed_f
                images_pad = images_t
                # FusionNet consumes the UNPADDED frame: with pad % f ==
                # 0 the phase grids align, so the packed unpadded frame
                # is a plain column slice of the packed padded one
                images_fn = images_t[:, :, fp:fp + w // packed_f, :]
            else:
                images_pad = jnp.pad(
                    images_t, ((0, 0), (0, 0), (pad, pad), (0, 0)),
                    mode='edge')
                images_fn = images_t
            x_shifted = points[..., 0] + pad            # (B, K)
            points_shifted = points.at[..., 0].set(x_shifted)
            x1 = x_shifted - pad                        # (B, K)

            # chunk the per-point decode so its patch-pyramid peak memory
            # stays at ~512 patches regardless of the frame batch.
            # Measured round-3 (K=64): chunking always hurts at <= 512
            # patches (B=8 chunks 1/2/4 = 44.6/49.5/53.7 ms/frame; B=4
            # chunks 1/2 = 44.5/48.4) and B=8 unchunked now fits since
            # the width-gated fast decoder freed HBM — the 512 threshold
            # keeps the protection for large auto-sized K only.
            # PerfConfig.decode_chunks overrides
            if self._decode_chunks is not None:
                n_chunks = max(1, self._decode_chunks)
            else:
                n_chunks = max(1, (b * k) // 512)
            while n_chunks > 1 and k % n_chunks != 0:
                n_chunks -= 1

            if n_chunks > 1:
                responses, _ = self.radarnet.apply_chunked(
                    rn_params, rn_state, images_pad, points_shifted, x1,
                    n_chunks=n_chunks, box_height=h, training=False,
                    return_logits=False)
                crops = responses[..., 0]
            else:
                responses, _ = self.radarnet.apply(
                    rn_params, rn_state, images_pad,
                    points_shifted.reshape(b * k, 3), x1,
                    box_height=h, training=False, return_logits=False)
                crops = responses[..., 0].reshape(
                    b, k, *responses.shape[1:3])
            xs = x_shifted.astype(jnp.float32)
            zs = points[..., 2].astype(jnp.float32)

            # In THIS batched serving graph the XLA scatter composite
            # fuses better than the Pallas kernel (39.9 vs 40.1 ms/frame
            # at B=4 K=64 with the take window gather, tools/pipebisect
            # round-3) even though the Pallas kernel wins isolated —
            # default XLA here; PerfConfig.pallas_scatter opts back in.
            use_pallas = self._use_pallas_scatter

            from .ops.scatter_pallas import MAX_POINTS as _PALLAS_MAX_K

            def scatter_one(args):
                crops_i, xs_i, zs_i, valid_i = args
                if use_pallas and k <= _PALLAS_MAX_K:
                    from .ops.scatter_pallas import scatter_quasi_dense_pallas
                    return scatter_quasi_dense_pallas(
                        crops_i, xs_i, zs_i, valid_i, image_height=h,
                        image_width=w, patch_size=patch_size)
                return scatter_quasi_dense(
                    crops_i, xs_i, zs_i, valid_i, image_height=h,
                    image_width=w, patch_size=patch_size)

            depth_map, response_map = jax.lax.map(
                scatter_one, (crops, xs, zs, valid))  # (B, H, W) each

            if quantize:
                depth_map = jnp.floor(depth_map * 256.0) / 256.0
                response_map = jnp.floor(
                    response_map * (2.0 ** 14)) / (2.0 ** 14)
            response_in = response_map * RESPONSE_DECODE_SCALE

            input_depth = jnp.stack([depth_map, response_in], axis=-1)
            if compute_dtype is not None:
                input_depth = input_depth.astype(compute_dtype)
            if packed_f:
                # scatter maps are born on device at full res; packing
                # them in-graph engages FusionNet's packed stage 1
                # (ops/packed_stage1.py) alongside the packed image
                from .ops.s2d_stem import pack_jnp
                input_depth = pack_jnp(input_depth, packed_f)
            # let FusionNet's decoder take the fast (split-conv) paths on
            # full-width maps: at serving batches the HBM headroom that
            # motivated the 256 gate exists, and it measured
            # 40.9 -> 40.1 ms/frame (B=4 K=64, tools/pipebisect round-3).
            # The 256 default stays for standalone batch-32 FusionNet
            # serving, which OOMs with the gate lifted (self.fusionnet is
            # the re-perfed frame-width copy built in __init__).
            output_depth, _ = self.fusionnet.apply(
                fn_params, fn_state, images_fn, input_depth,
                training=False)
            outs = (output_depth[..., 0].astype(jnp.float32),
                    depth_map, response_map)
            return _codec_encode_outputs(*outs) if codec else outs

        return forward

    def _maybe_pack_images(self, images):
        """Host-side edge-pad + FxF space-to-depth of a numpy frame batch
        (PerfConfig.s2d_input). Device arrays and non-dividing dims pass
        through unpacked — the jitted forward accepts both forms."""
        import numpy as np
        f = self._s2d_pack
        if not f or not isinstance(images, np.ndarray):
            return images
        pad = self.radarnet.input_patch_size_image[1] // 2
        h, w = self.image_height, self.image_width
        if images.ndim != 4 or images.shape[1:3] != (h, w) or \
                h % f or w % f or pad % f:
            return images
        from .ops.s2d_stem import pack_np
        images = np.pad(images, ((0, 0), (0, 0), (pad, pad), (0, 0)),
                        mode='edge')
        return pack_np(images, f)

    def forward_batched(self, images, points, valid):
        """Batched serving path. images (B, H, W, 3) in [0, 255]; points
        (B, K, 3); valid (B, K). Returns (dense (B, H, W), quasi (B, H, W),
        response (B, H, W))."""
        images = self._maybe_pack_images(images)
        if not hasattr(self, '_forward_b'):
            self._forward_b = jax.jit(self._build_forward_batched())
        return self._forward_b(
            self.radarnet_params, self.radarnet_state,
            self.fusionnet_params, self.fusionnet_state,
            images, points, valid)

    def forward_sharded(self, images, points, valid, mesh=None):
        """Data-parallel serving over a device mesh: the frame batch is
        sharded on the 'data' axis (shard_map, so per-shard control flow
        like the scatter lax.map stays local — no cross-device gathers),
        parameters replicated. The inference-side counterpart of the
        reference's DataParallel (src/radarnet_model.py:260-266).

        Arg(s) as forward_batched; the leading batch dim must divide by
        the mesh size. Per-frame results identical to forward_batched."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        images = self._maybe_pack_images(images)

        if mesh is None:
            from .parallel.mesh import get_mesh
            mesh = get_mesh()
        if getattr(self, '_forward_sharded_mesh', None) != mesh:
            fwd = self._build_forward_batched()
            fn = shard_map(
                fwd, mesh=mesh,
                in_specs=(P(), P(), P(), P(),
                          P('data'), P('data'), P('data')),
                out_specs=(P('data'), P('data'), P('data')),
                check_rep=False)
            self._forward_sharded = jax.jit(fn)
            self._forward_sharded_mesh = mesh
        return self._forward_sharded(
            self.radarnet_params, self.radarnet_state,
            self.fusionnet_params, self.fusionnet_state,
            images, points, valid)

    def from_raw_radar(self, image, points_sensor, valid,
                       sensor_to_camera, intrinsics,
                       min_distance_from_camera: float = 1.0):
        """Full fused path from RAW radar returns in the sensor frame:
        pose-chain projection (geometry kernels) -> RadarNet -> scatter ->
        FusionNet, one program. Replaces the reference's offline radar
        projection (setup/setup_dataset_nuscenes.py:616-797) for serving.

        Arg(s):
            points_sensor : (K, 3) radar returns in the radar sensor frame
            sensor_to_camera : 4x4 rigid transform (see
                geometry.sensor_to_camera_matrix)
            intrinsics : 3x3 camera matrix
        """
        from .geometry.transforms import project_points_to_image

        if not hasattr(self, '_forward_raw'):
            h, w = self.image_height, self.image_width

            def fwd(rn_p, rn_s, fn_p, fn_s, image, pts, valid, m, k):
                xy, depth, proj_mask = project_points_to_image(
                    pts, m, k, h, w,
                    min_distance_from_camera=min_distance_from_camera)
                # image-plane points: rounded pixel x, y + metric z
                # (the .npy contract produced by stage 0)
                points_img = jnp.stack(
                    [jnp.round(xy[:, 0]), jnp.round(xy[:, 1]), depth],
                    axis=-1).astype(jnp.float32)
                valid_all = valid & proj_mask
                points_img = jnp.where(valid_all[:, None], points_img, 0.0)
                return self._forward(rn_p, rn_s, fn_p, fn_s, image,
                                     points_img, valid_all)

            self._forward_raw = jax.jit(fwd)
        return self._forward_raw(
            self.radarnet_params, self.radarnet_state,
            self.fusionnet_params, self.fusionnet_state,
            image, points_sensor, valid, sensor_to_camera, intrinsics)

    @classmethod
    def from_checkpoints(cls,
                         radarnet_restore_path: str,
                         fusionnet_restore_path: str,
                         image_height: int = 900,
                         image_width: int = 1600,
                         patch_size=(900, 288),
                         radarnet_kwargs: Optional[dict] = None,
                         fusionnet_kwargs: Optional[dict] = None,
                         **kwargs):
        """Build from the reference's canonical configs + two checkpoints."""
        rn_kwargs = dict(
            input_channels_image=3,
            input_channels_depth=3,
            input_patch_size_image=tuple(patch_size),
            encoder_type='radarnetv1_batch_norm',
            n_filters_encoder_image=[32, 64, 128, 128, 128],
            n_neurons_encoder_depth=[32, 64, 128, 128, 128],
            decoder_type='multiscale_batch_norm',
            n_filters_decoder=[256, 128, 64, 32, 16])
        rn_kwargs.update(radarnet_kwargs or {})
        fn_kwargs = dict(
            input_channels_image=3,
            input_channels_depth=2,
            encoder_type='fusionnet18_batch_norm',
            n_filters_encoder_image=[32, 64, 128, 256, 256, 256],
            n_filters_encoder_depth=[16, 32, 64, 128, 128, 128],
            fusion_type='weight_and_project',
            decoder_type='multiscale_batch_norm',
            n_resolution_decoder=1,
            n_filters_decoder=[256, 256, 128, 64, 64, 32],
            min_predict_depth=1.0,
            max_predict_depth=100.0)
        fn_kwargs.update(fusionnet_kwargs or {})

        radarnet = RadarNetModel(**rn_kwargs)
        fusionnet = FusionNetModel(**fn_kwargs)
        rn_p, rn_s, _, _ = radarnet.restore_checkpoint(radarnet_restore_path)
        fn_p, fn_s, _, _ = fusionnet.restore_checkpoint(fusionnet_restore_path)
        return cls(radarnet, fusionnet, (rn_p, rn_s), (fn_p, fn_s),
                   image_height, image_width, **kwargs)

"""On-device, jittable batched augmentations.

Port of the reference's Transforms classes (src/radarnet_transforms.py,
src/fusionnet_transforms.py): per-sample Bernoulli(p) AND Bernoulli(0.5)
gates for brightness/contrast/saturation, optional point noise,
horizontal/vertical flips with bounding-box fix-up, and image
normalization. Everything is a pure function of (rng key, arrays,
probability) so it fuses into the jitted train step — the reference runs
these as a Python loop over torchvision calls per sample.

Integer-image semantics: the reference casts [0,255] float images to int
before the photometric ops (src/radarnet_transforms.py:100-103), and
torchvision's _blend then does float math, clamps to the dtype bound and
truncates back. We reproduce that with floor/clip on float arrays.

Faithful quirk: flips mirror images/labels/boxes but NOT the radar point
coordinates fed to the MLP (the reference never updates points_arr on
flip).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

_INT32_MAX = 2147483647.0


def _rgb_to_grayscale(images, truncate):
    gray = (images[..., 0] * 0.2989 + images[..., 1] * 0.587 +
            images[..., 2] * 0.114)[..., None]
    return jnp.where(truncate, jnp.floor(gray), gray)


def _blend(img1, img2, ratio, truncate, bound):
    out = ratio * img1 + (1.0 - ratio) * img2
    out = jnp.clip(out, 0.0, bound)
    return jnp.where(truncate, jnp.floor(out), out)


class Transforms:
    """Unified radarnet/fusionnet transform pipeline."""

    def __init__(self,
                 normalized_image_range=(0, 255),
                 random_brightness=(-1,),
                 random_contrast=(-1,),
                 random_saturation=(-1,),
                 random_noise_type: str = 'none',
                 random_noise_spread: float = -1,
                 random_flip_type: Sequence[str] = ('none',)):
        self.normalized_image_range = list(normalized_image_range)
        self.do_random_brightness = -1 not in random_brightness
        self.random_brightness = list(random_brightness)
        self.do_random_contrast = -1 not in random_contrast
        self.random_contrast = list(random_contrast)
        self.do_random_saturation = -1 not in random_saturation
        self.random_saturation = list(random_saturation)
        self.do_random_noise = (
            random_noise_type != 'none' and random_noise_spread > -1)
        self.random_noise_type = random_noise_type
        self.random_noise_spread = random_noise_spread
        self.do_random_horizontal_flip = 'horizontal' in random_flip_type
        self.do_random_vertical_flip = 'vertical' in random_flip_type

    # -- building blocks ------------------------------------------------------

    def _photometric(self, key, images, do_transform, truncate):
        """images: (B, H, W, 3); do_transform: (B,) bool."""
        n_batch = images.shape[0]
        bound = jnp.where(truncate, _INT32_MAX, 1.0)

        def gated(key, lo, hi):
            k1, k2 = jax.random.split(key)
            gate = jnp.logical_and(
                do_transform, jax.random.uniform(k1, (n_batch,)) <= 0.5)
            vals = jax.random.uniform(k2, (n_batch,))
            factors = (hi - lo) * vals + lo
            return gate[:, None, None, None], factors[:, None, None, None]

        k_b, k_c, k_s = jax.random.split(key, 3)

        if self.do_random_brightness:
            gate, f = gated(k_b, *self.random_brightness)
            adjusted = _blend(images, jnp.zeros_like(images), f, truncate, bound)
            images = jnp.where(gate, adjusted, images)

        if self.do_random_contrast:
            gate, f = gated(k_c, *self.random_contrast)
            mean = jnp.mean(_rgb_to_grayscale(images, truncate),
                            axis=(1, 2, 3), keepdims=True)
            adjusted = _blend(images, mean, f, truncate, bound)
            images = jnp.where(gate, adjusted, images)

        if self.do_random_saturation:
            gate, f = gated(k_s, *self.random_saturation)
            gray = _rgb_to_grayscale(images, truncate)
            adjusted = _blend(images, gray, f, truncate, bound)
            images = jnp.where(gate, adjusted, images)

        return images

    def _normalize(self, images):
        r = self.normalized_image_range
        if r == [0, 1]:
            return images / 255.0
        elif r == [-1, 1]:
            return 2.0 * (images / 255.0) - 1.0
        elif r == [0, 255]:
            return images
        raise ValueError('Unsupported normalization range: {}'.format(r))

    @staticmethod
    def _flip_w(arr, gate):
        """Flip the width axis per sample. arr: (B, ..., W, C) NHWC or
        (B, K, h, w, C)."""
        g = gate.reshape((-1,) + (1,) * (arr.ndim - 1))
        return jnp.where(g, jnp.flip(arr, axis=-2), arr)

    @staticmethod
    def _flip_h(arr, gate):
        g = gate.reshape((-1,) + (1,) * (arr.ndim - 1))
        return jnp.where(g, jnp.flip(arr, axis=-3), arr)

    # -- public API -----------------------------------------------------------

    def transform(self,
                  key,
                  images_arr: List,
                  labels_arr: Sequence = (),
                  points_arr: Sequence = (),
                  range_maps_arr: Sequence = (),
                  bounding_boxes_arr: Sequence = (),
                  random_transform_probability: float = 0.0):
        """Apply the augmentation pipeline.

        images_arr : list of (B, H, W, 3) in [0, 255] (or [0, 1]) floats
        labels_arr : list of (B, ..., h, w, C) label maps (flip only)
        points_arr : list of (B, K, 3) radar points (noise only)
        range_maps_arr : list of (B, H, W, C) range maps (flip only)
        bounding_boxes_arr : list of (B, K, 4) boxes (flip fix-up)

        Returns the same tuple structure with transformed arrays.
        """
        images_arr = list(images_arr)
        labels_arr = list(labels_arr)
        points_arr = list(points_arr)
        range_maps_arr = list(range_maps_arr)
        bounding_boxes_arr = list(bounding_boxes_arr)

        n_batch = images_arr[0].shape[0]
        n_height = images_arr[0].shape[1]
        n_width = images_arr[0].shape[2]

        k_gate, k_photo, k_noise, k_h, k_v = jax.random.split(key, 5)
        do_transform = (
            jax.random.uniform(k_gate, (n_batch,)) <=
            random_transform_probability)

        # int-cast emulation: active when intensities exceed 1
        truncate = jnp.max(images_arr[0]) > 1.0
        images_arr = [jnp.where(truncate, jnp.floor(im), im)
                      for im in images_arr]

        photo_keys = jax.random.split(k_photo, max(len(images_arr), 1))
        images_arr = [
            self._photometric(photo_keys[i], im, do_transform, truncate)
            for i, im in enumerate(images_arr)
        ]
        images_arr = [self._normalize(im) for im in images_arr]

        if self.do_random_noise and points_arr:
            k_gate2, *k_vals = jax.random.split(k_noise, 1 + len(points_arr))
            gate = jnp.logical_and(
                do_transform,
                jax.random.uniform(k_gate2, (n_batch,)) <= 0.5)
            new_points = []
            for points, kv in zip(points_arr, k_vals):
                g = gate.reshape((-1,) + (1,) * (points.ndim - 1))
                if self.random_noise_type == 'gaussian':
                    noise = self.random_noise_spread * jax.random.normal(
                        kv, points.shape)
                elif self.random_noise_type == 'uniform':
                    noise = self.random_noise_spread * (
                        jax.random.uniform(kv, points.shape) - 0.5)
                else:
                    raise ValueError('Unsupported noise type: {}'.format(
                        self.random_noise_type))
                new_points.append(jnp.where(g, points + noise, points))
            points_arr = new_points

        if self.do_random_horizontal_flip:
            gate = jnp.logical_and(
                do_transform, jax.random.uniform(k_h, (n_batch,)) <= 0.5)
            images_arr = [self._flip_w(a, gate) for a in images_arr]
            labels_arr = [self._flip_w(a, gate) for a in labels_arr]
            range_maps_arr = [self._flip_w(a, gate) for a in range_maps_arr]
            new_boxes = []
            for boxes in bounding_boxes_arr:
                g = gate.reshape((-1,) + (1,) * (boxes.ndim - 2))
                flipped = jnp.stack([
                    n_width - boxes[..., 2], boxes[..., 1],
                    n_width - boxes[..., 0], boxes[..., 3]], axis=-1)
                new_boxes.append(jnp.where(g[..., None], flipped, boxes))
            bounding_boxes_arr = new_boxes

        if self.do_random_vertical_flip:
            gate = jnp.logical_and(
                do_transform, jax.random.uniform(k_v, (n_batch,)) <= 0.5)
            images_arr = [self._flip_h(a, gate) for a in images_arr]
            labels_arr = [self._flip_h(a, gate) for a in labels_arr]
            range_maps_arr = [self._flip_h(a, gate) for a in range_maps_arr]
            new_boxes = []
            for boxes in bounding_boxes_arr:
                g = gate.reshape((-1,) + (1,) * (boxes.ndim - 2))
                flipped = jnp.stack([
                    boxes[..., 0], n_height - boxes[..., 3],
                    boxes[..., 2], n_height - boxes[..., 1]], axis=-1)
                new_boxes.append(jnp.where(g[..., None], flipped, boxes))
            bounding_boxes_arr = new_boxes

        outputs = []
        if images_arr:
            outputs.append(images_arr)
        if labels_arr:
            outputs.append(labels_arr)
        if points_arr:
            outputs.append(points_arr)
        if range_maps_arr:
            outputs.append(range_maps_arr)
        if bounding_boxes_arr:
            outputs.append(bounding_boxes_arr)
        if len(outputs) == 1:
            return outputs[0]
        return tuple(outputs)

"""Inference-time graph optimizations on parameter pytrees."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np


def fold_batch_norm(params: Dict[str, Any], state: Dict[str, Any],
                    eps: float = 1e-5) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Fold eval-mode batch norm into the preceding conv/deconv weights.

    A Conv2d/TransposeConv2d block node looks like
      params: {'conv'|'deconv': {'weight'}, 'batch_norm': {'weight','bias'}}
      state:  {'batch_norm': {'running_mean','running_var', ...}}
    and at eval computes act((x * w) * scale + shift). Folding rewrites
      w' = w * scale (output-channel axis), b' = beta - mean * scale
    and removes the batch_norm node, so the conv's epilogue is one bias-add.
    The folded params are for INFERENCE only (training needs live BN).
    """

    def fold(p, s):
        if not isinstance(p, dict):
            return p, s
        keys = set(p.keys())
        conv_key = 'conv' if 'conv' in keys else ('deconv' if 'deconv' in keys else None)
        if conv_key is not None and 'batch_norm' in keys and \
                isinstance(p[conv_key], dict) and 'weight' in p[conv_key] and \
                not isinstance(p[conv_key]['weight'], dict):
            bn_p = p['batch_norm']
            bn_s = s['batch_norm'] if isinstance(s, dict) and 'batch_norm' in s else {}
            gamma = jnp.asarray(bn_p['weight'])
            beta = jnp.asarray(bn_p['bias'])
            mean = jnp.asarray(bn_s['running_mean'])
            var = jnp.asarray(bn_s['running_var'])
            scale = gamma / jnp.sqrt(var + eps)
            w = jnp.asarray(p[conv_key]['weight'])
            w_folded = w * scale  # output channels are the last axis (HWIO)
            b_folded = beta - mean * scale
            new_p = dict(p)
            new_p[conv_key] = {'weight': w_folded, 'bias': b_folded}
            del new_p['batch_norm']
            new_s = {k: v for k, v in (s or {}).items() if k != 'batch_norm'}
            return new_p, new_s
        new_p, new_s = {}, {}
        for k, v in p.items():
            sub_s = s.get(k, {}) if isinstance(s, dict) else {}
            new_p[k], new_s[k] = fold(v, sub_s)
        return new_p, new_s

    return fold(params, state)

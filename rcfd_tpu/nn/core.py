"""Minimal functional module system: params-as-pytrees with torch-compatible
naming.

Design goals:
- params/state are plain nested dicts of jnp arrays (pytrees), so they
  compose directly with jax.jit / jax.grad / shard_map and optax.
- The tree structure mirrors the PyTorch reference's ``state_dict`` keys
  (e.g. ``conv1.conv.weight``) so that ``.pth`` checkpoints convert 1:1
  (reference: src/radarnet_model.py:225-233, src/fusionnet_model.py:360-368).
- apply() is pure: ``y, new_state = module(params, state, x, training=...)``.
  ``state`` carries batch-norm running statistics only.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]
State = Dict[str, Any]


class Module:
    """Base class. Subclasses define _children (name -> Module) and/or leaf
    parameters via init_params/init_state."""

    def init(self, key) -> Tuple[Params, State]:
        raise NotImplementedError

    def __call__(self, params: Params, state: State, *args, training: bool = False):
        raise NotImplementedError

    # -- helpers -------------------------------------------------------------

    @staticmethod
    def _split(key, n):
        return list(jax.random.split(key, n)) if n > 0 else []


class Sequential(Module):
    """Named sequence; children keyed '0', '1', ... (torch nn.Sequential)."""

    def __init__(self, modules: List[Module]):
        self.modules = modules

    def init(self, key):
        params, state = {}, {}
        keys = self._split(key, len(self.modules))
        for i, (m, k) in enumerate(zip(self.modules, keys)):
            p, s = m.init(k)
            params[str(i)] = p
            state[str(i)] = s
        return params, state

    def __call__(self, params, state, x, training=False):
        new_state = dict(state)
        for i, m in enumerate(self.modules):
            x, s = m(params[str(i)], state[str(i)], x, training=training)
            new_state[str(i)] = s
        return x, new_state

    def __len__(self):
        return len(self.modules)

    def __getitem__(self, i):
        return self.modules[i]


def init_children(key, children: Dict[str, Module]) -> Tuple[Params, State]:
    params, state = {}, {}
    keys = jax.random.split(key, max(len(children), 1))
    for (name, child), k in zip(children.items(), keys):
        p, s = child.init(k)
        params[name] = p
        state[name] = s
    return params, state


def tree_size(params) -> int:
    """Total number of scalar parameters in a pytree."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def cast_tree(tree, dtype):
    """Cast all floating-point leaves of a pytree to dtype."""
    def _cast(x):
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_cast, tree)


def flatten_tree(tree, prefix='') -> Dict[str, Any]:
    """Flatten a nested dict into torch-style dotted keys."""
    out = {}
    for k, v in tree.items():
        key = f'{prefix}{k}'
        if isinstance(v, dict):
            out.update(flatten_tree(v, key + '.'))
        else:
            out[key] = v
    return out


def unflatten_tree(flat: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of flatten_tree."""
    out: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split('.')
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out

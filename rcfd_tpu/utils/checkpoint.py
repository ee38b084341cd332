"""Checkpoint I/O: native .npz pytrees plus torch ``.pth`` interop.

The reference stores flat torch dicts (src/radarnet_model.py:225-233,
src/fusionnet_model.py:360-368):
    RadarNet: train_step, radarnet_optimizer_state_dict,
              radarnet_encoder_state_dict, radarnet_decoder_state_dict
    FusionNet: train_step, optimizer_state_dict, encoder_state_dict,
               decoder_state_dict

We preserve those formats byte-for-byte in spirit: a ``.pth`` written here
loads in the reference code and vice versa. Layout conversions:
    conv weight   OIHW   <-> HWIO   (transpose (2,3,1,0) / (3,2,0,1))
    deconv weight IOHW   <-> HWIO(I)  (transpose (2,3,0,1))
    linear weight (O,I)  <-> (I,O)
DataParallel 'module.' prefixes are stripped on load (the reference wraps
encoder/decoder in DataParallel before saving — src/radarnet_model.py:260-266).

torch is used for ``.pth`` serialization only (host I/O), never for compute.
"""

from __future__ import annotations

import io
import json
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..nn.core import flatten_tree, unflatten_tree


def _is_deconv_key(key: str) -> bool:
    return key.endswith('deconv.weight') and not key.endswith('conv.conv.weight')


def torch_state_dict_to_tree(state_dict) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Convert a torch state_dict (tensors or numpy) into (params, state)
    pytrees with our layouts. Returns nested dicts of numpy arrays."""
    params_flat: Dict[str, np.ndarray] = {}
    state_flat: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        if key.startswith('module.'):
            key = key[len('module.'):]
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, 'detach') else value)
        leaf = key.rsplit('.', 1)[-1]
        if leaf in ('running_mean', 'running_var', 'num_batches_tracked'):
            if leaf == 'num_batches_tracked':
                arr = arr.astype(np.int32)
            state_flat[key] = arr
            continue
        if leaf == 'weight':
            if arr.ndim == 4:
                if _is_deconv_key(key):
                    arr = np.transpose(arr, (2, 3, 0, 1))  # IOHW -> HWIO(I-contract)
                else:
                    arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
            elif arr.ndim == 2:
                arr = arr.T  # (O, I) -> (I, O)
        params_flat[key] = arr
    return unflatten_tree(params_flat), unflatten_tree(state_flat)


def tree_to_torch_state_dict(params, state=None):
    """Convert (params, state) pytrees back to a torch-layout state_dict
    (numpy values; caller wraps in torch tensors for .pth export)."""
    out: Dict[str, np.ndarray] = {}
    for key, arr in flatten_tree(params).items():
        arr = np.asarray(arr)
        leaf = key.rsplit('.', 1)[-1]
        if leaf == 'weight':
            if arr.ndim == 4:
                if _is_deconv_key(key):
                    arr = np.transpose(arr, (2, 3, 0, 1))
                else:
                    arr = np.transpose(arr, (3, 2, 0, 1))
            elif arr.ndim == 2:
                arr = arr.T
        out[key] = arr
    if state is not None:
        for key, arr in flatten_tree(state).items():
            arr = np.asarray(arr)
            if key.endswith('num_batches_tracked'):
                arr = arr.astype(np.int64)
            out[key] = arr
    return out


def _merge_state_dict_order(params, state):
    """Interleave params and BN buffers in torch registration order.

    torch state_dict order within a BN module is weight, bias, running_mean,
    running_var, num_batches_tracked. Our trees keep params and buffers
    separate; merge by walking the params tree and appending the state
    buffers of the same module path right after its params."""
    flat_p = tree_to_torch_state_dict(params)
    flat_s = tree_to_torch_state_dict(state) if state else {}
    ordered: Dict[str, np.ndarray] = {}
    for key in flat_p:
        ordered[key] = flat_p[key]
        if key.endswith('batch_norm.bias'):
            prefix = key[:-len('bias')]
            for suffix in ('running_mean', 'running_var', 'num_batches_tracked'):
                skey = prefix + suffix
                if skey in flat_s:
                    ordered[skey] = flat_s.pop(skey)
    ordered.update(flat_s)
    return ordered


def conform_to_template(template, loaded, fill_missing: bool = False,
                        path: str = ''):
    """Restructure a loaded (possibly sparse) tree to match a template tree
    (e.g. from jax.eval_shape): same dict keys, leaves taken from `loaded`.

    Modules without buffers produce no entries in a converted torch
    state_dict; `fill_missing` inserts zero leaves for those (state trees),
    while params trees require every leaf to be present.
    """
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            sub = loaded.get(k, {} if isinstance(v, dict) else None) \
                if isinstance(loaded, dict) else None
            out[k] = conform_to_template(v, sub, fill_missing, f'{path}{k}.')
        return out
    # leaf
    if loaded is None:
        if fill_missing:
            return np.zeros(template.shape, dtype=np.dtype(template.dtype))
        raise KeyError('missing checkpoint leaf: {}'.format(path[:-1]))
    arr = np.asarray(loaded)
    if tuple(arr.shape) != tuple(template.shape):
        if arr.size == int(np.prod(template.shape)):
            # 0-d vs (1,) round-trip artifacts of scalar buffers
            return arr.reshape(template.shape)
        raise ValueError('shape mismatch at {}: checkpoint {} vs model {}'.format(
            path[:-1], arr.shape, tuple(template.shape)))
    return arr


# ---------------------------------------------------------------------------
# torch .pth interop
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pth checkpoint into a dict of numpy structures.

    Uses torch when available (host I/O only); otherwise falls back to the
    torch-free zipfile/pickle reader (utils/torch_pickle.py), so released
    reference checkpoints load in torch-free deployments.

    Always loads with weights_only=True — reference checkpoints contain
    only tensors/OrderedDicts, and a .pth is untrusted pickle input. If a
    checkpoint needs globals outside torch's weights-only allowlist it is
    retried with the hardened torch-free reader (closed allowlist) rather
    than with arbitrary code execution enabled."""
    try:
        import torch  # host I/O only
    except ImportError:
        from .torch_pickle import load_torch_zip
        return load_torch_zip(path)
    try:
        return torch.load(path, map_location='cpu', weights_only=True)
    except pickle.UnpicklingError:
        from .torch_pickle import load_torch_zip
        return load_torch_zip(path)


def save_torch_checkpoint(path: str, checkpoint: Dict[str, Any]):
    """Save a dict (with numpy-valued state_dicts) as a torch .pth."""
    import torch  # host I/O only

    def to_torch(obj):
        if isinstance(obj, dict):
            return {k: to_torch(v) for k, v in obj.items()}
        if isinstance(obj, np.ndarray):
            return torch.from_numpy(np.ascontiguousarray(obj))
        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, (np.floating,)):
            return float(obj)
        return obj

    torch.save(to_torch(checkpoint), path)


# ---------------------------------------------------------------------------
# Optimizer-state interop (our Adam <-> torch.optim.Adam state_dict)
# ---------------------------------------------------------------------------

def optax_adam_to_torch_state(params, opt_state, lr: float,
                              weight_decay: float) -> dict:
    """Convert our Adam state ({'count','mu','nu'} mirroring params) into a
    torch.optim.Adam state_dict. Parameter indexing follows torch's
    registration order, which equals our params-tree insertion order; moment
    tensors get the same layout transposes as weights."""
    flat_p = tree_to_torch_state_dict(params)
    flat_mu = tree_to_torch_state_dict(opt_state['mu'])
    flat_nu = tree_to_torch_state_dict(opt_state['nu'])
    step = int(np.asarray(opt_state['count']))
    state = {}
    for i, key in enumerate(flat_p):
        state[i] = {
            'step': step,
            'exp_avg': flat_mu[key],
            'exp_avg_sq': flat_nu[key],
        }
    param_groups = [{
        'lr': float(lr),
        'betas': (0.9, 0.999),
        'eps': 1e-8,
        'weight_decay': float(weight_decay),
        'amsgrad': False,
        'maximize': False,
        'foreach': None,
        'capturable': False,
        'differentiable': False,
        'fused': None,
        'params': list(range(len(flat_p))),
    }]
    return {'state': state, 'param_groups': param_groups}


def torch_adam_to_optax(params, torch_sd: dict):
    """Convert a torch.optim.Adam state_dict into our Adam state. `params`
    provides the tree structure and ordering."""
    flat_keys = list(flatten_tree(params).keys())
    state = torch_sd.get('state', {})
    if not state:
        raise ValueError('empty torch optimizer state')
    # torch state keys may be int or str
    def get_entry(i):
        if i in state:
            return state[i]
        return state[str(i)]

    mu_flat, nu_flat = {}, {}
    step = 0
    for i, key in enumerate(flat_keys):
        entry = get_entry(i)
        step = int(np.asarray(
            entry['step'].item() if hasattr(entry['step'], 'item')
            else entry['step']))
        mu_flat[key] = _to_numpy(entry['exp_avg'])
        nu_flat[key] = _to_numpy(entry['exp_avg_sq'])
    mu_p, _ = torch_state_dict_to_tree(mu_flat)
    nu_p, _ = torch_state_dict_to_tree(nu_flat)
    tpl = jax_eval_template(params)
    mu = conform_to_template(tpl, mu_p)
    nu = conform_to_template(tpl, nu_p)
    return {'count': np.int32(step), 'mu': mu, 'nu': nu}


def jax_eval_template(params):
    """ShapeDtypeStruct template of a concrete params tree."""
    import jax
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), params)


def _to_numpy(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, 'detach') else v)


# ---------------------------------------------------------------------------
# Orbax backend (directory checkpoints; async/sharded-capable)
# ---------------------------------------------------------------------------

def save_orbax_checkpoint(path: str, trees: Dict[str, Any],
                          meta: Optional[dict] = None):
    """Save named pytrees with orbax (production JAX checkpointing: works
    with sharded arrays and large models; the reference-format .pth and the
    .npz formats remain for interop)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(path, {'trees': trees, 'meta': meta or {}})


def load_orbax_checkpoint(path: str) -> Tuple[Dict[str, Any], dict]:
    import orbax.checkpoint as ocp
    checkpointer = ocp.PyTreeCheckpointer()
    restored = checkpointer.restore(os.path.abspath(path))
    return restored['trees'], restored.get('meta', {})


# ---------------------------------------------------------------------------
# Native format (.npz) — no torch required
# ---------------------------------------------------------------------------

def save_native_checkpoint(path: str, trees: Dict[str, Any], meta: Optional[dict] = None):
    """Save named pytrees as one .npz with a JSON manifest."""
    arrays: Dict[str, np.ndarray] = {}
    manifest = {'trees': list(trees.keys()), 'meta': meta or {}}
    for name, tree in trees.items():
        for key, arr in flatten_tree(tree).items():
            arrays[f'{name}/{key}'] = np.asarray(arr)
    arrays['__manifest__'] = np.frombuffer(
        json.dumps(manifest).encode('utf-8'), dtype=np.uint8)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_native_checkpoint(path: str) -> Tuple[Dict[str, Any], dict]:
    data = np.load(path, allow_pickle=False)
    manifest = json.loads(bytes(data['__manifest__']).decode('utf-8'))
    trees: Dict[str, Dict[str, np.ndarray]] = {name: {} for name in manifest['trees']}
    for key in data.files:
        if key == '__manifest__':
            continue
        name, flat_key = key.split('/', 1)
        trees[name][flat_key] = data[key]
    return ({name: unflatten_tree(flat) for name, flat in trees.items()},
            manifest['meta'])

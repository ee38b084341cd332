"""GSPMD (jit + sharding constraints) training: multi-axis meshes beyond
plain data parallelism.

The shard_map path (parallel/mesh.py) replicates the reference's
DataParallel semantics with explicit per-shard BN statistics. This module
offers the alternative: run the SAME pure train step under jit with input
shardings over a 2-D (data, spatial) mesh and let XLA partition everything
— convolutions get halo exchanges, batch-norm reductions become global
collectives (true sync-BN), and gradients all-reduce automatically. For
frames as large as nuScenes' 900x1600 this is how the model scales past
the point where one sample's activations fill a chip.

Semantics are exactly the single-device program (GSPMD preserves program
semantics), so no pmean plumbing is needed in the step function.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh_2d(n_data: int, n_spatial: int,
                axis_names: Tuple[str, str] = ('data', 'spatial')) -> Mesh:
    devices = np.asarray(jax.devices()[:n_data * n_spatial])
    assert devices.size == n_data * n_spatial, \
        f'need {n_data * n_spatial} devices, have {len(jax.devices())}'
    return Mesh(devices.reshape(n_data, n_spatial), axis_names)


def gspmd_train_step(step_fn, mesh: Mesh,
                     batch_spec: Optional[Sequence[P]] = None,
                     donate_argnums=(0, 1, 2)):
    """Jit a pure train step (params, state, opt_state, batch, key, lr,
    aug_prob) with params/opt replicated and the batch sharded
    (default: leading batch axis over 'data', height over 'spatial').

    step_fn must be built WITHOUT a manual axis pmean
    (axis_name=None in the drivers' _make_train_step): under GSPMD the
    global-program semantics already include the reductions.
    """
    replicated = NamedSharding(mesh, P())

    def batch_shardings(batch_len: int):
        if batch_spec is not None:
            return tuple(NamedSharding(mesh, s) for s in batch_spec)
        return tuple(
            NamedSharding(mesh, P('data', 'spatial'))
            for _ in range(batch_len))

    # in_shardings must be structured like the args; batch is a tuple of
    # arrays sharded (data, spatial) on (N, H)
    def make(batch_len: int):
        in_shardings = (
            replicated, replicated, replicated,
            batch_shardings(batch_len),
            replicated, replicated, replicated)
        out_shardings = (replicated, replicated, replicated, replicated)
        return jax.jit(step_fn, in_shardings=in_shardings,
                       out_shardings=out_shardings,
                       donate_argnums=donate_argnums)

    return make


def shard_batch_2d(mesh: Mesh, batch):
    """Place a batch tuple with (N over 'data', H over 'spatial')."""
    sharding = NamedSharding(mesh, P('data', 'spatial'))
    return tuple(jax.device_put(b, sharding) for b in batch)

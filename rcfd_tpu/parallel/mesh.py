"""Device mesh + data-parallel step builders.

TPU-native replacement for the reference's torch.nn.DataParallel
(src/radarnet_model.py:260-266, src/fusionnet_model.py:395-401): a 1-D
'data' mesh with the batch sharded over ICI, gradients reduced with psum,
parameters/optimizer state replicated. The mesh keeps a named axis so the
same step functions extend to multi-axis layouts (tensor/pipeline axes are
unused by these ~10-40M-param CNNs but the plumbing is mesh-general).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, axis_name: str = 'data') -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree, axis_name: str = 'data'):
    """Shard a batch pytree along its leading axis over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def data_parallel_step(mesh: Mesh, step_fn: Callable, axis_name: str = 'data',
                       donate_argnums=(0, 1, 2)):
    """Wrap a per-shard train step (params, state, opt_state, batch, key,
    lr, aug_prob) into a jitted SPMD program: params/opt state replicated,
    batch sharded over `axis_name`. step_fn must already pmean its
    gradients over the axis (the drivers' _make_train_step does)."""
    from jax.experimental.shard_map import shard_map

    wrapped = shard_map(
        step_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis_name), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_rep=False)
    return jax.jit(wrapped, donate_argnums=donate_argnums)

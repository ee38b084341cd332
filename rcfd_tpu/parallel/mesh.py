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


def maybe_initialize_distributed():
    """Initialize jax.distributed for multi-host (DCN) data parallelism
    when the environment requests it (SURVEY §5.8: cross-slice is an
    extension of the same 'data' axis).

    Env contract (set per process by the launcher):
      RCFD_COORDINATOR   host:port of process 0
      RCFD_NUM_PROCESSES total process count
      RCFD_PROCESS_ID    this process's id
    On TPU pods with standard launchers, plain jax.distributed.initialize()
    auto-detects instead; this wrapper only adds the explicit-env path.
    Returns True if distributed mode is (already or newly) active."""
    import os
    coord = os.environ.get('RCFD_COORDINATOR')
    if coord is None:
        return jax.process_count() > 1
    # must not touch the backend (jax.process_count etc.) before
    # jax.distributed.initialize; probe the client state instead
    from jax._src import distributed as _dist
    if _dist.global_state.client is not None:
        return True
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ['RCFD_NUM_PROCESSES']),
        process_id=int(os.environ['RCFD_PROCESS_ID']))
    return True


def get_mesh(n_devices: Optional[int] = None, axis_name: str = 'data') -> Mesh:
    """1-D data mesh over the GLOBAL device list (all hosts after
    jax.distributed initialization; local devices otherwise)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch_multihost(mesh: Mesh, tree, axis_name: str = 'data'):
    """Assemble a GLOBAL batch from per-process local shards. Each process
    passes only its local slice (global batch order sliced by
    process_index — see DataLoader(process_index=, process_count=));
    the returned jax.Arrays are globally sharded over `axis_name`."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


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

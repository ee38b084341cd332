"""Worker for the 2-process multi-host DP test (see test_multihost.py).

Each process owns ONE cpu device; the 'data' mesh spans both processes.
Runs one canonical FusionNet train step on a deterministic global batch
(each process feeding only its local half through the same loader slicing
used by the drivers) and writes the updated params (process 0 only).

Usage: python multihost_worker.py <coordinator> <n_procs> <pid> <out.npz>
       python multihost_worker.py single <out.npz>   (1-process reference,
       2 local devices)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_batch():
    import numpy as np
    rng = np.random.default_rng(42)
    b, h, w = 4, 32, 32
    return (
        rng.random((b, h, w, 3), dtype=np.float32) * 255,
        rng.random((b, h, w, 1), dtype=np.float32) * 60,
        rng.random((b, h, w, 1), dtype=np.float32),
        rng.random((b, h, w, 1), dtype=np.float32) * 60,
        rng.random((b, h, w, 1), dtype=np.float32) * 60,
    )


def main():
    if sys.argv[1] == 'single':
        out_path = sys.argv[2]
        os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                                   ' --xla_force_host_platform_device_count=2')
        multi = False
    else:
        coordinator, n_procs, pid, out_path = (
            sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '') +
                                   ' --xla_force_host_platform_device_count=1')
        os.environ['RCFD_COORDINATOR'] = coordinator
        os.environ['RCFD_NUM_PROCESSES'] = str(n_procs)
        os.environ['RCFD_PROCESS_ID'] = str(pid)
        multi = True

    os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rcfd_tpu import fusionnet_main
    from rcfd_tpu.data.transforms import Transforms
    from rcfd_tpu.parallel.mesh import (data_parallel_step, get_mesh,
                                        maybe_initialize_distributed,
                                        replicate, shard_batch_multihost)
    from rcfd_tpu.parallel.optim import init_adam

    maybe_initialize_distributed()
    assert jax.device_count() == 2, jax.devices()

    model = fusionnet_main._build_model(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[4, 6, 8, 8, 8],
        n_filters_encoder_depth=[2, 3, 4, 4, 4],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_resolutions_decoder=1, n_filters_decoder=[8, 6, 4, 4, 4],
        weight_initializer='kaiming_uniform', activation_func='leaky_relu',
        min_predict_depth=1.0, max_predict_depth=100.0)
    params, state = model.init(jax.random.PRNGKey(0))
    opt_state = init_adam(params)

    step_fn = fusionnet_main._make_train_step(
        model, Transforms(normalized_image_range=[0, 1]),
        loss_func='l1', w_smoothness=0.0, w_lidar_loss=2.0,
        w_weight_decay=0.0, loss_smoothness_kernel_size=-1,
        outlier_kernel_size=7, outlier_threshold=1.5,
        dilation_kernel_size=-1, axis_name='data')

    mesh = get_mesh(2)
    step_jit = data_parallel_step(mesh, step_fn, donate_argnums=())
    params = replicate(mesh, params)
    state = replicate(mesh, state)
    opt_state = replicate(mesh, opt_state)

    batch = build_batch()
    if multi:
        # per-process local slice, same contract as DataLoader's
        # (process_index, process_count) slicing
        pid = jax.process_index()
        local = tuple(t[pid * 2:(pid + 1) * 2] for t in batch)
        batch_g = shard_batch_multihost(mesh, local)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_g = jax.device_put(batch, NamedSharding(mesh, P('data')))

    key = jax.random.PRNGKey(7)
    new_params, _, _, loss_info = step_jit(
        params, state, opt_state, batch_g, key, jnp.float32(1e-3),
        jnp.float32(0.0))

    if (not multi) or jax.process_index() == 0:
        flat = {}

        def walk(prefix, tree):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    walk(prefix + '/' + k, v)
            else:
                flat[prefix] = np.asarray(tree)

        walk('p', jax.device_get(new_params))
        flat['loss'] = np.asarray(loss_info['loss'])
        np.savez(out_path, **flat)
        print('saved', out_path, 'loss', float(loss_info['loss']))


if __name__ == '__main__':
    main()

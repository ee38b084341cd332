"""Multi-host data parallelism: 2 separate processes (1 cpu device each,
jax.distributed over a localhost coordinator) must produce EXACTLY the
same post-step parameters as a single process with 2 local devices —
gradient psum over DCN == over a local mesh (SURVEY §5.8, BASELINE
v5e-16 target).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, 'multihost_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    for k in ['RCFD_COORDINATOR', 'RCFD_NUM_PROCESSES', 'RCFD_PROCESS_ID',
              'PALLAS_AXON_POOL_IPS', 'XLA_FLAGS', 'JAX_PLATFORMS']:
        env.pop(k, None)
    return env


@pytest.mark.slow
def test_two_process_dp_matches_single_process(tmp_path):
    coord = f'localhost:{_free_port()}'
    out0 = str(tmp_path / 'multi.npz')
    out_ref = str(tmp_path / 'single.npz')
    env = _clean_env()

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, '2', str(pid),
             out0 if pid == 0 else str(tmp_path / 'unused.npz')],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-3000:]

    ref = subprocess.run([sys.executable, WORKER, 'single', out_ref],
                         env=env, capture_output=True, text=True,
                         timeout=600)
    assert ref.returncode == 0, ref.stderr[-3000:]

    multi = np.load(out0)
    single = np.load(out_ref)
    assert set(multi.files) == set(single.files)
    assert np.isfinite(multi['loss'])
    np.testing.assert_allclose(multi['loss'], single['loss'],
                               rtol=1e-6, atol=1e-6)
    # The 1-proc and 2-proc programs are different XLA compilations, so
    # per-shard convs reassociate at the ~1 ulp level, and Adam's first
    # step has slope 1/eps for near-zero gradient elements — a handful of
    # elements can move by up to ~lr regardless of DP correctness. A
    # broken mean/psum would shift MOST elements by O(lr)=1e-3; assert
    # instead that >=99% agree tightly and no element exceeds 1e-4.
    for k in multi.files:
        a, b = multi[k], single[k]
        close = np.isclose(a, b, rtol=1e-4, atol=1e-5)
        assert close.mean() >= 0.99, \
            f'{k}: {100 * (1 - close.mean()):.2f}% mismatched'
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-4, err_msg=k)

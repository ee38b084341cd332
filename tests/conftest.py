"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The axon sitecustomize pins jax_platforms to the remote TPU; tests must run
hermetically on host CPU (multi-device via
--xla_force_host_platform_device_count, the idiomatic JAX way to test
sharding without a real slice).
"""

import os

os.environ.setdefault('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in os.environ['XLA_FLAGS']:
    os.environ['XLA_FLAGS'] += ' --xla_force_host_platform_device_count=8'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

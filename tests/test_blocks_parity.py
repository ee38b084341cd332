"""Parity for the remaining primitive blocks (VGGNetBlock,
ResNetBottleneckBlock, TransposeConv2d) against torch equivalents built
inline from the reference's semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rcfd_tpu.nn.layers import (ResNetBottleneckBlock, TransposeConv2d,
                                VGGNetBlock)
from rcfd_tpu.utils.checkpoint import conform_to_template, \
    torch_state_dict_to_tree

from reference_import import import_reference

pytestmark = pytest.mark.smoke


def _load(module, our_module, params_template=None):
    """Transfer torch module weights into our layer's param tree."""
    import jax
    p, s = torch_state_dict_to_tree(module.state_dict())
    tpl_p, tpl_s = jax.eval_shape(our_module.init, jax.random.PRNGKey(0))
    p = conform_to_template(tpl_p, p)
    s = conform_to_template(tpl_s, s, fill_missing=True)
    return p, s


def test_vggnet_block_parity(rng):
    import torch
    net_utils = import_reference('net_utils')
    torch.manual_seed(0)
    ref = net_utils.VGGNetBlock(4, 8, n_conv=3, stride=2,
                                use_batch_norm=True)
    ours = VGGNetBlock(4, 8, n_conv=3, stride=2,
                       activation_func=('leaky_relu_default', 0.10),
                       use_batch_norm=True)
    params, state = _load(ref, ours)

    x = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out, _ = ours(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_bottleneck_block_parity(rng):
    import torch
    net_utils = import_reference('net_utils')
    torch.manual_seed(1)
    ref = net_utils.ResNetBottleneckBlock(8, 8, stride=2, use_batch_norm=True)
    ours = ResNetBottleneckBlock(8, 8, stride=2,
                                 activation_func=('leaky_relu_default', 0.10),
                                 use_batch_norm=True)
    params, state = _load(ref, ours)

    x = rng.standard_normal((2, 16, 16, 8)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out, _ = ours(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref_out.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_transpose_conv_parity(rng):
    import torch
    net_utils = import_reference('net_utils')
    torch.manual_seed(2)
    ref = net_utils.TransposeConv2d(6, 4, kernel_size=3, use_batch_norm=False)
    ours = TransposeConv2d(6, 4, kernel_size=3,
                           activation_func=('leaky_relu_default', 0.10),
                           use_batch_norm=False)
    params, state = _load(ref, ours)

    x = rng.standard_normal((2, 9, 11, 6)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out, _ = ours(params, state, jnp.asarray(x))
    assert out.shape == (2, 18, 22, 4)
    np.testing.assert_allclose(np.asarray(out), ref_out.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)

"""Torch-free .pth reader vs torch.load on real torch-written archives."""

import numpy as np
import pytest

from rcfd_tpu.utils.torch_pickle import load_torch_zip


def test_reads_torch_written_checkpoint(tmp_path, rng):
    import torch
    path = str(tmp_path / 'ckpt.pth')
    obj = {
        'train_step': 123,
        'encoder_state_dict': {
            'conv.weight': torch.from_numpy(
                rng.standard_normal((4, 3, 7, 7)).astype(np.float32)),
            'bn.running_mean': torch.from_numpy(
                rng.standard_normal(4).astype(np.float32)),
            'bn.num_batches_tracked': torch.tensor(7, dtype=torch.int64),
        },
        'halves': torch.from_numpy(
            rng.standard_normal(5).astype(np.float16)),
        'bools': torch.tensor([True, False, True]),
        'nested': {'a': [1, 2.5, 'x'], 'b': (torch.zeros(2, 2),)},
    }
    torch.save(obj, path)

    loaded = load_torch_zip(path)
    assert loaded['train_step'] == 123
    np.testing.assert_array_equal(
        loaded['encoder_state_dict']['conv.weight'],
        obj['encoder_state_dict']['conv.weight'].numpy())
    np.testing.assert_array_equal(
        loaded['encoder_state_dict']['bn.running_mean'],
        obj['encoder_state_dict']['bn.running_mean'].numpy())
    assert int(loaded['encoder_state_dict']['bn.num_batches_tracked']) == 7
    np.testing.assert_array_equal(loaded['halves'], obj['halves'].numpy())
    np.testing.assert_array_equal(loaded['bools'], obj['bools'].numpy())
    assert loaded['nested']['a'] == [1, 2.5, 'x']
    np.testing.assert_array_equal(loaded['nested']['b'][0], np.zeros((2, 2)))


def test_reads_noncontiguous_tensor(tmp_path, rng):
    import torch
    path = str(tmp_path / 't.pth')
    base = torch.from_numpy(rng.standard_normal((6, 8)).astype(np.float32))
    view = base.t()  # non-contiguous strided view
    torch.save({'v': view}, path)
    loaded = load_torch_zip(path)
    np.testing.assert_array_equal(loaded['v'], view.numpy())


def test_reads_bfloat16(tmp_path, rng):
    import torch
    path = str(tmp_path / 'b.pth')
    t = torch.from_numpy(
        rng.standard_normal((3, 4)).astype(np.float32)).to(torch.bfloat16)
    torch.save({'t': t}, path)
    loaded = load_torch_zip(path)
    np.testing.assert_array_equal(loaded['t'], t.float().numpy())


@pytest.mark.smoke
def test_blocks_malicious_globals(tmp_path):
    """The torch-free reader must reject any global outside the closed
    allowlist — a crafted .pth must not reach os.system/builtins.eval."""
    import pickle
    import zipfile

    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ('true',))

    path = str(tmp_path / 'evil.pth')
    with zipfile.ZipFile(path, 'w') as zf:
        zf.writestr('archive/data.pkl', pickle.dumps({'payload': Evil()}))
        zf.writestr('archive/version', '3')

    with pytest.raises(pickle.UnpicklingError, match='blocked global'):
        load_torch_zip(path)

    # and the public loader must not fall back to unsafe torch.load either
    from rcfd_tpu.utils.checkpoint import load_torch_checkpoint
    with pytest.raises(pickle.UnpicklingError):
        load_torch_checkpoint(path)


def test_full_model_checkpoint_roundtrip_without_torch(tmp_path, rng):
    """A reference-format model checkpoint loads through the torch-free
    path with identical forward results."""
    import jax
    import jax.numpy as jnp
    from rcfd_tpu.models import FusionNetModel
    from rcfd_tpu.utils import checkpoint as ckpt

    cfg = dict(
        input_channels_image=3, input_channels_depth=2,
        encoder_type='fusionnet18_batch_norm',
        n_filters_encoder_image=[8, 12, 16, 16, 16],
        n_filters_encoder_depth=[4, 6, 8, 8, 8],
        fusion_type='weight_and_project',
        decoder_type='multiscale_batch_norm',
        n_resolution_decoder=1,
        n_filters_decoder=[16, 12, 8, 8, 8],
        min_predict_depth=1.0, max_predict_depth=100.0)
    model = FusionNetModel(**cfg)
    params, state = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / 'model-5.pth')
    model.save_checkpoint(path, params, state, step=5)

    # torch path
    p_t, s_t, step_t, _ = model.restore_checkpoint(path)
    # torch-free path
    raw = load_torch_zip(path)
    enc_p, enc_s = ckpt.torch_state_dict_to_tree(raw['encoder_state_dict'])
    dec_p, dec_s = ckpt.torch_state_dict_to_tree(raw['decoder_state_dict'])
    tpl_p, tpl_s = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    p_f = ckpt.conform_to_template(tpl_p, {'encoder': enc_p, 'decoder': dec_p})
    s_f = ckpt.conform_to_template(tpl_s, {'encoder': enc_s, 'decoder': dec_s},
                                   fill_missing=True)

    for a, b in zip(jax.tree_util.tree_leaves(p_t),
                    jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    image = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    depth = jnp.asarray(rng.random((1, 32, 32, 2)).astype(np.float32))
    out_t, _ = model.apply(p_t, s_t, image, depth)
    out_f, _ = model.apply(p_f, s_f, image, depth)
    np.testing.assert_array_equal(np.asarray(out_t), np.asarray(out_f))

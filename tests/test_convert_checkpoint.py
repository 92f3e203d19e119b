"""tools/convert_checkpoint.py: materialized native<->torch conversion.

Round-trip property: a native training checkpoint converted to the
reference's Lightning format and back restores every leaf bit-exactly,
and both intermediate files load through the same paths the CLIs use
(restore_variables auto-detection; ref eval_MoCoDAD.py:32-38 consumes the
torch side)."""

import os
import sys

import numpy as np
import pytest
import yaml

import jax

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.training.checkpoint import (is_torch_checkpoint,
                                             restore_variables,
                                             save_checkpoint)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools'))
import convert_checkpoint  # noqa: E402


_CFG = dict(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
            conditioning_architecture='AE', channels=[8, 4, 8],
            embedding_dim=8, h_dim=8, latent_dim=8, dropout=0.0,
            seg_len=6, num_coords=2, noise_steps=5,
            n_generated_samples=2, aggregation_strategy='best',
            batch_size=8, seed=0)


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_round_trip_preserves_every_leaf(tmp_path):
    cfg = Config(**_CFG)
    model = MoCoDADModel(cfg)
    variables = jax.device_get(model.init_variables(jax.random.key(7)))

    native = str(tmp_path / 'native.ckpt')
    save_checkpoint(native, variables)

    as_torch = str(tmp_path / 'ref_style.ckpt')
    n = convert_checkpoint.convert(cfg, 'to-torch', native, as_torch)
    assert n > 0 and is_torch_checkpoint(as_torch)
    # the torch file is a Lightning-shaped payload with reference key names
    import torch
    sd = torch.load(as_torch, map_location='cpu',
                    weights_only=False)['state_dict']
    assert any(k.startswith('model.st_gcnnsp1a.') for k in sd)
    assert any(k.startswith('condition_encoder.') for k in sd)

    back = str(tmp_path / 'back.ckpt')
    convert_checkpoint.convert(cfg, 'to-flax', as_torch, back)
    assert not is_torch_checkpoint(back)
    # restore against a DIFFERENT-seed template: restore_variables falls
    # back to template leaves for missing keys (strict=False), so equality
    # vs `variables` only proves the file when the template can't supply it
    other = jax.device_get(
        MoCoDADModel(cfg).init_variables(jax.random.key(11)))
    _assert_trees_equal(variables, restore_variables(back, other))
    # and both intermediates restore through the auto-detecting eval path
    _assert_trees_equal(variables, restore_variables(as_torch, other))


def test_to_flax_rejects_native_input(tmp_path):
    cfg = Config(**_CFG)
    model = MoCoDADModel(cfg)
    native = str(tmp_path / 'native.ckpt')
    save_checkpoint(native, jax.device_get(
        model.init_variables(jax.random.key(0))))
    with pytest.raises(SystemExit):
        convert_checkpoint.convert(cfg, 'to-flax', native,
                                   str(tmp_path / 'x.ckpt'))


def test_cli_entry(tmp_path):
    cfg_path = tmp_path / 'model.yaml'
    cfg_path.write_text(yaml.safe_dump(_CFG))

    cfg = Config(**_CFG)
    variables = jax.device_get(
        MoCoDADModel(cfg).init_variables(jax.random.key(7)))
    native = str(tmp_path / 'native.ckpt')
    save_checkpoint(native, variables)

    out = str(tmp_path / 'exported.ckpt')
    convert_checkpoint.main(['to-torch', '--config', str(cfg_path),
                             '--ckpt', native, '--out', out])
    assert is_torch_checkpoint(out)
    other = jax.device_get(
        MoCoDADModel(cfg).init_variables(jax.random.key(11)))
    _assert_trees_equal(variables, restore_variables(out, other))

"""Reference-checkpoint interop: torch state dicts <-> flax variables.

Torch (CPU) is the oracle: torch-side layers are built with the exact
module names the reference uses (models/gcae/stsgcn.py:9-116,
models/mocodad.py:90-126), their state dict is converted, and the flax
forward must match the torch forward.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.utils.torch_compat import (convert_torch_state_dict,
                                            export_torch_state_dict,
                                            load_torch_checkpoint,
                                            map_torch_key)


class TorchSTGCNN(tnn.Module):
    """Test-local oracle mirroring the reference ST_GCNN_layer contract
    (graph mix einsums + 1x1 tcn conv + BN + residual + PReLU + emb)."""

    def __init__(self, c_in, c_out, t_dim, v_dim, emb_dim=None):
        super().__init__()

        class GCN(tnn.Module):
            def __init__(self):
                super().__init__()
                self.A = tnn.Parameter(torch.randn(t_dim, v_dim, v_dim) * 0.3)
                self.T = tnn.Parameter(torch.randn(v_dim, t_dim, t_dim) * 0.3)

            def forward(self, x):
                x = torch.einsum('nctv,vtq->ncqv', x, self.T)
                return torch.einsum('nctv,tvw->nctw', x, self.A)

        self.gcn = GCN()
        self.tcn = tnn.Sequential(tnn.Conv2d(c_in, c_out, (1, 1)),
                                  tnn.BatchNorm2d(c_out),
                                  tnn.Dropout(0.0))
        if c_in != c_out:
            self.residual = tnn.Sequential(tnn.Conv2d(c_in, c_out, (1, 1)),
                                           tnn.BatchNorm2d(c_out))
        else:
            self.residual = tnn.Identity()
        self.prelu = tnn.PReLU()
        if emb_dim:
            self.emb_layer = tnn.Sequential(
                tnn.SiLU(), tnn.Linear(emb_dim, c_out))
        self.emb_dim = emb_dim

    def forward(self, x, t_emb=None):
        res = self.residual(x)
        y = self.tcn(self.gcn(x))
        y = self.prelu(y + res)
        if self.emb_dim and t_emb is not None:
            e = self.emb_layer(t_emb)
            y = y + e[:, :, None, None]
        return y


def _randomize_bn(bn):
    with torch.no_grad():
        bn.weight.copy_(torch.rand_like(bn.weight) + 0.5)
        bn.bias.copy_(torch.randn_like(bn.bias) * 0.2)
        bn.running_mean.copy_(torch.randn_like(bn.running_mean) * 0.3)
        bn.running_var.copy_(torch.rand_like(bn.running_var) + 0.5)


@pytest.mark.parametrize('c_in,c_out', [(2, 16), (32, 32)])
def test_stgcnn_layer_conversion_matches_torch(c_in, c_out):
    from mocodad_tpu.nn.stsgcn import STGCNNLayer
    torch.manual_seed(0)
    t_dim, v_dim, emb_dim = 6, 17, 16
    layer = TorchSTGCNN(c_in, c_out, t_dim, v_dim, emb_dim)
    _randomize_bn(layer.tcn[1])
    if c_in != c_out:
        _randomize_bn(layer.residual[1])
    layer.eval()

    x = torch.randn(4, c_in, t_dim, v_dim)
    t_emb = torch.randn(4, emb_dim)
    with torch.no_grad():
        want = layer(x, t_emb).numpy()

    # convert under the reference key prefix for the p1a stack slot
    sd = {f'model.st_gcnnsp1a.0.{k}': v
          for k, v in layer.state_dict().items()}
    conv = convert_torch_state_dict(sd)
    assert not conv['_unmapped']

    fl = STGCNNLayer(in_channels=c_in, out_channels=c_out, time_dim=t_dim,
                     joints_dim=v_dim, dropout=0.0, emb_dim=emb_dim)
    variables = {'params': conv['params']['model']['p1a'],
                 'batch_stats': conv['batch_stats']['model']['p1a']}
    # flax applies SiLU inside the layer on the raw embedding
    got = fl.apply(variables, jnp.asarray(x.numpy()),
                   jnp.asarray(t_emb.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_joint_mix_conversion_matches_torch():
    from mocodad_tpu.nn.stsgcn import JointMixLayer
    torch.manual_seed(1)
    v_in, v_out, c, t = 17, 12, 8, 6
    block = tnn.Sequential(tnn.Conv2d(v_in, v_out, (1, 1)),
                           tnn.BatchNorm2d(v_out), tnn.Dropout(0.0))
    _randomize_bn(block[1])
    block.eval()

    # reference CNN_layer consumes (N, V, C, T) (stsgcn.py:161-199 with the
    # permute round-trip at the call site, stsae_unet.py:205)
    x = torch.randn(3, c, t, v_in)
    with torch.no_grad():
        want = block(x.permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()

    sd = {f'model.down1.block.{k}': v for k, v in block.state_dict().items()}
    conv = convert_torch_state_dict(sd)
    assert not conv['_unmapped']
    fl = JointMixLayer(in_joints=v_in, out_joints=v_out, dropout=0.0)
    got = fl.apply({'params': conv['params']['model']['down1'],
                    'batch_stats': conv['batch_stats']['model']['down1']},
                   jnp.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_linear_conversion_matches_torch():
    torch.manual_seed(2)
    lin = tnn.Linear(12, 5)
    x = torch.randn(7, 12)
    with torch.no_grad():
        want = lin(x).numpy()
    conv = convert_torch_state_dict(
        {f'model.to_time_dim.{k}': v for k, v in lin.state_dict().items()})
    p = conv['params']['model']
    got = x.numpy() @ p['to_time_dim_kernel'] + p['to_time_dim_bias']
    np.testing.assert_allclose(got, want, atol=1e-6)


def _flagship_cfg(**kw):
    base = dict(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
                conditioning_architecture='AE', channels=[32, 16, 32],
                embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.0,
                seg_len=6, num_coords=2, noise_steps=10,
                n_generated_samples=2, aggregation_strategy='best',
                batch_size=8, seed=0)
    base.update(kw)
    return Config(**base)


def test_full_model_export_convert_roundtrip(tmp_path):
    """export -> torch.save -> load_torch_checkpoint is lossless and
    covers every flax leaf (strict), and the restored model's forward is
    bit-identical."""
    model = MoCoDADModel(_flagship_cfg())
    variables = model.init_variables(jax.random.key(3))

    sd = export_torch_state_dict(jax.device_get(variables))
    tensors = {k: torch.from_numpy(np.array(v, copy=True))
               for k, v in sd.items()}
    path = str(tmp_path / 'ref_style.ckpt')
    torch.save({'state_dict': tensors,
                'hyper_parameters': {}}, path)  # Lightning-shaped payload

    restored = load_torch_checkpoint(path, variables, strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the eval CLI's restore path auto-detects the torch format
    from mocodad_tpu.training.checkpoint import restore_variables
    auto = restore_variables(path, variables)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(auto)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latent_model_export_convert_roundtrip(tmp_path):
    """The latent variant exercises the Denoiser MLP (net.{i}/cond_layers)
    and the STSE_Unet main-net mappings."""
    from mocodad_tpu.models import MoCoDADLatentModel
    model = MoCoDADLatentModel(_flagship_cfg(
        diffusion_on_latent=True, stage='diffusion',
        latent_embedding_dim=32, hidden_sizes=[32, 64, 32]))
    variables = model.init_variables(jax.random.key(4))

    sd = export_torch_state_dict(jax.device_get(variables))
    assert any(k.startswith('denoiser.net.') for k in sd)
    assert any(k.startswith('denoiser.cond_layers.') for k in sd)
    tensors = {k: torch.from_numpy(np.array(v, copy=True))
               for k, v in sd.items()}
    path = str(tmp_path / 'latent.ckpt')
    torch.save({'state_dict': tensors}, path)

    restored = load_torch_checkpoint(path, variables, strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_e_unet_condition_encoder_roundtrip(tmp_path):
    """E_unet conditioning maps through the same st_gcnns* naming under
    the condition_encoder prefix (no emb layers: embedding_dim=None)."""
    model = MoCoDADModel(_flagship_cfg(conditioning_architecture='E_unet'))
    variables = model.init_variables(jax.random.key(6))
    sd = export_torch_state_dict(jax.device_get(variables))
    assert any(k.startswith('condition_encoder.st_gcnnsp1a') for k in sd)
    assert not any('condition_encoder' in k and 'emb_layer' in k
                   for k in sd)
    tensors = {k: torch.from_numpy(np.array(v, copy=True))
               for k, v in sd.items()}
    path = str(tmp_path / 'eunet.ckpt')
    torch.save({'state_dict': tensors}, path)
    restored = load_torch_checkpoint(path, variables, strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_denoiser_mlp_conversion_matches_torch():
    """Torch-side Denoiser stack (Sequential Linear+BN1d+ReLU layers with
    additive cond projections, ref components.py:229-245) converts to the
    flax Denoiser with identical forwards."""
    from mocodad_tpu.nn.components import Denoiser
    torch.manual_seed(5)
    sizes, cond = [16, 32, 16], 8

    class TorchDenoiser(tnn.Module):
        def __init__(self):
            super().__init__()
            self.net = tnn.ModuleList()
            self.cond_layers = tnn.ModuleList()
            d = sizes[0]
            for i, nxt in enumerate(sizes[1:]):
                last = i == len(sizes) - 2
                self.cond_layers.append(tnn.Linear(cond, nxt))
                if last:
                    self.net.append(tnn.Linear(d, nxt))
                else:
                    self.net.append(tnn.Sequential(
                        tnn.Linear(d, nxt), tnn.BatchNorm1d(nxt),
                        tnn.ReLU()))
                d = nxt

        def forward(self, x, c):
            for i, layer in enumerate(self.net):
                x = layer(x) + self.cond_layers[i](c)
            return x

    td = TorchDenoiser()
    _randomize_bn(td.net[0][1])
    td.eval()
    x = torch.randn(6, sizes[0])
    t = torch.full((6,), 3.0)
    c = torch.randn(6, cond)

    conv = convert_torch_state_dict(
        {f'denoiser.{k}': v for k, v in td.state_dict().items()})
    assert not conv['_unmapped']

    import jax.numpy as jnp
    from mocodad_tpu.nn.components import sinusoidal_pos_encoding
    emb = sinusoidal_pos_encoding(jnp.asarray(t.numpy()), cond)
    with torch.no_grad():
        want = td(x, torch.from_numpy(np.asarray(emb)) +
                  c).numpy()

    fl = Denoiser(input_size=sizes[0], hidden_sizes=sizes[1:],
                  cond_size=cond)
    got = fl.apply({'params': conv['params']['denoiser'],
                    'batch_stats': conv['batch_stats']['denoiser']},
                   jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
                   jnp.asarray(c.numpy()), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_map_torch_key_ignores_bookkeeping():
    assert map_torch_key('model.st_gcnnsd1.0.tcn.1.num_batches_tracked',
                         np.zeros(())) is None
    assert map_torch_key('some_other_root.weight', np.zeros((2, 2))) is None


def test_ema_payload_loading(tmp_path):
    """use_ema selects the EMA shadow weights from a torch checkpoint —
    from the reference EMACallback's separate 'state_dict_ema' payload
    (ref utils/ema.py:66-72), or from embedded 'model_ema.module.*' keys;
    raw weights load otherwise (with a warning, not silently)."""
    model = MoCoDADModel(_flagship_cfg())
    variables = model.init_variables(jax.random.key(4))
    # "EMA" copy: every leaf shifted by +1 so the source is identifiable
    ema_vars = jax.tree_util.tree_map(lambda x: x + 1.0, variables)

    raw_sd = {k: torch.from_numpy(np.array(v, copy=True))
              for k, v in export_torch_state_dict(
                  jax.device_get(variables)).items()}
    ema_sd = {k: torch.from_numpy(np.array(v, copy=True))
              for k, v in export_torch_state_dict(
                  jax.device_get(ema_vars)).items()}

    # (a) separate payload, the reference's on-disk shape
    p1 = str(tmp_path / 'sep.ckpt')
    torch.save({'state_dict': raw_sd, 'state_dict_ema': ema_sd}, p1)
    got = load_torch_checkpoint(p1, variables, strict=True, use_ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(ema_vars),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    got_raw = load_torch_checkpoint(p1, variables, strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(got_raw)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (b) embedded model_ema.module.* keys in one state dict
    both = dict(raw_sd)
    both.update({f'model_ema.module.{k}': v for k, v in ema_sd.items()})
    p2 = str(tmp_path / 'emb.ckpt')
    torch.save({'state_dict': both}, p2)
    got2 = load_torch_checkpoint(p2, variables, strict=True, use_ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(ema_vars),
                    jax.tree_util.tree_leaves(got2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # raw load of the same file stays deterministic: raw weights win
    got2_raw = load_torch_checkpoint(p2, variables, strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(got2_raw)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # (c) no EMA copy anywhere: falls back to raw weights
    p3 = str(tmp_path / 'raw.ckpt')
    torch.save({'state_dict': raw_sd}, p3)
    got3 = load_torch_checkpoint(p3, variables, strict=True, use_ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(got3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # restore_variables plumbs use_ema through for torch files
    from mocodad_tpu.training.checkpoint import restore_variables
    auto = restore_variables(p1, variables, use_ema=True)
    for a, b in zip(jax.tree_util.tree_leaves(ema_vars['params']),
                    jax.tree_util.tree_leaves(auto['params'])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

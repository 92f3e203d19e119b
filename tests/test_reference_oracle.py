"""Parity against the ACTUAL reference torch modules under /root/reference.

test_torch_compat.py validates the interop layer against hand-written torch
mirrors; those mirrors could in principle share a misreading with the flax
port.  These tests remove that gap: they import the reference's own networks
(/root/reference/models/stsae/stsae_unet.py, models/stsae/stsae.py,
models/common/components.py — they run on CPU torch in this image) and
assert that

  (a) `export_torch_state_dict` loads into the real modules with ZERO
      missing/unexpected keys (`load_state_dict(strict=True)`), for the main
      U-Net, every conditioning architecture (AE / E / E_unet), and both
      latent-variant stages;
  (b) the flax forwards match the real torch forwards;
  (c) the full reverse-diffusion chain (ref models/mocodad.py:160-180)
      matches the repo's `lax.scan` sampler step-for-step when both sides
      consume identical gaussian draws, through the shipping 'best'
      aggregation (ref models/mocodad.py:505-512).

BatchNorm running stats and biases are randomized before export so the
degenerate init values (zero mean / unit var / zero bias) cannot mask a
wrong mapping.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADLatentModel, MoCoDADModel
from mocodad_tpu.models.mocodad import MoCoDADNet
from mocodad_tpu.models.mocodad_latent import MoCoDADLatentNet
from mocodad_tpu.utils.torch_compat import export_torch_state_dict

REF = '/root/reference'
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference checkout not available')
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)


def _ref_modules():
    from models.common.components import Denoiser as RefDenoiser
    from models.stsae.stsae import STSAE as RefSTSAE
    from models.stsae.stsae import STSE as RefSTSE
    from models.stsae.stsae_unet import STSAE_Unet as RefSTSAEUnet
    from models.stsae.stsae_unet import STSE_Unet as RefSTSEUnet
    return RefSTSAEUnet, RefSTSEUnet, RefSTSAE, RefSTSE, RefDenoiser


def _cfg(**kw):
    base = dict(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
                conditioning_architecture='AE', channels=[32, 16, 32],
                embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.0,
                seg_len=6, num_coords=2, noise_steps=10,
                n_generated_samples=2, aggregation_strategy='best',
                batch_size=8, seed=0)
    base.update(kw)
    return Config(**base)


def _perturb(variables, seed):
    """Randomize BN running stats / scales / biases so the export cannot
    pass by mapping a degenerate constant onto another degenerate slot."""
    rs = np.random.RandomState(seed)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(variables)
    out = []
    for path, leaf in leaves:
        name = str(path[-1])
        a = np.asarray(leaf)
        if 'var' in name:
            new = rs.uniform(0.5, 1.5, a.shape)
        elif 'mean' in name:
            new = rs.normal(0.0, 0.2, a.shape)
        elif 'scale' in name:
            new = rs.uniform(0.8, 1.2, a.shape)
        elif 'bias' in name:
            new = a + rs.normal(0.0, 0.05, a.shape)
        else:
            new = a  # keep fan-in-scaled weights from flax init
        out.append(jnp.asarray(new, a.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def _load_strict(module, sd, prefix):
    """Strict `load_state_dict` of the `prefix.`-rooted slice of an exported
    dict; torch raises if any key is missing or unexpected."""
    sub = {k[len(prefix) + 1:]: torch.from_numpy(np.array(v, copy=True))
           for k, v in sd.items() if k.startswith(prefix + '.')}
    assert sub, f'no exported keys under {prefix}.'
    module.load_state_dict(sub, strict=True)
    module.eval()
    return module


@pytest.mark.parametrize('arch', ['AE', 'E', 'E_unet'])
def test_forward_matches_reference_modules(arch):
    """Main STSAE_Unet + each conditioning architecture against the real
    reference modules (ref build_model, models/mocodad.py:90-126)."""
    RefSTSAEUnet, RefSTSEUnet, RefSTSAE, RefSTSE, _ = _ref_modules()
    model = MoCoDADModel(_cfg(conditioning_architecture=arch))
    variables = _perturb(jax.device_get(
        model.init_variables(jax.random.key(1))), seed=11)
    sd = export_torch_state_dict(variables)

    unet = _load_strict(
        RefSTSAEUnet(c_in=2, embedding_dim=16, n_frames=3, n_joints=17,
                     dropout=0.0, inject_condition=True), sd, 'model')
    if arch == 'AE':
        cond = RefSTSAE(c_in=2, h_dim=32, latent_dim=16, n_frames=3,
                        n_joints=17, layer_channels=[32, 16, 32], dropout=0.0)
    elif arch == 'E':
        cond = RefSTSE(c_in=2, h_dim=32, latent_dim=16, n_frames=3,
                       n_joints=17, layer_channels=[32, 16, 32], dropout=0.0)
    else:
        cond = RefSTSEUnet(c_in=2, embedding_dim=None, latent_dim=16,
                           n_frames=3, n_joints=17, dropout=0.0,
                           set_out_layer=True)
    cond = _load_strict(cond, sd, 'condition_encoder')

    rs = np.random.RandomState(2)
    b = 4
    x = rs.randn(b, 2, 3, 17).astype(np.float32)
    c = rs.randn(b, 2, 3, 17).astype(np.float32)
    t = rs.randint(1, 10, (b,)).astype(np.int64)

    with torch.no_grad():
        emb_t, rec_t = cond(torch.from_numpy(c), t=None)
        if not torch.is_tensor(rec_t):  # STSE -> None, STSE_Unet -> []
            rec_t = None
        pred_t, _ = unet(torch.from_numpy(x), torch.from_numpy(t),
                         condition_data=emb_t)

    emb_j, rec_j = model.net.apply(variables, jnp.asarray(c),
                                   method=MoCoDADNet.encode_condition)
    pred_j = model.net.apply(variables, jnp.asarray(x),
                             jnp.asarray(t, dtype=jnp.int32), emb_j,
                             method=MoCoDADNet.denoise)
    np.testing.assert_allclose(np.asarray(emb_j), emb_t.numpy(), atol=1e-5)
    if rec_t is not None:
        np.testing.assert_allclose(np.asarray(rec_j), rec_t.numpy(),
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_j), pred_t.numpy(), atol=1e-5)


def test_latent_pretrain_matches_reference():
    """Pretrain stage: bottlenecked STSAE_Unet at the constant t=-1
    (ref models/mocodad_latent.py:59-64, 95, 131-132)."""
    RefSTSAEUnet, _, RefSTSAE, _, _ = _ref_modules()
    model = MoCoDADLatentModel(_cfg(
        diffusion_on_latent=True, stage='pretrain', latent_embedding_dim=32,
        hidden_sizes=[32, 64, 32]))
    variables = _perturb(jax.device_get(
        model.init_variables(jax.random.key(3))), seed=13)
    sd = export_torch_state_dict(variables)

    unet = _load_strict(
        RefSTSAEUnet(c_in=2, embedding_dim=16, n_frames=3, n_joints=17,
                     dropout=0.0, inject_condition=True, use_bottleneck=True,
                     latent_dim=32), sd, 'model')
    cond = _load_strict(
        RefSTSAE(c_in=2, h_dim=32, latent_dim=16, n_frames=3, n_joints=17,
                 layer_channels=[32, 16, 32], dropout=0.0),
        sd, 'condition_encoder')

    rs = np.random.RandomState(4)
    b = 3
    x = rs.randn(b, 2, 3, 17).astype(np.float32)
    c = rs.randn(b, 2, 3, 17).astype(np.float32)
    t_const = torch.full((b,), -1, dtype=torch.long)

    with torch.no_grad():
        emb_t, _ = cond(torch.from_numpy(c), t=None)
        pose_t, _ = unet(torch.from_numpy(x), t_const, condition_data=emb_t)

    emb_j, _ = model.net.apply(variables, jnp.asarray(c),
                               method=MoCoDADLatentNet.encode_condition)
    pose_j = model.net.apply(variables, jnp.asarray(x), emb_j,
                             method=MoCoDADLatentNet.encode_input)
    np.testing.assert_allclose(np.asarray(emb_j), emb_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pose_j), pose_t.numpy(), atol=1e-5)


def test_latent_diffusion_matches_reference():
    """Diffusion stage: STSE_Unet latent encoder + MLP Denoiser
    (ref models/mocodad_latent.py:49-55, 104-107)."""
    _, RefSTSEUnet, RefSTSAE, _, RefDenoiser = _ref_modules()
    model = MoCoDADLatentModel(_cfg(
        diffusion_on_latent=True, stage='diffusion', latent_embedding_dim=32,
        hidden_sizes=[32, 64, 32]))
    variables = _perturb(jax.device_get(
        model.init_variables(jax.random.key(5))), seed=15)
    sd = export_torch_state_dict(variables)

    enc = _load_strict(
        RefSTSEUnet(c_in=2, embedding_dim=16, latent_dim=32, n_frames=3,
                    n_joints=17, dropout=0.0, set_out_layer=True,
                    unet_down_channels=[16, 32, 32, 64, 64, 128, 64]),
        sd, 'model')
    cond = _load_strict(
        RefSTSAE(c_in=2, h_dim=32, latent_dim=16, n_frames=3, n_joints=17,
                 layer_channels=[32, 16, 32], dropout=0.0),
        sd, 'condition_encoder')
    den = _load_strict(
        RefDenoiser(input_size=32, hidden_sizes=[32, 64, 32], cond_size=16),
        sd, 'denoiser')

    rs = np.random.RandomState(6)
    b = 3
    x = rs.randn(b, 2, 3, 17).astype(np.float32)
    c = rs.randn(b, 2, 3, 17).astype(np.float32)
    z = rs.randn(b, 32).astype(np.float32)
    t = rs.randint(1, 10, (b,)).astype(np.int64)
    t_const = torch.full((b,), -1, dtype=torch.long)

    with torch.no_grad():
        emb_t, _ = cond(torch.from_numpy(c), t=None)
        lat_t, _ = enc(torch.from_numpy(x), t_const, condition_data=emb_t)
        eps_t = den(torch.from_numpy(z), torch.from_numpy(t), emb_t)

    emb_j, _ = model.net.apply(variables, jnp.asarray(c),
                               method=MoCoDADLatentNet.encode_condition)
    lat_j = model.net.apply(variables, jnp.asarray(x), emb_j,
                            method=MoCoDADLatentNet.encode_input)
    eps_j = model.net.apply(variables, jnp.asarray(z),
                            jnp.asarray(t, dtype=jnp.int32), emb_j,
                            method=MoCoDADLatentNet.denoise_latent)
    np.testing.assert_allclose(np.asarray(lat_j), lat_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_j), eps_t.numpy(), atol=1e-5)


def test_generation_chain_matches_reference_loop():
    """Step-for-step reverse-diffusion parity: the reference's Python loop
    (models/mocodad.py:160-180) driven with the real torch modules vs the
    repo's folded `lax.scan` sampler, both consuming identical gaussian
    draws, through the 'best' aggregation (models/mocodad.py:505-512)."""
    RefSTSAEUnet, _, RefSTSAE, _, _ = _ref_modules()
    model = MoCoDADModel(_cfg())
    variables = _perturb(jax.device_get(
        model.init_variables(jax.random.key(7))), seed=17)
    sd = export_torch_state_dict(variables)

    # Load the FULL exported dict through one container so the joint
    # ('model', 'condition_encoder') prefix tree is validated strictly.
    class Container(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = RefSTSAEUnet(
                c_in=2, embedding_dim=16, n_frames=3, n_joints=17,
                dropout=0.0, inject_condition=True)
            self.condition_encoder = RefSTSAE(
                c_in=2, h_dim=32, latent_dim=16, n_frames=3, n_joints=17,
                layer_channels=[32, 16, 32], dropout=0.0)

    net = Container()
    net.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                         for k, v in sd.items()}, strict=True)
    net.eval()

    rs = np.random.RandomState(8)
    b, s, steps = 3, 2, model.schedule.noise_steps
    data = rs.randn(b, 2, 6, 17).astype(np.float32)
    x0 = rs.randn(s, b, 2, 3, 17).astype(np.float32)
    zs = rs.randn(steps - 1, s, b, 2, 3, 17).astype(np.float32)

    # -- torch side: the reference's eval loop verbatim (inject strategy:
    #    _prepare_input_data / corrupt extraction are identity) -----------
    dt = torch.from_numpy(data)
    cond_t, corrupt_t = dt[:, :, :3], dt[:, :, 3:]
    alpha = torch.from_numpy(np.array(model.schedule.alpha))
    alpha_hat = torch.from_numpy(np.array(model.schedule.alpha_hat))
    beta = torch.from_numpy(np.array(model.schedule.beta))
    generated = []
    with torch.no_grad():
        emb_t, _ = net.condition_encoder(cond_t, t=None)
        for si in range(s):
            x = torch.from_numpy(x0[si])
            for k, i in enumerate(reversed(range(1, steps))):
                t = torch.full((b,), i, dtype=torch.long)
                pred, _ = net.model(x, t, condition_data=emb_t)
                a, ah, be = alpha[i], alpha_hat[i], beta[i]
                noise = (torch.from_numpy(zs[k, si]) if i > 1
                         else torch.zeros_like(x))
                x = (1 / torch.sqrt(a)) * (
                    x - ((1 - a) / torch.sqrt(1 - ah)) * pred
                ) + torch.sqrt(be) * noise
            generated.append(x)
    # 'best' aggregation (ref models/mocodad.py:484, 505-512)
    losses = [torch.nn.functional.smooth_l1_loss(
        g, corrupt_t, reduction='none').reshape(b, -1).mean(-1)
        for g in generated]
    losses = torch.stack(losses)              # (S, B)
    best = losses.min(0)
    want_loss = best.values.numpy()
    want_x = torch.stack(generated)[best.indices,
                                    torch.arange(b)].numpy()

    # -- repo side: fold draws b-major (row = b*S + s) and run generate --
    x0_f = x0.transpose(1, 0, 2, 3, 4).reshape(s * b, 2, 3, 17)
    zs_f = zs.transpose(0, 2, 1, 3, 4, 5).reshape(steps - 1, s * b, 2, 3, 17)
    sel_x, sel_loss = model.generate(variables, jnp.asarray(data),
                                     jax.random.key(9),
                                     noise_override=(jnp.asarray(x0_f),
                                                     jnp.asarray(zs_f)))
    np.testing.assert_allclose(np.asarray(sel_loss), want_loss, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sel_x), want_x, atol=1e-4)


def test_latent_generation_chain_matches_reference_loop():
    """Step-for-step LATENT reverse-chain parity: the reference's Python
    loop over the latent DDPM (ref models/mocodad_latent.py:102-129 —
    frozen STSE_Unet encoder -> MLP Denoiser chain) driven with the real
    torch modules vs the repo's `lax.scan` sampler, both consuming
    identical gaussian draws, through the 'best' aggregation against the
    encoded latent (ref models/mocodad_latent.py:127)."""
    _, RefSTSEUnet, RefSTSAE, _, RefDenoiser = _ref_modules()
    model = MoCoDADLatentModel(_cfg(
        diffusion_on_latent=True, stage='diffusion', latent_embedding_dim=32,
        hidden_sizes=[32, 64, 32]))
    variables = _perturb(jax.device_get(
        model.init_variables(jax.random.key(21))), seed=23)
    sd = export_torch_state_dict(variables)

    # one container so the joint ('model', 'condition_encoder',
    # 'denoiser') prefix tree is validated strictly
    class Container(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = RefSTSEUnet(
                c_in=2, embedding_dim=16, latent_dim=32, n_frames=3,
                n_joints=17, dropout=0.0, set_out_layer=True,
                unet_down_channels=[16, 32, 32, 64, 64, 128, 64])
            self.condition_encoder = RefSTSAE(
                c_in=2, h_dim=32, latent_dim=16, n_frames=3, n_joints=17,
                layer_channels=[32, 16, 32], dropout=0.0)
            self.denoiser = RefDenoiser(
                input_size=32, hidden_sizes=[32, 64, 32], cond_size=16)

    net = Container()
    net.load_state_dict({k: torch.from_numpy(np.array(v, copy=True))
                         for k, v in sd.items()}, strict=True)
    net.eval()

    rs = np.random.RandomState(24)
    b, s, steps, dim = 3, 2, model.schedule.noise_steps, 32
    data = rs.randn(b, 2, 6, 17).astype(np.float32)
    z0 = rs.randn(s, b, dim).astype(np.float32)
    zs = rs.randn(steps - 1, s, b, dim).astype(np.float32)

    # -- torch side: the reference's latent eval loop verbatim -----------
    dt = torch.from_numpy(data)
    cond_t, corrupt_t = dt[:, :, :3], dt[:, :, 3:]
    alpha = torch.from_numpy(np.array(model.schedule.alpha))
    alpha_hat = torch.from_numpy(np.array(model.schedule.alpha_hat))
    beta = torch.from_numpy(np.array(model.schedule.beta))
    t_const = torch.full((b,), -1, dtype=torch.long)
    generated = []
    with torch.no_grad():
        emb_t, _ = net.condition_encoder(cond_t, t=None)
        latent_t, _ = net.model(corrupt_t, t_const, condition_data=emb_t)
        for si in range(s):
            x = torch.from_numpy(z0[si])
            for k, i in enumerate(reversed(range(1, steps))):
                t = torch.full((b,), i, dtype=torch.long)
                pred = net.denoiser(x, t, emb_t)
                a, ah, be = alpha[i], alpha_hat[i], beta[i]
                noise = (torch.from_numpy(zs[k, si]) if i > 1
                         else torch.zeros_like(x))
                x = (1 / torch.sqrt(a)) * (
                    x - ((1 - a) / torch.sqrt(1 - ah)) * pred
                ) + torch.sqrt(be) * noise
            generated.append(x)
    # 'best' aggregation against the ENCODED latent, not the pose
    # (ref models/mocodad_latent.py:127 -> models/mocodad.py:505-512)
    losses = [torch.nn.functional.smooth_l1_loss(
        g, latent_t, reduction='none').reshape(b, -1).mean(-1)
        for g in generated]
    losses = torch.stack(losses)              # (S, B)
    best = losses.min(0)
    want_loss = best.values.numpy()
    want_z = torch.stack(generated)[best.indices,
                                    torch.arange(b)].numpy()

    # -- repo side: fold draws b-major (row = b*S + s) and run generate --
    z0_f = z0.transpose(1, 0, 2).reshape(s * b, dim)
    zs_f = zs.transpose(0, 2, 1, 3).reshape(steps - 1, s * b, dim)
    sel_z, sel_loss = model.generate(variables, jnp.asarray(data),
                                     jax.random.key(25),
                                     noise_override=(jnp.asarray(z0_f),
                                                     jnp.asarray(zs_f)))
    np.testing.assert_allclose(np.asarray(sel_loss), want_loss, rtol=1e-5,
                               atol=1e-4)
    # the perturbed-random chain amplifies latents to O(100): a pure
    # atol would demand ~1e-9 relative agreement from two f32 9-step
    # chains; rtol carries the comparison for the large entries
    np.testing.assert_allclose(np.asarray(sel_z), want_z, rtol=1e-5,
                               atol=1e-4)

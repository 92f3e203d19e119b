"""Pallas megakernel parity (interpret mode on the CPU mesh; the compiled
path is exercised on real TPU by bench.py / verification drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.models.mocodad import MoCoDADNet
from mocodad_tpu.nn.components import sinusoidal_pos_encoding
from mocodad_tpu.ops.pallas_unet import build_pallas_denoiser


def _cfg(**kw):
    base = dict(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
                seg_len=6, num_coords=2, embedding_dim=16, h_dim=32,
                latent_dim=16, channels=[32, 16, 32], dropout=0.0,
                noise_steps=10, n_generated_samples=2,
                aggregation_strategy='best', conditioning_architecture='AE')
    base.update(kw)
    return Config(**base)


def _trained_variables(model, key=0):
    variables = model.init_variables(jax.random.key(key))
    _, _, mut = model.loss(
        variables, jax.random.normal(jax.random.key(9), (16, 2, 6, 17)),
        jax.random.key(10), train=True)
    return {'params': variables['params'],
            'batch_stats': mut['batch_stats']}


def test_pallas_kernel_matches_module_forward():
    model = MoCoDADModel(_cfg())
    variables = _trained_variables(model)
    v = jax.device_get(variables)

    n = 8
    x = np.asarray(jax.random.normal(jax.random.key(1),
                                     (n, 2, 3, 17))).astype(np.float32)
    t = jnp.array([3] * n)
    cond_emb = jax.random.normal(jax.random.key(2), (n, 16))

    want = model.net.apply(variables, jnp.asarray(x), t, cond_emb,
                           method=MoCoDADNet.denoise)

    denoise = build_pallas_denoiser(
        v['params']['model'], v['batch_stats']['model'],
        c_in=2, n_frames=3, n_joints=17, embedding_dim=16,
        nb=8, compute_dtype=jnp.float32, interpret=True)
    # kernel layout: (C, T*V, N) activations, (E, N) embedding
    x_ctn = jnp.asarray(x.reshape(n, 2, 51).transpose(1, 2, 0))
    silu_emb = jax.nn.silu(sinusoidal_pos_encoding(t, 16) + cond_emb).T
    got = denoise(x_ctn, silu_emb)
    got_nctv = jnp.transpose(got, (2, 0, 1)).reshape(n, 2, 3, 17)
    np.testing.assert_allclose(np.asarray(got_nctv), np.asarray(want),
                               rtol=5e-3, atol=5e-4)


def test_pallas_kernel_pads_ragged_batch():
    model = MoCoDADModel(_cfg())
    v = jax.device_get(_trained_variables(model))
    denoise = build_pallas_denoiser(
        v['params']['model'], v['batch_stats']['model'],
        c_in=2, n_frames=3, n_joints=17, embedding_dim=16,
        nb=8, compute_dtype=jnp.float32, interpret=True)
    # n = 12 pads internally to 16; output sliced back
    x = jax.random.normal(jax.random.key(0), (2, 51, 12))
    e = jax.random.normal(jax.random.key(1), (16, 12))
    out = denoise(x, e)
    assert out.shape == (2, 51, 12)
    # columns are independent: the first 8 match an nb-aligned call
    out8 = denoise(x[:, :, :8], e[:, :8])
    np.testing.assert_allclose(np.asarray(out[:, :, :8]), np.asarray(out8),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_pallas_generate_statistics_match_module_path():
    cfg = _cfg(n_generated_samples=3)
    model = MoCoDADModel(cfg)
    variables = _trained_variables(model)
    data = jax.random.normal(jax.random.key(1), (8, 2, 6, 17))

    sel_m, loss_m = model.generate(variables, data, jax.random.key(5))
    gen = model.build_pallas_eval(variables, nb=8, interpret=True)
    sel_p, loss_p = gen(data, jax.random.key(5))

    assert sel_p.shape == sel_m.shape and loss_p.shape == loss_m.shape
    # different RNG stream shapes -> compare statistics, not values
    assert abs(float(loss_p.mean()) - float(loss_m.mean())) < 0.1
    assert np.all(np.isfinite(np.asarray(loss_p)))


@pytest.mark.slow
def test_pallas_generate_pairs_windows_correctly():
    """A mean-only comparison cannot catch a b-major/s-major fold bug
    that pairs one window's samples with another window's target (on
    i.i.d. data the loss POPULATION is unchanged).  Scale each window by
    a distinct power of two: each window's loss is then dominated by its
    own target magnitude, so per-window loss RANKS must match the module
    path exactly if (and only if) the fold pairs windows correctly."""
    cfg = _cfg(n_generated_samples=3)
    model = MoCoDADModel(cfg)
    variables = _trained_variables(model)
    base = jax.random.normal(jax.random.key(1), (8, 2, 6, 17))
    scales = 4.0 ** jnp.arange(8)  # wide spacing: magnitude must dominate
                                   # the sampling noise in every pair
    # shuffle the scale order so rank order != batch order
    scales = scales[jnp.array([3, 6, 0, 5, 1, 7, 2, 4])]
    data = base * scales[:, None, None, None]

    _, loss_m = model.generate(variables, data, jax.random.key(5))
    gen = model.build_pallas_eval(variables, nb=8, interpret=True)
    _, loss_p = gen(data, jax.random.key(5))

    np.testing.assert_array_equal(np.argsort(np.asarray(loss_m)),
                                  np.argsort(np.asarray(loss_p)))
    # and both rank orders follow the injected target magnitudes
    np.testing.assert_array_equal(np.argsort(np.asarray(loss_m)),
                                  np.argsort(np.asarray(scales)))


def test_pallas_eval_rejects_unsupported_strategy():
    model = MoCoDADModel(_cfg(conditioning_strategy='concat',
                              conditioning_indices=2))
    with pytest.raises(ValueError):
        model.build_pallas_eval({'params': {}, 'batch_stats': {}})


@pytest.mark.parametrize('stage', ['pretrain', 'diffusion'])
def test_pallas_eval_rejects_latent_models(stage):
    """Latent models inherit the inject-only guard from the base class but
    the megakernel bakes base pose-space generate semantics — the
    capability check must say no instead of producing wrong scores."""
    from mocodad_tpu.models import MoCoDADLatentModel
    model = MoCoDADLatentModel(_cfg(diffusion_on_latent=True, stage=stage,
                                    latent_embedding_dim=32,
                                    hidden_sizes=[32, 64, 32]))
    assert not model.supports_pallas_eval()
    with pytest.raises(ValueError):
        model.build_pallas_eval({'params': {}, 'batch_stats': {}})

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.models.mocodad import MoCoDADNet
from mocodad_tpu.ops.fast_unet import build_fast_denoiser


def _cfg(**kw):
    base = dict(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
                seg_len=6, num_coords=2, embedding_dim=16, h_dim=32,
                latent_dim=16, channels=[32, 16, 32], dropout=0.0,
                noise_steps=10, n_generated_samples=2,
                aggregation_strategy='best', conditioning_architecture='AE')
    base.update(kw)
    return Config(**base)


@pytest.mark.parametrize('kw', [
    dict(conditioning_strategy='inject', conditioning_indices=[0, 1, 2]),
    dict(conditioning_strategy='concat', conditioning_indices=2),
    dict(conditioning_strategy='no_condition'),
], ids=['inject', 'concat', 'no_condition'])
def test_fast_denoiser_matches_module_forward(kw):
    model = MoCoDADModel(_cfg(**kw))
    variables = model.init_variables(jax.random.key(0))
    if kw['conditioning_strategy'] == 'inject':
        # make BN running stats non-trivial so folding is actually
        # exercised (once is enough — the folding code is shared; the
        # extra train-mode compiles per strategy dominated wall-time)
        _, _, mut = model.loss(
            variables, jax.random.normal(jax.random.key(9), (16, 2, 6, 17)),
            jax.random.key(10), train=True)
        variables = {'params': variables['params'],
                     'batch_stats': mut['batch_stats']}

    b = 8
    x = jax.random.normal(jax.random.key(1),
                          (b, 2, model.input_n_frames, 17))
    t = jnp.array([3] * b)
    emb = (jax.random.normal(jax.random.key(2), (b, 16))
           if model.strategy == 'inject' else None)

    want = model.net.apply(variables, x, t, emb, method=MoCoDADNet.denoise)
    fast = build_fast_denoiser(
        variables['params']['model'], variables['batch_stats']['model'],
        c_in=2, n_frames=model.input_n_frames, n_joints=17,
        embedding_dim=16,
        inject_condition=(model.strategy == 'inject'))
    got = fast(x, t, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_association_rewrite_is_exact_algebra():
    """channel-first-when-narrowing (the default) is (K@X)@W == K@(X@W):
    on true f32 the two associations agree to float rounding."""
    model = MoCoDADModel(_cfg())
    variables = model.init_variables(jax.random.key(0))
    kw = dict(c_in=2, n_frames=model.input_n_frames, n_joints=17,
              embedding_dim=16, inject_condition=True)
    P = variables['params']['model']
    S = variables['batch_stats']['model']
    graph_first = build_fast_denoiser(
        P, S, channel_first_when_narrowing=False, **kw)
    assoc = build_fast_denoiser(
        P, S, channel_first_when_narrowing=True, **kw)
    x = jax.random.normal(jax.random.key(1), (16, 2, model.input_n_frames,
                                              17))
    t = jnp.array([5] * 16)
    emb = jax.random.normal(jax.random.key(2), (16, 16))
    a = np.asarray(graph_first(x, t, emb))
    b = np.asarray(assoc(x, t, emb))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)


def test_generate_fast_matches_module_path():
    cfg = _cfg()
    model_fast = MoCoDADModel(cfg)
    cfg_slow = _cfg()
    cfg_slow.extras['fast_eval'] = False
    model_slow = MoCoDADModel(cfg_slow)
    variables = model_fast.init_variables(jax.random.key(0))
    data = jax.random.normal(jax.random.key(1), (4, 2, 6, 17))
    sel_f, loss_f = model_fast.generate(variables, data, jax.random.key(2))
    sel_s, loss_s = model_slow.generate(variables, data, jax.random.key(2))
    np.testing.assert_allclose(np.asarray(loss_f), np.asarray(loss_s),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sel_f), np.asarray(sel_s),
                               rtol=1e-3, atol=1e-4)

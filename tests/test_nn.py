import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mocodad_tpu.nn import (STSAE, STSE, Denoiser, STGCNNLayer, STSAEUnet,
                            STSEUnet)
from mocodad_tpu.nn.stsgcn import (ConvTemporalGraphical,
                                   compose_graph_operator,
                                   graph_mix_reference)


def test_composed_graph_operator_equals_two_einsums(rng):
    n, c, t, v = 5, 8, 6, 17
    x = jnp.asarray(rng.normal(size=(n, c, t, v)), dtype=jnp.float32)
    tm = jnp.asarray(rng.normal(size=(v, t, t)), dtype=jnp.float32)
    a = jnp.asarray(rng.normal(size=(t, v, v)), dtype=jnp.float32)

    want = graph_mix_reference(x, tm, a)
    k = compose_graph_operator(tm, a)
    got = (x.reshape(n, c, t * v) @ k).reshape(n, c, t, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_conv_temporal_graphical_init_bounds():
    mod = ConvTemporalGraphical(time_dim=6, joints_dim=17)
    variables = mod.init(jax.random.key(0), jnp.zeros((2, 3, 6, 17)))
    a = np.asarray(variables['params']['A'])
    tm = np.asarray(variables['params']['T'])
    assert a.shape == (6, 17, 17) and tm.shape == (17, 6, 6)
    # ref init: A ~ U(+-1/sqrt(V)), T ~ U(+-1/sqrt(T))
    assert np.abs(a).max() <= 1 / np.sqrt(17) + 1e-6
    assert np.abs(tm).max() <= 1 / np.sqrt(6) + 1e-6


@pytest.mark.parametrize('c_in,c_out', [(2, 16), (32, 32)])
def test_stgcnn_layer_shapes(c_in, c_out):
    layer = STGCNNLayer(in_channels=c_in, out_channels=c_out, time_dim=6,
                        joints_dim=17, dropout=0.0, emb_dim=16)
    x = jnp.ones((4, c_in, 6, 17))
    t_emb = jnp.ones((4, 16))
    variables = layer.init(jax.random.key(0), x, t_emb)
    y = layer.apply(variables, x, t_emb)
    assert y.shape == (4, c_out, 6, 17)
    # identity residual has no extra params
    has_res = 'residual_kernel' in variables['params']
    assert has_res == (c_in != c_out)


def test_stgcnn_layer_batchnorm_stats_update():
    layer = STGCNNLayer(in_channels=2, out_channels=8, time_dim=6,
                        joints_dim=17, dropout=0.0)
    x = jnp.ones((4, 2, 6, 17))
    variables = layer.init(jax.random.key(0), x)
    _, updates = layer.apply(variables, x * 3.0, train=True,
                             mutable=['batch_stats'],
                             rngs={'dropout': jax.random.key(1)})
    old = jax.tree_util.tree_leaves(variables['batch_stats'])
    new = jax.tree_util.tree_leaves(updates['batch_stats'])
    assert any(not np.allclose(np.asarray(o), np.asarray(n))
               for o, n in zip(old, new))


def test_stse_and_stsae_shapes():
    x = jnp.ones((3, 2, 3, 17))
    stse = STSE(c_in=2, h_dim=32, latent_dim=16, n_frames=3, n_joints=17,
                layer_channels=(32, 16, 32), dropout=0.0)
    variables = stse.init(jax.random.key(0), x)
    z, rec = stse.apply(variables, x)
    assert z.shape == (3, 16) and rec is None

    stsae = STSAE(c_in=2, h_dim=32, latent_dim=16, n_frames=3, n_joints=17,
                  layer_channels=(32, 16, 32), dropout=0.0)
    variables = stsae.init(jax.random.key(0), x)
    z, rec = stsae.apply(variables, x)
    assert z.shape == (3, 16)
    assert rec.shape == x.shape


@pytest.mark.parametrize('n_joints', [17, 18, 14])
def test_stsae_unet_shapes(n_joints):
    # inject strategy: input is the corrupted half only (T=3)
    x = jnp.ones((2, 2, 3, n_joints))
    t = jnp.array([5, 3])
    cond = jnp.ones((2, 16))
    net = STSAEUnet(c_in=2, embedding_dim=16, n_frames=3, n_joints=n_joints,
                    dropout=0.0, inject_condition=True)
    variables = net.init(jax.random.key(0), x, t, cond)
    y, _ = net.apply(variables, x, t, cond)
    assert y.shape == x.shape


def test_stsae_unet_bottleneck_roundtrip_shape():
    x = jnp.ones((2, 2, 3, 17))
    t = jnp.array([1, 2])
    net = STSAEUnet(c_in=2, embedding_dim=16, n_frames=3, n_joints=17,
                    dropout=0.0, use_bottleneck=True, latent_dim=64,
                    inject_condition=True)
    variables = net.init(jax.random.key(0), x, t, jnp.ones((2, 16)))
    y, _ = net.apply(variables, x, t, jnp.ones((2, 16)))
    assert y.shape == x.shape
    assert 'rev_to_time_dim_kernel' in variables['params']


def test_stse_unet_latent_head():
    x = jnp.ones((2, 2, 3, 17))
    t = jnp.array([1, 2])
    net = STSEUnet(c_in=2, embedding_dim=16, latent_dim=64, n_frames=3,
                   n_joints=17, dropout=0.0, set_out_layer=True,
                   unet_down_channels=(16, 32, 32, 64, 64, 128, 64))
    variables = net.init(jax.random.key(0), x, t)
    z, _ = net.apply(variables, x, t)
    assert z.shape == (2, 64)


def test_denoiser_shapes():
    net = Denoiser(input_size=64, hidden_sizes=(64, 128, 128, 64),
                   cond_size=16)
    x = jnp.ones((5, 64))
    t = jnp.array([1, 2, 3, 4, 5])
    cond = jnp.ones((5, 16))
    variables = net.init(jax.random.key(0), x, t, cond)
    y = net.apply(variables, x, t, cond)
    assert y.shape == (5, 64)


def test_unet_condition_injection_changes_output():
    x = jnp.ones((2, 2, 3, 17))
    t = jnp.array([5, 5])
    net = STSAEUnet(c_in=2, embedding_dim=16, n_frames=3, n_joints=17,
                    dropout=0.0, inject_condition=True)
    variables = net.init(jax.random.key(0), x, t, jnp.ones((2, 16)))
    y1, _ = net.apply(variables, x, t, jnp.ones((2, 16)))
    y2, _ = net.apply(variables, x, t, 2.0 * jnp.ones((2, 16)))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))

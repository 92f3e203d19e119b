import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.parallel import make_mesh
from mocodad_tpu.training.checkpoint import (TopKCheckpointManager,
                                             load_checkpoint,
                                             merge_matching,
                                             restore_variables,
                                             save_checkpoint)
from mocodad_tpu.training.ema import ema_update
from mocodad_tpu.training.loop import Trainer, monitored_metric_for


def test_monitored_metric_selection():
    assert monitored_metric_for(Config(validation=True)) == ('AUC', 'max')
    assert monitored_metric_for(Config(validation=False)) == \
        ('loss_noise', 'min')
    assert monitored_metric_for(
        Config(diffusion_on_latent=True, stage='pretrain')) == \
        ('pretrain_rec_loss', 'min')
    # latent diffusion stage with validation -> AUC
    assert monitored_metric_for(
        Config(diffusion_on_latent=True, stage='diffusion',
               validation=True)) == ('AUC', 'max')


def test_checkpoint_roundtrip(tmp_path):
    state = {'params': {'w': np.arange(6, dtype=np.float32).reshape(2, 3)},
             'step': np.int32(7)}
    path = str(tmp_path / 'x.ckpt')
    save_checkpoint(path, state, meta={'epoch': 1})
    restored = load_checkpoint(path, jax.tree_util.tree_map(np.zeros_like,
                                                            state))
    np.testing.assert_array_equal(restored['params']['w'],
                                  state['params']['w'])
    assert os.path.exists(path + '.json')


def test_topk_manager_keeps_best(tmp_path):
    mgr = TopKCheckpointManager(str(tmp_path), monitor='AUC', mode='max', k=2)
    state = {'w': np.ones(3)}
    mgr.save(state, 0, 0.5)
    mgr.save(state, 1, 0.7)
    mgr.save(state, 2, 0.6)
    mgr.save(state, 3, 0.4)  # not top-2
    kept = sorted(f for f in os.listdir(tmp_path)
                  if f.startswith('epoch=') and f.endswith('.ckpt'))
    assert kept == ['epoch=1-AUC=0.700000.ckpt', 'epoch=2-AUC=0.600000.ckpt']
    assert os.path.exists(tmp_path / 'best_weights.ckpt')
    assert os.path.exists(tmp_path / 'last.ckpt')
    assert mgr.best == 0.7


def test_merge_matching_partial_load():
    target = {'a': np.zeros((2, 2)), 'b': {'c': np.zeros(3)},
              'd': np.zeros(4)}
    source = {'a': np.ones((2, 2)), 'b': {'c': np.ones(5)},  # 'c' mismatched
              'extra': np.ones(1)}
    merged = merge_matching(target, source)
    np.testing.assert_array_equal(merged['a'], np.ones((2, 2)))
    np.testing.assert_array_equal(merged['b']['c'], np.zeros(3))  # kept
    np.testing.assert_array_equal(merged['d'], np.zeros(4))


def test_ema_update_moves_toward_params():
    ema = {'w': jnp.zeros(3)}
    params = {'w': jnp.ones(3)}
    out = ema_update(ema, params, 0.9)
    np.testing.assert_allclose(np.asarray(out['w']), 0.1 * np.ones(3),
                               rtol=1e-6)


def _tiny_cfg(tmp_path, **kw):
    base = dict(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
                seg_len=6, num_coords=2, embedding_dim=16, h_dim=32,
                latent_dim=16, channels=[32, 16, 32], dropout=0.0,
                noise_steps=10, n_generated_samples=2, batch_size=64,
                aggregation_strategy='best', conditioning_architecture='AE',
                ckpt_dir=str(tmp_path), num_transform=1, opt_lr=1e-3,
                seed=0)
    base.update(kw)
    return Config(**base)


def test_train_step_on_8_device_mesh(tmp_path):
    from mocodad_tpu.data.pipeline import PoseWindows
    cfg = _tiny_cfg(tmp_path)
    rng = np.random.default_rng(0)
    ds = PoseWindows(
        data=rng.normal(size=(256, 2, 6, 17)).astype(np.float32) * 0.1,
        meta=np.zeros((256, 4), np.int64),
        frames=np.tile(np.arange(1, 7, dtype=np.int32), (256, 1)),
        num_transform=1)
    mesh = make_mesh(8)
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.fit(ds, n_epochs=2)
    assert int(state.step) == 2 * (256 // 64)
    # checkpoints written under the monitored metric
    assert os.path.exists(os.path.join(cfg.ckpt_dir, 'last.ckpt'))
    assert os.path.exists(os.path.join(cfg.ckpt_dir, 'best_weights.ckpt'))
    # params replicated across the mesh, finite
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_lr_logged_per_epoch(tmp_path):
    """The decayed learning rate is observable per epoch in metrics.csv
    (the reference attaches a LearningRateMonitor, ref
    train_MoCoDAD.py:57-62): an lr field on every epoch_end row, equal
    to the ExponentialLR(0.99) schedule at the epoch-end step."""
    from mocodad_tpu.data.pipeline import PoseWindows
    rng = np.random.default_rng(7)
    ds = PoseWindows(
        data=rng.normal(size=(128, 2, 6, 17)).astype(np.float32) * 0.1,
        meta=np.zeros((128, 4), np.int64),
        frames=np.tile(np.arange(1, 7, dtype=np.int32), (128, 1)),
        num_transform=1)
    cfg = _tiny_cfg(tmp_path, opt_lr=1e-3)
    Trainer(cfg, mesh=make_mesh(1)).fit(ds, n_epochs=3)

    lrs = []
    with open(os.path.join(cfg.ckpt_dir, 'metrics.csv')) as f:
        for line in f:
            epoch, tag, rest = line.split(',', 2)
            if tag != 'epoch_end':
                continue
            fields = dict(kv.split('=') for kv in rest.strip().split(','))
            assert 'lr' in fields, line
            lrs.append(float(fields['lr']))
    # staircase decay: epoch k ends at step (k+1)*steps_per_epoch,
    # where the schedule has already stepped down k+1 times
    assert len(lrs) == 3
    np.testing.assert_allclose(
        lrs, [1e-3 * 0.99 ** (k + 1) for k in range(3)], rtol=1e-6)


def test_resume_matches_uninterrupted_run(tmp_path):
    """A run killed after epoch k and resumed from last.ckpt must follow the
    exact same trajectory as an uninterrupted run (same fold_in RNG stream,
    same per-epoch shuffles, same EMA/opt state)."""
    from mocodad_tpu.data.pipeline import PoseWindows
    rng = np.random.default_rng(1)
    ds = PoseWindows(
        data=rng.normal(size=(64, 2, 6, 17)).astype(np.float32) * 0.1,
        meta=np.zeros((64, 4), np.int64),
        frames=np.tile(np.arange(1, 7, dtype=np.int32), (64, 1)),
        num_transform=1)

    cfg_a = _tiny_cfg(tmp_path / 'a', use_ema=True)
    full = Trainer(cfg_a, mesh=make_mesh(1)).fit(ds, n_epochs=3)

    cfg_b = _tiny_cfg(tmp_path / 'b', use_ema=True)
    trainer_b = Trainer(cfg_b, mesh=make_mesh(1))
    trainer_b.fit(ds, n_epochs=1)  # "killed" after epoch 0
    resumed = trainer_b.fit(ds, n_epochs=3, resume='auto')

    assert int(resumed.step) == int(full.step)
    for x, y in zip(jax.tree_util.tree_leaves(full.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-6)
    for x, y in zip(jax.tree_util.tree_leaves(full.ema_params),
                    jax.tree_util.tree_leaves(resumed.ema_params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-6)


def test_restore_variables_roundtrip(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    model = MoCoDADModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    state = {'params': variables['params'],
             'batch_stats': variables['batch_stats'],
             'opt_state': {}, 'ema_params': None, 'step': np.int32(3)}
    path = str(tmp_path / 'm.ckpt')
    save_checkpoint(path, state)
    template = jax.tree_util.tree_map(np.zeros_like,
                                      jax.device_get(variables))
    restored = restore_variables(path, template)
    a = jax.tree_util.tree_leaves(variables['params'])
    b = jax.tree_util.tree_leaves(restored['params'])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_device_pool_matches_host_batches(tmp_path):
    """Pool-mode training (device-resident windows, index-only batches)
    must follow the exact same trajectory as host-batch training: same
    shuffles, same fold_in(step) keys, identical gathered data."""
    from mocodad_tpu.data.pipeline import PoseWindows
    rng = np.random.default_rng(2)
    ds = PoseWindows(
        data=rng.normal(size=(128, 2, 6, 17)).astype(np.float32) * 0.1,
        meta=np.zeros((128, 4), np.int64),
        frames=np.tile(np.arange(1, 7, dtype=np.int32), (128, 1)),
        num_transform=2)

    cfg_h = _tiny_cfg(tmp_path / 'host', num_transform=2)
    cfg_h.extras['device_data'] = False
    host = Trainer(cfg_h, mesh=make_mesh(2)).fit(ds, n_epochs=2)

    cfg_p = _tiny_cfg(tmp_path / 'pool', num_transform=2)
    cfg_p.extras['device_data'] = True
    pool = Trainer(cfg_p, mesh=make_mesh(2)).fit(ds, n_epochs=2)

    assert int(host.step) == int(pool.step)
    for x, y in zip(jax.tree_util.tree_leaves(host.params),
                    jax.tree_util.tree_leaves(pool.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-6)


def test_old_aug_forces_host_batches(tmp_path):
    from mocodad_tpu.data.pipeline import PoseWindows
    cfg = _tiny_cfg(tmp_path)
    ds = PoseWindows(data=np.zeros((8, 2, 6, 17), np.float32),
                     meta=np.zeros((8, 4), np.int64),
                     frames=np.tile(np.arange(1, 7, dtype=np.int32), (8, 1)),
                     num_transform=0, old_aug=True)
    assert not Trainer(cfg, mesh=make_mesh(1))._use_device_pool(ds)
    cfg.extras['device_data'] = False
    assert not Trainer(cfg, mesh=make_mesh(1))._use_device_pool(ds)
    # an explicit request that can't be honored must fail loudly, not
    # silently degrade to host batches
    cfg.extras['device_data'] = True
    with pytest.raises(ValueError):
        Trainer(cfg, mesh=make_mesh(1))._use_device_pool(ds)
    cfg.extras['device_data'] = 'ture'  # typos surface even with old_aug
    with pytest.raises(ValueError):
        Trainer(cfg, mesh=make_mesh(1))._use_device_pool(ds)


def test_multi_step_dispatch_matches_single(tmp_path):
    """steps_per_dispatch > 1 (K index-batches scanned inside one launch)
    must follow the exact same trajectory as one-step-per-launch: the
    per-step key is fold_in(rng, state.step) inside the jit either way.
    Covers the non-divisible tail (10 batches/epoch, K=4 -> 2 groups + 2
    tail launches)."""
    from mocodad_tpu.data.pipeline import PoseWindows
    rng = np.random.default_rng(3)
    ds = PoseWindows(
        data=rng.normal(size=(320, 2, 6, 17)).astype(np.float32) * 0.1,
        meta=np.zeros((320, 4), np.int64),
        frames=np.tile(np.arange(1, 7, dtype=np.int32), (320, 1)),
        num_transform=2)

    cfg_1 = _tiny_cfg(tmp_path / 'k1', num_transform=2)
    cfg_1.extras['device_data'] = True
    cfg_1.extras['steps_per_dispatch'] = 1
    one = Trainer(cfg_1, mesh=make_mesh(2)).fit(ds, n_epochs=2)

    cfg_k = _tiny_cfg(tmp_path / 'k4', num_transform=2)
    cfg_k.extras['device_data'] = True
    cfg_k.extras['steps_per_dispatch'] = 4
    multi = Trainer(cfg_k, mesh=make_mesh(2)).fit(ds, n_epochs=2)

    assert int(one.step) == int(multi.step) == 2 * 10
    for x, y in zip(jax.tree_util.tree_leaves(one.params),
                    jax.tree_util.tree_leaves(multi.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-6)


def test_steps_per_dispatch_validation(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    cfg.extras['steps_per_dispatch'] = 0
    with pytest.raises(ValueError):
        Trainer(cfg, mesh=make_mesh(1)).steps_per_dispatch(True)
    cfg.extras['steps_per_dispatch'] = 4
    with pytest.raises(ValueError):
        Trainer(cfg, mesh=make_mesh(1)).steps_per_dispatch(False)
    cfg.extras['steps_per_dispatch'] = 'auto'
    t = Trainer(cfg, mesh=make_mesh(1))
    assert t.steps_per_dispatch(True) == 8
    assert t.steps_per_dispatch(False) == 1


def test_wandb_mirror_with_stub(tmp_path, monkeypatch):
    """The wandb mirror (init / per-epoch log / log_model artifact upload,
    ref train_MoCoDAD.py:57-62) exercised via a stub module — the real
    package is absent in this image, so this is the branch's only
    coverage."""
    import sys
    import types

    from mocodad_tpu.data.pipeline import PoseWindows

    calls = {'init': [], 'log': [], 'artifacts': []}

    class _Run:
        def log(self, means, step=None):
            calls['log'].append((dict(means), step))

        def log_artifact(self, art):
            calls['artifacts'].append(art)

    class _Artifact:
        def __init__(self, name, type=None):
            self.name, self.type = name, type
            self.files = []

        def add_file(self, path):
            assert os.path.exists(path), path
            self.files.append(path)

    stub = types.ModuleType('wandb')
    stub.init = lambda **kw: (calls['init'].append(kw), _Run())[1]
    stub.Artifact = _Artifact
    monkeypatch.setitem(sys.modules, 'wandb', stub)

    rng = np.random.default_rng(4)
    ds = PoseWindows(
        data=rng.normal(size=(64, 2, 6, 17)).astype(np.float32) * 0.1,
        meta=np.zeros((64, 4), np.int64),
        frames=np.tile(np.arange(1, 7, dtype=np.int32), (64, 1)),
        num_transform=1)
    cfg = _tiny_cfg(tmp_path, use_wandb=True, project_name='p',
                    group_name='g', dir_name='run')
    cfg.extras['log_model'] = True
    trainer = Trainer(cfg, mesh=make_mesh(1))
    trainer.fit(ds, n_epochs=2)

    assert calls['init'] and calls['init'][0]['project'] == 'p'
    assert len(calls['log']) == 2 and 'loss_noise' in calls['log'][0][0]
    # log_model mirrors the checkpoint artifact each epoch
    assert len(calls['artifacts']) == 2
    assert calls['artifacts'][0].files[0].endswith('last.ckpt')


def test_profile_dir_writes_trace(tmp_path):
    """profile_dir -> jax.profiler trace of the first epoch (SURVEY §5
    tracing row)."""
    from mocodad_tpu.data.pipeline import PoseWindows
    rng = np.random.default_rng(5)
    ds = PoseWindows(
        data=rng.normal(size=(64, 2, 6, 17)).astype(np.float32) * 0.1,
        meta=np.zeros((64, 4), np.int64),
        frames=np.tile(np.arange(1, 7, dtype=np.int32), (64, 1)),
        num_transform=1)
    cfg = _tiny_cfg(tmp_path)
    prof = str(tmp_path / 'trace')
    cfg.extras['profile_dir'] = prof
    Trainer(cfg, mesh=make_mesh(1)).fit(ds, n_epochs=1)
    found = [os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs]
    assert found, 'no profiler trace written'


def test_latent_transfer_restores_batch_stats(tmp_path):
    """The diffusion stage must inherit the pretrain checkpoint's
    BatchNorm running stats, not just params — the reference's
    strict=False load restores BN buffers too (mocodad_latent.py:223-228);
    without them the frozen encoder normalizes with mean=0/var=1."""
    from mocodad_tpu.models import build_model

    def latent_cfg(stage):
        return Config(
            conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
            seg_len=6, num_coords=2, embedding_dim=16, h_dim=32,
            latent_dim=16, channels=[32, 16, 32], dropout=0.0,
            noise_steps=10, n_generated_samples=2, batch_size=32,
            aggregation_strategy='best', conditioning_architecture='AE',
            ckpt_dir=str(tmp_path), num_transform=1, opt_lr=1e-3, seed=0,
            diffusion_on_latent=True, stage=stage,
            latent_embedding_dim=16, hidden_sizes=[16, 32, 32, 16],
            pretrained_model_ckpt_path=os.path.join(str(tmp_path),
                                                    'pre.ckpt'))

    pre_model = build_model(latent_cfg('pretrain'))
    variables = pre_model.init_variables(jax.random.key(0))
    # make the running stats distinguishable from a fresh init
    shifted_stats = jax.tree_util.tree_map(lambda x: x + 3.0,
                                           variables['batch_stats'])
    save_checkpoint(os.path.join(str(tmp_path), 'pre.ckpt'),
                    {'params': variables['params'],
                     'batch_stats': shifted_stats,
                     'opt_state': {}, 'ema_params': None,
                     'step': np.int32(1)})

    trainer = Trainer(latent_cfg('diffusion'), mesh=make_mesh(1))
    state = trainer.init_state(steps_per_epoch=1, rng=jax.random.key(1))
    import flax.serialization as ser
    got = ser.to_state_dict(state.batch_stats)
    want = ser.to_state_dict(jax.device_get(shifted_stats))

    def overlap_equal(w, g, path=''):
        n = 0
        if isinstance(w, dict):
            for k in w:
                if isinstance(g, dict) and k in g:
                    n += overlap_equal(w[k], g[k], f'{path}/{k}')
            return n
        if np.shape(w) == np.shape(g):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-6, err_msg=path)
            return 1
        return 0

    assert overlap_equal(want, got) > 0, 'no shared BN stats leaves found'


def test_shard_batch_rejects_indivisible_batch():
    """cfg.batch_size not a multiple of the device count used to surface
    as an opaque device_put sharding error deep inside the first step —
    it must be a clear config error instead."""
    from mocodad_tpu.parallel import shard_batch
    mesh = make_mesh(4)
    with pytest.raises(ValueError, match='divisible'):
        shard_batch({'data': np.zeros((6, 2, 6, 17), np.float32)}, mesh)
    out = shard_batch({'data': np.zeros((8, 2, 6, 17), np.float32)}, mesh)
    assert out['data'].shape == (8, 2, 6, 17)

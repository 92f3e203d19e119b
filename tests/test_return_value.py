"""model_return_value 'pose'/'all' through the inference/export/replay path
(ref `_pack_out_data`, models/mocodad.py:606-636; predict_MoCoDAD.py:31-36).

The reference saves pose predictions into the tensor cache when configured;
its 'all' pack breaks its own 5-field unpack (utils/model_utils.py:110-137)
and a replayed 'pose' cache would be scored as if it held losses.  The
framework packs poses correctly and keeps the loss route alongside so
replay scoring stays valid — asserted here end-to-end.
"""

import os

import jax
import numpy as np
import pytest

from mocodad_tpu.config import Config
from mocodad_tpu.data import build_dataset, synthetic
from mocodad_tpu.eval.harness import post_processing_from_config
from mocodad_tpu.parallel import make_mesh
from mocodad_tpu.training.loop import Trainer
from mocodad_tpu.utils.tensors import (load_tensors, pack_prediction_tensors,
                                       save_tensors)


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp('rv')
    synthetic.generate(str(d), seed=5, n_clips_per_split=1, n_actors=2,
                       n_frames=40)
    return str(d)


def _cfg(synth, tmp_path, **kw):
    base = dict(
        split='test', data_dir=synth, exp_dir=str(tmp_path),
        ckpt_dir=str(tmp_path), dataset_choice='UBnormal', seg_len=6,
        conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
        conditioning_architecture='AE', channels=[32, 16, 32],
        embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.0,
        noise_steps=10, batch_size=64, num_coords=2, num_transform=1,
        seg_stride=1, n_generated_samples=2, aggregation_strategy='best',
        model_return_value='loss', vid_res=[640, 360],
        normalization_strategy='robust', use_hr=False, validation=False,
        seed=7, filter_kernel_size=4, frames_shift=3, pad_size=-1,
        test_path=os.path.join(synth, 'testing', 'test_frame_mask'),
        gt_path=os.path.join(synth, 'testing', 'test_frame_mask'))
    base.update(kw)
    return Config(**base)


def test_pose_and_all_return_values_roundtrip(synth, tmp_path):
    cfg = _cfg(synth, tmp_path, model_return_value='pose')
    build_dataset(cfg, 'train')  # fits + saves the robust scaler
    ds = build_dataset(cfg, 'test')
    trainer = Trainer(cfg, mesh=make_mesh(8))
    variables = trainer.model.init_variables(jax.random.key(1))

    res = trainer.run_inference(ds, variables, jax.random.key(2))
    n = len(ds)
    m = trainer.model
    assert res['loss'].shape == (n,)
    assert res['pose'].shape == (n, m.num_coords, m.n_frames_corrupt,
                                 m.n_joints)

    from mocodad_tpu.data import transformed_gt_data
    gt = transformed_gt_data(ds.data, ds.num_transform)
    assert gt.shape[0] == n

    # -- 'pose': prediction is pose-shaped; 'loss' rides along ----------
    tensors = pack_prediction_tensors(res, 'pose', gt_data=gt)
    assert tensors['prediction'].shape == res['pose'].shape
    assert np.array_equal(tensors['loss'], res['loss'])
    save_tensors(tensors, cfg.ckpt_dir, cfg.split,
                 cfg.aggregation_strategy, cfg.n_generated_samples)
    t = load_tensors(cfg.ckpt_dir, cfg.split, cfg.aggregation_strategy,
                     cfg.n_generated_samples)
    assert t['prediction'].ndim == 4

    # replay scoring must reproduce the direct loss-route AUC exactly —
    # through the REAL eval CLI load_tensors branch (eval_MoCoDAD.main),
    # not a test-local mirror of its loss-preference fallback
    direct = post_processing_from_config(res['loss'], res['trans'],
                                         res['meta'], res['frames'], cfg)

    import dataclasses
    import sys

    import yaml
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import eval_MoCoDAD

    raw = {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)
           if f.name not in ('extras', 'pose_path')}
    raw.update(load_tensors=True, dir_name='replay',
               create_experiment_dir=True, validation=False)
    replay_dir = os.path.join(str(tmp_path), 'UBnormal', 'replay')
    os.makedirs(replay_dir, exist_ok=True)
    save_tensors(tensors, replay_dir, cfg.split,
                 cfg.aggregation_strategy, cfg.n_generated_samples)
    ypath = os.path.join(str(tmp_path), 'replay.yaml')
    with open(ypath, 'w') as f:
        yaml.safe_dump(raw, f)
    argv, sys.argv = sys.argv, ['eval_MoCoDAD.py', '--config', ypath]
    try:
        replay = eval_MoCoDAD.main()
    finally:
        sys.argv = argv
    assert replay == pytest.approx(direct, abs=1e-12)

    # -- 'all': prediction stays the loss vector; pose is separate -------
    tensors_all = pack_prediction_tensors(res, 'all', gt_data=gt)
    assert np.array_equal(tensors_all['prediction'], res['loss'])
    assert np.array_equal(tensors_all['pose'], res['pose'])

    # -- 'loss': the reference 5-tensor contract, no extras --------------
    tensors_loss = pack_prediction_tensors(res, 'loss', gt_data=gt)
    assert set(tensors_loss) == {'prediction', 'gt_data', 'trans',
                                 'metadata', 'frames'}


def test_pose_with_loss_only_aggregation_rejected(synth, tmp_path):
    cfg = _cfg(synth, tmp_path, model_return_value='pose',
               aggregation_strategy='mean')
    build_dataset(cfg, 'train')
    ds = build_dataset(cfg, 'test')
    trainer = Trainer(cfg, mesh=make_mesh(8))
    variables = trainer.model.init_variables(jax.random.key(1))
    with pytest.raises(ValueError, match='loss-only'):
        trainer.run_inference(ds, variables, jax.random.key(2))


def test_fast_profile_export_replay_naming(synth, tmp_path):
    """`eval_profile: fast` caps the model's sample count below
    cfg.n_generated_samples; the export cache directory must be named
    with the EFFECTIVE count and the eval CLI's replay branch must
    resolve the same directory (both sides go through
    effective_n_generated_samples), reproducing the direct AUC."""
    import dataclasses
    import sys

    import yaml

    from mocodad_tpu.config import effective_n_generated_samples
    from mocodad_tpu.training.loop import export_prediction_tensors
    from mocodad_tpu.utils.tensors import tensors_dir

    cfg = _cfg(synth, tmp_path, n_generated_samples=4)
    cfg.extras.update(eval_profile='fast', fast_profile_samples=2)
    assert effective_n_generated_samples(cfg) == 2
    build_dataset(cfg, 'train')  # fits + saves the robust scaler
    ds = build_dataset(cfg, 'test')
    trainer = Trainer(cfg, mesh=make_mesh(1))
    assert trainer.model.n_generated_samples == 2
    variables = trainer.model.init_variables(jax.random.key(1))
    res = trainer.run_inference(ds, variables, jax.random.key(2))
    direct = post_processing_from_config(res['loss'], res['trans'],
                                         res['meta'], res['frames'], cfg)

    d = export_prediction_tensors(trainer, ds, res, cfg)
    assert d == tensors_dir(cfg.ckpt_dir, cfg.split,
                            cfg.aggregation_strategy, 2)
    assert not os.path.isdir(tensors_dir(
        cfg.ckpt_dir, cfg.split, cfg.aggregation_strategy, 4))

    # the unmodified eval CLI, given the same YAML (eval_profile rides
    # in as an unknown key -> extras), must find the capped-count cache
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import eval_MoCoDAD
    raw = {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)
           if f.name not in ('extras', 'pose_path')}
    raw.update(load_tensors=True, dir_name='fastreplay',
               create_experiment_dir=True, validation=False,
               eval_profile='fast', fast_profile_samples=2)
    replay_dir = os.path.join(str(tmp_path), 'UBnormal', 'fastreplay')
    os.makedirs(replay_dir, exist_ok=True)
    import shutil
    shutil.copytree(d, tensors_dir(replay_dir, cfg.split,
                                   cfg.aggregation_strategy, 2))
    ypath = os.path.join(str(tmp_path), 'fastreplay.yaml')
    with open(ypath, 'w') as f:
        yaml.safe_dump(raw, f)
    argv, sys.argv = sys.argv, ['eval_MoCoDAD.py', '--config', ypath]
    try:
        replay = eval_MoCoDAD.main()
    finally:
        sys.argv = argv
    assert replay == pytest.approx(direct, abs=1e-12)


def test_selects_pose_matches_aggregate_contract():
    from mocodad_tpu.models.losses import selects_pose
    assert selects_pose('best') and selects_pose('worst')
    assert selects_pose('mean_pose') and selects_pose('median_pose')
    assert selects_pose('all') and selects_pose('random')
    assert not selects_pose('mean')
    assert not selects_pose('median')
    assert not selects_pose('quantile:0.9')


def test_save_tensors_clears_stale_side_files(tmp_path):
    """A leftover loss.npy from a 'pose' run must not survive a later
    'loss' run into the same cache dir (replay prefers 'loss')."""
    base = {'prediction': np.ones(4), 'gt_data': np.ones(2),
            'trans': np.zeros(4), 'metadata': np.zeros((4, 4)),
            'frames': np.zeros((4, 6))}
    d = save_tensors({**base, 'loss': np.full(4, 7.0)}, str(tmp_path),
                     'test', 'best', 5)
    assert os.path.exists(os.path.join(d, 'loss.npy'))
    save_tensors(base, str(tmp_path), 'test', 'best', 5)
    assert not os.path.exists(os.path.join(d, 'loss.npy'))
    assert os.path.exists(os.path.join(d, 'prediction.npy'))


def test_loss_route_eval_works_with_loss_only_aggregation(synth, tmp_path):
    """model_return_value 'pose' + a loss-only aggregation must still
    support an AUC-only eval (with_pose=False); only a pose request
    (with_pose=True) errors."""
    cfg = _cfg(synth, tmp_path, aggregation_strategy='mean',
               model_return_value='pose')
    trainer = Trainer(cfg, mesh=make_mesh(1))
    build_dataset(cfg, 'train')  # fits + saves the robust scaler
    ds = build_dataset(cfg, split='test')
    variables = trainer.model.init_variables(jax.random.key(0))
    res = trainer.run_inference(ds, variables, jax.random.key(1),
                                with_pose=False)
    assert res['loss'].shape[0] == len(ds) and res['pose'] is None
    with pytest.raises(ValueError, match='loss-only'):
        trainer.run_inference(ds, variables, jax.random.key(1),
                              with_pose=True)


def test_eval_pool_mode_matches_host_batches(synth, tmp_path):
    """run_inference with the device-resident pool (index-only batches)
    must produce identical outputs to host batches: same fold_in keys,
    identical gathered data/affine views (num_transform virtualization),
    same meta/frames/trans packing — on both the loss and pose routes."""
    cfg = _cfg(synth, tmp_path, num_transform=2, model_return_value='pose')
    build_dataset(cfg, 'train')
    ds = build_dataset(cfg, 'test')
    trainer = Trainer(cfg, mesh=make_mesh(2))
    variables = trainer.model.init_variables(jax.random.key(3))

    cfg.extras['device_data'] = False
    host = trainer.run_inference(ds, variables, jax.random.key(4))
    cfg.extras['device_data'] = True
    pool = trainer.run_inference(ds, variables, jax.random.key(4))

    np.testing.assert_allclose(host['loss'], pool['loss'],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(host['pose'], pool['pose'],
                               rtol=1e-6, atol=1e-6)
    for k in ('trans', 'meta', 'frames'):
        np.testing.assert_array_equal(host[k], pool[k])

    # the device pool is cached per host buffer: a second run must not
    # re-upload, and the cache must evict when the dataset changes
    key = id(ds.data)
    dev = trainer._eval_pools[key][1]
    trainer.run_inference(ds, variables, jax.random.key(4))
    assert trainer._eval_pools[key][1] is dev
    # ... and actually evict when a different dataset comes through:
    # the single-entry cache bounds HBM at one pool
    ds2 = build_dataset(cfg, 'test')     # fresh build -> new host buffer
    assert ds2.data is not ds.data
    trainer.run_inference(ds2, variables, jax.random.key(4))
    assert set(trainer._eval_pools) == {id(ds2.data)}, 'stale pool retained'


def test_latent_pretrain_eval_ignores_aggregation(synth, tmp_path):
    """Stage 'pretrain' forces model_return_value 'pose' and its generate
    returns the reconstruction regardless of the aggregation strategy —
    a loss-only aggregation (e.g. 'mean') must not be rejected by the
    selects_pose guard (the reference evaluates this config fine)."""
    cfg = _cfg(synth, tmp_path, diffusion_on_latent=True, stage='pretrain',
               latent_embedding_dim=32, hidden_sizes=[32, 64, 32],
               aggregation_strategy='mean')
    build_dataset(cfg, 'train')
    ds = build_dataset(cfg, 'test')
    trainer = Trainer(cfg, mesh=make_mesh(8))
    variables = trainer.model.init_variables(jax.random.key(1))
    res = trainer.run_inference(ds, variables, jax.random.key(2))
    m = trainer.model
    assert res['pose'].shape == (len(ds), m.num_coords,
                                 m.n_frames_corrupt, m.n_joints)
    assert np.isfinite(res['loss']).all()

"""Latent-variant end-to-end: pretrain stage -> checkpoint -> frozen-encoder
diffusion stage, on the synthetic dataset (CPU mesh)."""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mocodad_tpu.config import Config
from mocodad_tpu.data import build_dataset, synthetic
from mocodad_tpu.eval.harness import post_processing_from_config
from mocodad_tpu.parallel import make_mesh
from mocodad_tpu.training.loop import Trainer, monitored_metric_for


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp('latent_e2e')
    synthetic.generate(str(d), seed=5, n_clips_per_split=2, n_actors=2,
                       n_frames=70)
    return str(d)


def _cfg(synth, tmp_path, stage):
    return Config(
        split='train', data_dir=synth, exp_dir=str(tmp_path),
        ckpt_dir=str(tmp_path), dataset_choice='UBnormal', seg_len=6,
        diffusion_on_latent=True, stage=stage,
        latent_embedding_dim=32, hidden_sizes=[32, 64, 32],
        conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
        conditioning_architecture='AE', channels=[16, 8, 16],
        embedding_dim=16, h_dim=16, latent_dim=16, dropout=0.0,
        noise_steps=10, opt_lr=1e-3, batch_size=256, num_coords=2,
        num_transform=1, seg_stride=1, n_generated_samples=2,
        aggregation_strategy='best', vid_res=[640, 360],
        normalization_strategy='robust', use_hr=False, validation=False,
        seed=4, filter_kernel_size=4, frames_shift=3, pad_size=-1,
        pretrained_model_ckpt_path=os.path.join(str(tmp_path), 'last.ckpt'),
        test_path=os.path.join(synth, 'testing', 'test_frame_mask'),
        gt_path=os.path.join(synth, 'testing', 'test_frame_mask'))


def test_latent_two_stage_train_and_eval(synth, tmp_path):
    mesh = make_mesh(8)

    # ---- stage 1: pretrain (reconstruction) ----
    cfg = _cfg(synth, tmp_path, 'pretrain')
    assert monitored_metric_for(cfg) == ('pretrain_rec_loss', 'min')
    train_ds = build_dataset(cfg, 'train')
    trainer = Trainer(cfg, mesh=mesh)
    state = trainer.fit(train_ds, n_epochs=2)
    assert os.path.exists(os.path.join(cfg.ckpt_dir, 'last.ckpt'))
    # pretrain validation metric is a reconstruction loss
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    m = trainer.validation_metric(train_ds, variables, jax.random.key(0))
    assert 'pretrain_rec_loss' in m and np.isfinite(m['pretrain_rec_loss'])

    # ---- stage 2: diffusion over the frozen latent space ----
    cfg2 = _cfg(synth, tmp_path, 'diffusion')
    trainer2 = Trainer(cfg2, mesh=mesh)
    # snapshot the stage-2 init BEFORE fit: fit overwrites last.ckpt (the
    # shared ckpt_dir), after which init_state would re-load the TRAINED
    # stage-2 weights via _load_pretrained_into and "init" == "post"
    import flax.serialization as ser
    from mocodad_tpu.data import num_batches
    init2 = trainer2.init_state(
        steps_per_epoch=num_batches(train_ds, cfg2.batch_size),
        rng=jax.random.key(cfg2.seed))
    init_denoiser = jax.device_get(
        ser.to_state_dict(init2.params)['denoiser'])
    state2 = trainer2.fit(train_ds, n_epochs=2)

    # frozen subtrees must equal the pretrain weights where paths match
    pre = ser.to_state_dict(state.params)
    post = ser.to_state_dict(state2.params)

    def leaves(d, prefix=()):
        if isinstance(d, dict):
            for k, v in d.items():
                yield from leaves(v, prefix + (k,))
        else:
            yield prefix, d

    pre_map = dict(leaves(pre))
    compared = 0
    for path, val in leaves(post):
        if path[0] == 'denoiser':
            continue
        src = pre_map.get(path)
        if src is not None and np.shape(src) == np.shape(val):
            assert np.allclose(np.asarray(src), np.asarray(val)), \
                f'frozen param {path} changed'
            compared += 1
    assert compared > 0, 'no frozen leaves overlapped the pretrain state'
    # and the denoiser itself must have MOVED from its (deterministic,
    # same-seed) init — existence alone would also pass with a broken
    # trainable mask that freezes everything
    init_map = dict(leaves(init_denoiser))
    moved = [path for path, val in leaves(post)
             if path[0] == 'denoiser'
             and not np.allclose(np.asarray(init_map[path[1:]]),
                                 np.asarray(val))]
    assert moved, 'denoiser params did not move from init'

    # ---- eval produces a valid AUC on the test split ----
    test_ds = build_dataset(cfg2, 'test')
    variables2 = {'params': state2.params, 'batch_stats': state2.batch_stats}
    out, trans, meta, frames = trainer2.evaluate(test_ds, variables2,
                                                 jax.random.key(1))
    cfg2.split = 'test'
    auc = post_processing_from_config(out, trans, meta, frames, cfg2)
    assert 0.0 <= auc <= 1.0

"""Shared scaffolding for the synthetic-operating-point AUC studies
(study_frontier.py, study_views.py): the flagship study config, atomic
JSON resume files, and train-or-reload of per-operating-point params.
One implementation so a fix to the resume/cache logic lands on every
study at once (the studies themselves differ only in the grid they
sweep)."""
import json
import os
import time


def build_cfg(data_dir, ckpt_dir, **kw):
    """Flagship train config over a synthetic dataset tree.  Studies
    override what they sweep (e.g. num_transform)."""
    from mocodad_tpu.config import Config
    base = dict(
        split='train', data_dir=data_dir, exp_dir=ckpt_dir,
        ckpt_dir=ckpt_dir, dataset_choice='UBnormal', seg_len=6,
        conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
        conditioning_architecture='AE', channels=[32, 16, 32],
        embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.0,
        noise_steps=10, opt_lr=1e-3, batch_size=2048, num_coords=2,
        num_transform=2, seg_stride=1, n_generated_samples=5,
        aggregation_strategy='best', model_return_value='loss',
        vid_res=[640, 360], normalization_strategy='robust',
        use_hr=False, validation=False, seed=11,
        filter_kernel_size=5, frames_shift=2, pad_size=-1,
        test_path=os.path.join(data_dir, 'testing', 'test_frame_mask'),
        gt_path=os.path.join(data_dir, 'testing', 'test_frame_mask'))
    base.update(kw)
    return Config(**base)


def load_results(path):
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def save_results(path, res):
    tmp = path + '.tmp'
    with open(tmp, 'w') as f:
        json.dump(res, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def get_variables(root, op_name, strength, params_name,
                  cfg_overrides=None):
    """Train (or reload from `{ckpt_dir}/{params_name}`) the flagship
    model for one operating point.  Returns (cfg, variables)."""
    import jax
    from mocodad_tpu.data import build_dataset, synthetic
    from mocodad_tpu.training.loop import Trainer

    data_dir = os.path.join(root, f'data_{op_name}')
    ckpt_dir = os.path.join(root, f'ckpt_{op_name}')
    if not os.path.exists(os.path.join(data_dir, 'training')):
        synthetic.generate(data_dir, seed=3, n_clips_per_split=4,
                           n_actors=4, n_frames=300,
                           anomaly_strength=strength)
    os.makedirs(ckpt_dir, exist_ok=True)
    cfg = build_cfg(data_dir, ckpt_dir, **(cfg_overrides or {}))

    params_npz = os.path.join(ckpt_dir, params_name)
    train_ds = build_dataset(cfg, 'train')
    trainer = Trainer(cfg)
    if os.path.exists(params_npz):
        import pickle
        with open(params_npz, 'rb') as f:
            variables = pickle.load(f)
        print(f'[{op_name}] reloaded trained params', flush=True)
    else:
        t0 = time.perf_counter()
        state = trainer.fit(train_ds, n_epochs=12)
        variables = {'params': jax.device_get(state.params),
                     'batch_stats': jax.device_get(state.batch_stats)}
        import pickle
        with open(params_npz, 'wb') as f:
            pickle.dump(variables, f)
        print(f'[{op_name}] trained in {time.perf_counter() - t0:.0f}s '
              f'({train_ds.num_samples} train windows x '
              f'{cfg.num_transform} views)', flush=True)
    return cfg, variables

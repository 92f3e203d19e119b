"""Run inference and export the prediction tensors for later replay (CLI
counterpart of the reference's predict_MoCoDAD.py: runs the model over the
split and writes prediction/gt_data/trans/metadata/frames into
saved_tensors_{split}_{aggregation}_{n_generated_samples}/)."""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser(description='MoCoDAD')
    parser.add_argument('-c', '--config', type=str, required=True)
    parser.add_argument('--n-devices', type=int, default=None)
    cli = parser.parse_args()

    from mocodad_tpu.config import load_config
    cfg = load_config(cli.config)
    cfg.save_tensors = True
    cfg.load_tensors = False

    import jax
    from mocodad_tpu.data import affine_transform_matrices, build_dataset
    from mocodad_tpu.training.checkpoint import restore_variables
    from mocodad_tpu.training.loop import Trainer
    from mocodad_tpu.utils.tensors import save_tensors

    print('Loading data and creating loaders.....')
    ds = build_dataset(cfg, split=cfg.split)
    trainer = Trainer(cfg, n_devices=cli.n_devices)
    template = trainer.model.init_variables(jax.random.key(cfg.seed))
    ckpt_path = os.path.join(cfg.ckpt_dir, cfg.load_ckpt)
    variables = restore_variables(ckpt_path, template, use_ema=cfg.use_ema)

    out, trans, meta, frames = trainer.evaluate(
        ds, variables, jax.random.key(cfg.seed))

    mats = affine_transform_matrices(max(cfg.num_transform, 1))
    blocks = []
    for k in range(max(ds.num_transform, 1)):
        m = mats[k]
        xy = np.einsum('dk,bktv->bdtv', m[:2, :2], ds.data[:, :2])
        xy += m[:2, 2][None, :, None, None]
        blocks.append(np.concatenate([xy, ds.data[:, 2:]], axis=1)
                      if ds.data.shape[1] > 2 else xy)
    gt_data = np.concatenate(blocks, axis=0)

    path = save_tensors(
        {'prediction': out, 'gt_data': gt_data, 'trans': trans,
         'metadata': meta, 'frames': frames},
        cfg.ckpt_dir, cfg.split, cfg.aggregation_strategy,
        cfg.n_generated_samples)
    print(f'saved tensors to {path}')


if __name__ == '__main__':
    main()

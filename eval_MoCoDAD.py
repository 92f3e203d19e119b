"""Evaluate a MoCoDAD checkpoint: frame-level AUC-ROC (CLI counterpart of
the reference's eval_MoCoDAD.py, including the load_tensors replay path)."""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser(description='MoCoDAD')
    parser.add_argument('-c', '--config', type=str, required=True)
    parser.add_argument('--n-devices', type=int, default=None)
    parser.add_argument('--report', action='store_true',
                        help='also write the per-clip score-analysis HTML '
                             'report (viz/report.py) next to the AUC')
    cli = parser.parse_args()

    from mocodad_tpu.config import load_config
    cfg = load_config(cli.config)

    from mocodad_tpu.eval.harness import post_processing_from_config
    from mocodad_tpu.utils.tensors import load_tensors, save_tensors

    if cfg.load_tensors:
        # Scoring-only replay of cached predictions
        # (ref: models/mocodad.py:433-448)
        t = load_tensors(cfg.ckpt_dir, cfg.split, cfg.aggregation_strategy,
                         cfg.n_generated_samples)
        auc = post_processing_from_config(
            t['prediction'], t['trans'], t['metadata'], t['frames'], cfg)
        print(f'AUC score: {auc:.6f}')
        if cli.report:
            _write_report(t['prediction'], t['trans'], t['metadata'],
                          t['frames'], cfg, auc)
        return auc

    import jax
    from mocodad_tpu.data import affine_transform_matrices, build_dataset
    from mocodad_tpu.training.checkpoint import restore_variables
    from mocodad_tpu.training.loop import Trainer

    print('Loading data and creating loaders.....')
    ds = build_dataset(cfg, split=cfg.split)
    print(f'{cfg.split} windows: {ds.num_samples} '
          f'(x{ds.num_transform} transforms)')

    trainer = Trainer(cfg, n_devices=cli.n_devices)
    template = trainer.model.init_variables(jax.random.key(cfg.seed))
    ckpt_path = os.path.join(cfg.ckpt_dir, cfg.load_ckpt)
    variables = restore_variables(ckpt_path, template, use_ema=cfg.use_ema)

    out, trans, meta, frames = trainer.evaluate(
        ds, variables, jax.random.key(cfg.seed))

    if cfg.save_tensors:
        # reconstruct the transformed input windows (the reference's
        # 'gt_data' tensor) transform-block by transform-block
        mats = affine_transform_matrices(max(cfg.num_transform, 1))
        blocks = []
        for k in range(max(ds.num_transform, 1)):
            m = mats[k]
            xy = np.einsum('dk,bktv->bdtv', m[:2, :2], ds.data[:, :2])
            xy += m[:2, 2][None, :, None, None]
            blocks.append(np.concatenate([xy, ds.data[:, 2:]], axis=1)
                          if ds.data.shape[1] > 2 else xy)
        gt_data = np.concatenate(blocks, axis=0)
        save_tensors({'prediction': out, 'gt_data': gt_data, 'trans': trans,
                      'metadata': meta, 'frames': frames},
                     cfg.ckpt_dir, cfg.split, cfg.aggregation_strategy,
                     cfg.n_generated_samples)

    auc = post_processing_from_config(out, trans, meta, frames, cfg)
    print(f'AUC score: {auc:.6f}')
    if cli.report:
        _write_report(out, trans, meta, frames, cfg, auc)
    return auc


def _write_report(out, trans, meta, frames, cfg, auc):
    from mocodad_tpu.viz import html_report
    path = os.path.join(cfg.ckpt_dir, f'report_{cfg.split}.html')
    html_report(out, trans, meta, frames, cfg.gt_path, path,
                frames_shift=cfg.frames_shift,
                kernel_size=cfg.filter_kernel_size, auc=auc)
    print(f'report written to {path}')


if __name__ == '__main__':
    main()

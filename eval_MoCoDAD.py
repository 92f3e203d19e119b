"""Evaluate a MoCoDAD checkpoint: frame-level AUC-ROC (CLI counterpart of
the reference's eval_MoCoDAD.py, including the load_tensors replay path)."""

import argparse
import os



def main():
    parser = argparse.ArgumentParser(description='MoCoDAD')
    parser.add_argument('-c', '--config', type=str, required=True)
    parser.add_argument('--n-devices', type=int, default=None)
    parser.add_argument('--report', action='store_true',
                        help='also write the per-clip score-analysis HTML '
                             'report (viz/report.py) next to the AUC')
    from mocodad_tpu.config import (add_eval_profile_arg,
                                    apply_eval_profile, load_config)
    add_eval_profile_arg(parser)
    cli = parser.parse_args()
    cfg = load_config(cli.config)
    apply_eval_profile(cfg, cli.eval_profile)

    from mocodad_tpu.eval.harness import post_processing_from_config
    from mocodad_tpu.utils.tensors import load_tensors

    if cfg.load_tensors:
        # Scoring-only replay of cached predictions
        # (ref: models/mocodad.py:433-448).  Caches written under
        # model_return_value 'pose'/'all' carry the loss route in a
        # separate 'loss' tensor (see pack_prediction_tensors) — prefer it
        # so scoring stays correct regardless of what 'prediction' holds.
        from mocodad_tpu.config import effective_n_generated_samples
        t = load_tensors(cfg.ckpt_dir, cfg.split, cfg.aggregation_strategy,
                         effective_n_generated_samples(cfg))
        pred = t.get('loss', t['prediction'])
        auc = post_processing_from_config(
            pred, t['trans'], t['metadata'], t['frames'], cfg)
        print(f'AUC score: {auc:.6f}')
        if cli.report:
            _write_report(pred, t['trans'], t['metadata'],
                          t['frames'], cfg, auc)
        return auc

    # multi-host eval: form the global runtime before any backend init so
    # Trainer.run_inference's cross-process gather branch is reachable
    from mocodad_tpu.parallel import maybe_initialize
    maybe_initialize()

    # on-disk compiled-program cache: repeat evals skip the multi-minute
    # XLA compile of the sampling chain (utils/runtime.py)
    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    from mocodad_tpu.training.loop import (export_prediction_tensors,
                                           restore_and_infer)

    # Selected poses are only needed when they get saved; an AUC-only
    # eval always uses the loss route (and works with every aggregation).
    # with_pose=None lets run_inference derive it from model_return_value.
    trainer, ds, res = restore_and_infer(
        cfg, n_devices=cli.n_devices,
        with_pose=None if cfg.save_tensors else False)
    out, trans, meta, frames = (res['loss'], res['trans'], res['meta'],
                                res['frames'])

    if cfg.save_tensors:
        export_prediction_tensors(trainer, ds, res, cfg)

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

"""Run inference and export the prediction tensors for later replay (CLI
counterpart of the reference's predict_MoCoDAD.py: runs the model over the
split and writes prediction/gt_data/trans/metadata/frames into
saved_tensors_{split}_{aggregation}_{n_generated_samples}/)."""

import argparse



def main():
    parser = argparse.ArgumentParser(description='MoCoDAD')
    parser.add_argument('-c', '--config', type=str, required=True)
    parser.add_argument('--n-devices', type=int, default=None)
    from mocodad_tpu.config import (add_eval_profile_arg,
                                    apply_eval_profile, load_config)
    add_eval_profile_arg(parser)
    cli = parser.parse_args()
    cfg = load_config(cli.config)
    apply_eval_profile(cfg, cli.eval_profile)
    cfg.save_tensors = True
    cfg.load_tensors = False

    from mocodad_tpu.parallel import maybe_initialize
    maybe_initialize()

    # on-disk compiled-program cache: repeat runs skip the multi-minute
    # XLA compile of the sampling chain (utils/runtime.py)
    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    from mocodad_tpu.training.loop import (export_prediction_tensors,
                                           restore_and_infer)

    trainer, ds, res = restore_and_infer(cfg, n_devices=cli.n_devices)
    path = export_prediction_tensors(trainer, ds, res, cfg)
    print(f'saved tensors to {path}')


if __name__ == '__main__':
    main()

"""Run inference and export the prediction tensors for later replay (CLI
counterpart of the reference's predict_MoCoDAD.py: runs the model over the
split and writes prediction/gt_data/trans/metadata/frames into
saved_tensors_{split}_{aggregation}_{n_generated_samples}/)."""

import argparse
import os



def main():
    parser = argparse.ArgumentParser(description='MoCoDAD')
    parser.add_argument('-c', '--config', type=str, required=True)
    parser.add_argument('--n-devices', type=int, default=None)
    cli = parser.parse_args()

    from mocodad_tpu.config import load_config
    cfg = load_config(cli.config)
    cfg.save_tensors = True
    cfg.load_tensors = False

    from mocodad_tpu.parallel import maybe_initialize
    maybe_initialize()

    # on-disk compiled-program cache: repeat runs skip the multi-minute
    # XLA compile of the sampling chain (utils/runtime.py)
    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    import jax
    from mocodad_tpu.data import build_dataset, transformed_gt_data
    from mocodad_tpu.training.checkpoint import restore_variables
    from mocodad_tpu.training.loop import Trainer
    from mocodad_tpu.utils.tensors import (pack_prediction_tensors,
                                           save_tensors)

    print('Loading data and creating loaders.....')
    ds = build_dataset(cfg, split=cfg.split)
    trainer = Trainer(cfg, n_devices=cli.n_devices)
    template = trainer.model.init_variables(jax.random.key(cfg.seed))
    ckpt_path = os.path.join(cfg.ckpt_dir, cfg.load_ckpt)
    variables = restore_variables(ckpt_path, template, use_ema=cfg.use_ema)

    res = trainer.run_inference(ds, variables, jax.random.key(cfg.seed))
    tensors = pack_prediction_tensors(
        res, trainer.model.model_return_value,
        gt_data=transformed_gt_data(ds.data, ds.num_transform))
    path = save_tensors(tensors, cfg.ckpt_dir, cfg.split,
                        cfg.aggregation_strategy, cfg.n_generated_samples)
    print(f'saved tensors to {path}')


if __name__ == '__main__':
    main()

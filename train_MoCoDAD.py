"""Train a MoCoDAD model (CLI counterpart of the reference's
train_MoCoDAD.py: same --config flag, same YAML contract, same monitored
metrics; Lightning/DDP replaced by the pjit data-parallel Trainer)."""

import argparse
import random

import numpy as np


def main():
    parser = argparse.ArgumentParser(description='Pose_AD_Experiment')
    parser.add_argument('-c', '--config', type=str, required=True)
    parser.add_argument('--n-devices', type=int, default=None,
                        help='mesh size (defaults to all visible devices)')
    parser.add_argument('--resume', nargs='?', const='auto', default=None,
                        help="resume training from a checkpoint "
                             "(bare flag = ckpt_dir/last.ckpt)")
    cli = parser.parse_args()

    # multi-host (DCN): must come before any JAX backend init; no-op unless
    # a coordinator is configured (MOCODAD_COORDINATOR / pod launcher envs)
    from mocodad_tpu.parallel import maybe_initialize
    maybe_initialize()

    # on-disk compiled-program cache: re-runs/resumes skip the multi-minute
    # XLA compile of the train/eval steps (utils/runtime.py)
    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    from mocodad_tpu.config import load_config
    cfg = load_config(cli.config)

    random.seed(cfg.seed)
    np.random.seed(cfg.seed)

    from mocodad_tpu.data import build_dataset
    from mocodad_tpu.training.loop import Trainer, monitored_metric_for

    monitor, mode = monitored_metric_for(cfg)
    print(f'checkpointing on {monitor} ({mode})')

    train_ds = build_dataset(cfg, split=cfg.split)
    val_ds = build_dataset(cfg, split='validation') if cfg.validation else None
    print(f'train windows: {train_ds.num_samples} '
          f'(x{train_ds.num_transform} transforms)')

    trainer = Trainer(cfg, n_devices=cli.n_devices)
    trainer.fit(train_ds, val_ds, resume=cli.resume)
    print(f'done; checkpoints in {cfg.ckpt_dir}')


if __name__ == '__main__':
    main()

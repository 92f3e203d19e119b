"""Checkpoint converter: native (flax msgpack) <-> reference (torch) format.

The reference ecosystem publishes Lightning checkpoints and its CLIs
consume them via `ckpt_path` (ref eval_MoCoDAD.py:32-38); this framework's
`restore_variables` already auto-detects and loads those on the fly.  This
CLI materializes the conversion in either direction so checkpoints can be
handed between the two stacks as plain files:

  to-torch   native .ckpt (TrainState msgpack written by training/loop.py)
             -> Lightning-shaped `{'state_dict': ...}` torch file whose
             keys match the reference module attribute names
             (model.* / condition_encoder.* / denoiser.*), loadable by the
             reference's `MoCoDAD.load_state_dict` / `trainer.test(ckpt_path=...)`.

  to-flax    reference .ckpt/.pt -> `{'params', 'batch_stats'}` msgpack
             that `restore_variables` / `load_ckpt` consume natively
             (strict conversion: unmapped or missing keys are an error,
             unlike the eval CLI's warn-and-continue auto-detection).

Usage:
  python tools/convert_checkpoint.py to-torch --config <yaml> \
      --ckpt checkpoints/.../best_weights.ckpt --out model_ref.ckpt
  python tools/convert_checkpoint.py to-flax --config <yaml> \
      --ckpt published_reference.ckpt --out checkpoints/.../imported.ckpt

The --config YAML must describe the model architecture the checkpoint was
trained with (the same file used to train/eval it); it is loaded without
side effects (no experiment directories are created).
"""

import argparse
import os
import sys

# invoked as `python tools/convert_checkpoint.py`, sys.path[0] is tools/ —
# make the repo root importable without touching PYTHONPATH (which breaks
# the axon TPU plugin discovery)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def convert(cfg, direction: str, ckpt: str, out: str,
            use_ema: bool = False) -> int:
    """Run one conversion; returns the number of tensors written."""
    import jax
    import numpy as np

    from mocodad_tpu.models import build_model
    from mocodad_tpu.training.checkpoint import (is_torch_checkpoint,
                                                 restore_variables,
                                                 save_checkpoint)

    model = build_model(cfg)
    template = jax.device_get(model.init_variables(jax.random.key(cfg.seed)))

    if direction == 'to-torch':
        from mocodad_tpu.utils.torch_compat import export_torch_state_dict
        import torch

        # native or (already-)torch input both restore through the same
        # auto-detecting path the eval CLI uses
        variables = restore_variables(ckpt, template, use_ema=use_ema)
        sd = export_torch_state_dict(jax.device_get(variables))
        torch.save({'state_dict': {k: torch.from_numpy(np.array(v, copy=True))
                                   for k, v in sd.items()}}, out)
        return len(sd)

    if not is_torch_checkpoint(ckpt):
        raise SystemExit(f'{ckpt!r} is not a torch checkpoint; '
                         'to-flax expects a reference .ckpt/.pt file')
    from mocodad_tpu.utils.torch_compat import load_torch_checkpoint
    variables = load_torch_checkpoint(ckpt, template, strict=True,
                                      use_ema=use_ema)
    save_checkpoint(out, jax.device_get(variables))
    return sum(1 for _ in jax.tree_util.tree_leaves(variables))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('direction', choices=['to-torch', 'to-flax'])
    p.add_argument('-c', '--config', required=True,
                   help='model YAML (architecture must match the checkpoint)')
    p.add_argument('--ckpt', required=True, help='input checkpoint path')
    p.add_argument('--out', required=True, help='output path')
    p.add_argument('--use-ema', action='store_true',
                   help='convert the EMA shadow weights instead of the raw '
                        'ones (warns and falls back when the input has none)')
    args = p.parse_args(argv)

    from mocodad_tpu.config import load_config
    cfg = load_config(args.config, finalize=False)

    n = convert(cfg, args.direction, args.ckpt, args.out,
                use_ema=args.use_ema)
    print(f'wrote {args.direction.split("-")[1]} checkpoint '
          f'({n} tensors) to {args.out}')


if __name__ == '__main__':
    main()

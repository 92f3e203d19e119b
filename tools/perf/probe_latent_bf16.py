"""Latent-variant mixed-precision A/B (round-4 extension of the bf16
training study to MoCoDADLatentModel, both stages).

Same timing protocol as the base study: bench.build_training_runner
(B=2048, device pool, K=8 steps/dispatch), every (stage, dtype) cell
interleaved per round in ONE process (dispatch-bound numbers may only
be compared within an interleaved run — PERF_NOTES rule).  Results
transcribed into PERF_NOTES.md ("bf16 training study").
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))

import numpy as np

BATCH = 2048
ROUNDS = 4
ITERS = 4


PRETRAIN_CKPT = '/tmp/latent_bf16_probe_pretrain.ckpt'


def latent_cfg(stage, dtype):
    from mocodad_tpu.config import flagship_config
    cfg = flagship_config(batch_size=BATCH, num_transform=5,
                          conditioning_strategy='inject',
                          conditioning_indices=[0, 1, 2],
                          stage=stage, latent_embedding_dim=64,
                          hidden_sizes=[64, 128, 128, 64])
    cfg.extras['diffusion_on_latent'] = True
    if stage == 'diffusion':
        cfg.pretrained_model_ckpt_path = PRETRAIN_CKPT
    if dtype == 'bf16':
        cfg.extras['train_dtype'] = 'bfloat16'
    return cfg


def write_pretrain_ckpt():
    """The diffusion stage transfers encoder weights from a pretrain
    checkpoint; an INIT of the pretrain net suffices for timing."""
    import jax
    from mocodad_tpu.models import MoCoDADLatentModel
    from mocodad_tpu.training.checkpoint import save_checkpoint
    m = MoCoDADLatentModel(latent_cfg('pretrain', 'f32'))
    v = m.init_variables(jax.random.key(7))
    save_checkpoint(PRETRAIN_CKPT,
                    {'params': jax.device_get(v['params']),
                     'batch_stats': jax.device_get(
                         v.get('batch_stats', {}))})


def main():
    import bench
    from mocodad_tpu.models import MoCoDADLatentModel
    assert bench.BATCH == BATCH
    write_pretrain_ckpt()

    runners = {}
    for stage in ('pretrain', 'diffusion'):
        for dtype in ('f32', 'bf16'):
            cfg = latent_cfg(stage, dtype)
            runners[(stage, dtype)] = bench.build_training_runner(
                cfg, MoCoDADLatentModel(cfg), k=8)
            print(f'{stage}/{dtype}: compiled', flush=True)

    acc = {cell: [] for cell in runners}
    for i in range(ROUNDS):
        for cell, run in runners.items():
            acc[cell].append(run(ITERS))
        print(f'round {i}: ' + '  '.join(
            f'{s}/{d} {acc[(s, d)][-1]:,.0f}' for s, d in runners),
            flush=True)
    for stage in ('pretrain', 'diffusion'):
        m32 = float(np.median(acc[(stage, 'f32')]))
        m16 = float(np.median(acc[(stage, 'bf16')]))
        print(f'{stage}: f32 {m32:,.0f} w/s, bf16 {m16:,.0f} w/s '
              f'({(m16 / m32 - 1) * 100:+.1f}%)', flush=True)


if __name__ == '__main__':
    main()

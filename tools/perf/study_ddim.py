"""AUC + throughput study: DDIM sampler (framework extension) vs the
reference DDPM chain.

The eval pipeline is denoise-chain-bound (~96% of time, PERF_NOTES.md),
so a K-step DDIM chain should cost ~K/9 of the 9-step DDPM chain.  The
question is how much AUC the shorter deterministic chain gives up.
Protocol mirrors the antithetic study: train the flagship model on the
noise-floor synthetic dataset (anomaly_strength 0.008), then evaluate
frame AUC for {ddpm-9, ddim-9/5/3/2 (eta=0)} x 3 sampling seeds x
{best, mean} aggregation, S=50, bf16 fast path.  Then time generate()
at bench settings (B=2048, S=50) for each sampler plan.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))

import jax
import numpy as np

DATA = '/tmp/anti_study/data'   # shared with study_antithetic.py
CKPT = '/tmp/ddim_study/ckpt'

PLANS = [('ddpm', None), ('ddim', 9), ('ddim', 5), ('ddim', 3), ('ddim', 2)]


def build_cfg(**kw):
    from mocodad_tpu.config import Config
    base = dict(
        split='train', data_dir=DATA, exp_dir=CKPT, ckpt_dir=CKPT,
        dataset_choice='UBnormal', seg_len=6,
        conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
        conditioning_architecture='AE', channels=[32, 16, 32],
        embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.0,
        noise_steps=10, opt_lr=1e-3, batch_size=2048, num_coords=2,
        num_transform=2, seg_stride=1, n_generated_samples=5,
        aggregation_strategy='best', model_return_value='loss',
        vid_res=[640, 360], normalization_strategy='robust',
        use_hr=False, validation=False, seed=11,
        filter_kernel_size=5, frames_shift=2, pad_size=-1,
        test_path=os.path.join(DATA, 'testing', 'test_frame_mask'),
        gt_path=os.path.join(DATA, 'testing', 'test_frame_mask'))
    base.update(kw)
    return Config(**base)


def study_auc(cfg, test_ds, variables):
    from mocodad_tpu.config import from_dict
    from mocodad_tpu.eval.harness import post_processing_from_config
    from mocodad_tpu.models import MoCoDADModel
    from mocodad_tpu.training.loop import Trainer

    for aggr in ('best', 'mean'):
        for sampler, k in PLANS:
            aucs = []
            for seed in range(3):
                raw = cfg.to_dict()
                raw.update(n_generated_samples=50,
                           aggregation_strategy=aggr, split='test')
                c2 = from_dict(raw)
                c2.extras.update(eval_dtype='bfloat16', fast_eval=True)
                if sampler == 'ddim':
                    c2.extras.update(sampler='ddim', ddim_steps=k)
                ev = Trainer(c2, MoCoDADModel(c2))
                out, trans, meta, frames = ev.evaluate(
                    test_ds, variables, jax.random.key(1000 + seed))
                aucs.append(post_processing_from_config(
                    out, trans, meta, frames, c2))
            name = f'{sampler}-{k or 9}'
            print(f'{aggr:4s} {name:7s} S=50: '
                  + ' '.join(f'{a:.4f}' for a in aucs)
                  + f'  (mean {np.mean(aucs):.4f} '
                    f'spread {np.max(aucs) - np.min(aucs):.4f})',
                  flush=True)


def study_throughput(cfg, variables):
    """Bench-protocol timing (B=2048, S=50, bf16 + tuned options)."""
    from mocodad_tpu.config import from_dict
    from mocodad_tpu.models import MoCoDADModel
    from mocodad_tpu.ops.xla_tuning import tuned_compiler_options

    batch = 2048
    data = jax.random.normal(jax.random.key(1), (batch, 2, 6, 17))
    for sampler, k in PLANS:
        raw = cfg.to_dict()
        raw.update(n_generated_samples=50, batch_size=batch)
        c2 = from_dict(raw)
        c2.extras.update(eval_dtype='bfloat16', fast_eval=True)
        if sampler == 'ddim':
            c2.extras.update(sampler='ddim', ddim_steps=k)
        model = MoCoDADModel(c2)
        fn = jax.jit(lambda v, d, r: model.generate(v, d, r),
                     compiler_options=tuned_compiler_options())
        for i in range(2):
            np.asarray(fn(variables, data, jax.random.key(i))[1])
        t0 = time.perf_counter()
        last = None
        iters = 5
        for i in range(iters):
            last = fn(variables, data, jax.random.key(100 + i))[1]
        np.asarray(last)  # host-fetch fence (PERF_NOTES measurement rule)
        dt = (time.perf_counter() - t0) / iters
        print(f'{sampler}-{k or 9}: {batch / dt:,.0f} w/s '
              f'({dt * 1e3:.1f} ms/batch)', flush=True)


def main():
    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache(os.environ['JAX_COMPILATION_CACHE_DIR'])
    from mocodad_tpu.data import build_dataset, synthetic
    from mocodad_tpu.training.loop import Trainer

    if not os.path.exists(os.path.join(DATA, 'training')):
        synthetic.generate(DATA, seed=3, n_clips_per_split=4, n_actors=4,
                           n_frames=300, anomaly_strength=0.008)
    os.makedirs(CKPT, exist_ok=True)

    cfg = build_cfg()
    train_ds = build_dataset(cfg, 'train')
    test_ds = build_dataset(cfg, 'test')
    print(f'train {train_ds.num_samples} windows, '
          f'test {test_ds.num_samples}', flush=True)

    trainer = Trainer(cfg)
    t0 = time.perf_counter()
    state = trainer.fit(train_ds, n_epochs=12)
    print(f'trained in {time.perf_counter() - t0:.0f}s', flush=True)
    variables = {'params': state.params, 'batch_stats': state.batch_stats}

    study_auc(cfg, test_ds, variables)
    study_throughput(cfg, variables)


if __name__ == '__main__':
    main()

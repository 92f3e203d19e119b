"""AUC study: antithetic sampling vs independent sampling at reduced
sample counts.

Question: do mirrored noise pairs (antithetic: true) let fewer generated
samples match the AUC of more independent ones?  Protocol mirrors the
bf16 eval-dtype study (PERF_NOTES.md): train the flagship model on the
noise-floor synthetic dataset (anomaly_strength 0.008 — mid-range AUC so
effects are visible), then evaluate frame AUC for
{independent, antithetic} x S in {50, 26, 10} x 3 sampling seeds,
aggregation 'best' and 'mean'.
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

DATA = '/tmp/anti_study/data'
CKPT = '/tmp/anti_study/ckpt'


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


def main():
    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache(os.environ['JAX_COMPILATION_CACHE_DIR'])
    from mocodad_tpu.data import build_dataset, synthetic
    from mocodad_tpu.eval.harness import post_processing_from_config
    from mocodad_tpu.models import MoCoDADModel
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

    results = {}
    for aggr in ('best', 'mean'):
        for anti in (False, True):
            for s in (50, 26, 10):
                aucs = []
                for seed in range(3):
                    raw = cfg.to_dict()
                    raw.update(n_generated_samples=s,
                               aggregation_strategy=aggr, split='test')
                    from mocodad_tpu.config import from_dict
                    c2 = from_dict(raw)
                    c2.extras['eval_dtype'] = 'bfloat16'
                    c2.extras['fast_eval'] = True
                    if anti:
                        c2.extras['antithetic'] = True
                    ev = Trainer(c2, MoCoDADModel(c2))
                    out, trans, meta, frames = ev.evaluate(
                        test_ds, variables, jax.random.key(1000 + seed))
                    auc = post_processing_from_config(out, trans, meta,
                                                      frames, c2)
                    aucs.append(auc)
                key = (aggr, 'anti' if anti else 'ind', s)
                results[key] = aucs
                print(f'{aggr:4s} {"anti" if anti else "ind ":4s} S={s:2d}: '
                      + ' '.join(f'{a:.4f}' for a in aucs)
                      + f'  (mean {np.mean(aucs):.4f} '
                        f'spread {np.max(aucs) - np.min(aucs):.4f})',
                      flush=True)
    return results


if __name__ == '__main__':
    main()

"""Mixed-precision training study (`train_dtype: bfloat16`, opt-in).

Two questions, answered on the real chip:

A. Throughput — steady-state training windows/s at bench settings
   (B=2048, device-resident pool, K=8 steps/dispatch), f32 vs bf16
   compute, interleaved A/B over several rounds (tunnel RTT swings
   dispatch-bound numbers, so paired rounds beat one-shot timings).

B. Quality — full short trainings on the synthetic dataset (same data,
   seeds, epochs) in f32 and bf16; compare per-epoch loss trajectories
   and the final validation AUC across seeds.  Master params, grads,
   optimizer state, BN running stats, the diffusion noising math, and
   the loss reduction stay f32 in both arms (models/mocodad.py loss);
   only the net's forward/backward dtype differs.

Results transcribed into PERF_NOTES.md ("bf16 training study").
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))

import jax
import numpy as np

BATCH = 2048
K = int(os.environ.get('K', '8'))
ROUNDS = 4
ITERS = 4


def _throughput(cfg, k):
    """Shared timing protocol: bench.build_training_runner (one
    implementation of pool/fence/formula — a past copy of it read a
    mutable module-global K at call time, which silently made every
    'K sweep' cell measure the last-assigned K).  `k` is bound at build
    time, per runner."""
    from mocodad_tpu.models import MoCoDADModel

    import bench
    assert bench.BATCH == BATCH
    return bench.build_training_runner(cfg, MoCoDADModel(cfg), k=k)


def throughput_ab():
    from mocodad_tpu.config import flagship_config

    cfg32 = flagship_config(batch_size=BATCH, num_transform=5)
    cfg16 = flagship_config(batch_size=BATCH, num_transform=5)
    cfg16.extras['train_dtype'] = 'bfloat16'
    r32, r16 = _throughput(cfg32, K), _throughput(cfg16, K)
    w32, w16 = [], []
    for i in range(ROUNDS):
        w32.append(r32(ITERS))
        w16.append(r16(ITERS))
        print(f'round {i}: f32 {w32[-1]:,.0f} w/s, bf16 {w16[-1]:,.0f} w/s',
              flush=True)
    m32, m16 = float(np.median(w32)), float(np.median(w16))
    print(f'throughput median-of-{ROUNDS}: f32 {m32:,.0f} w/s, '
          f'bf16 {m16:,.0f} w/s ({m16 / m32 - 1:+.1%})', flush=True)


def k_sweep(ks=(8, 16, 32)):
    """Interleaved K (steps/dispatch) sweep for both dtypes in ONE
    process: cross-run K comparisons are confounded by tunnel RTT (the
    very thing K amortizes), so every (K, dtype) cell runs once per
    round, rotating.  Each runner binds its own k at build time."""
    from mocodad_tpu.config import flagship_config

    runners = {}
    for k in ks:
        cfg32 = flagship_config(batch_size=BATCH, num_transform=5)
        cfg16 = flagship_config(batch_size=BATCH, num_transform=5)
        cfg16.extras['train_dtype'] = 'bfloat16'
        runners[(k, 'f32')] = _throughput(cfg32, k)
        runners[(k, 'bf16')] = _throughput(cfg16, k)
        print(f'K={k}: compiled both dtypes', flush=True)
    acc = {cell: [] for cell in runners}
    for i in range(ROUNDS):
        for cell, run in runners.items():
            acc[cell].append(run(ITERS))
    for k in ks:
        m32 = float(np.median(acc[(k, 'f32')]))
        m16 = float(np.median(acc[(k, 'bf16')]))
        print(f'K={k}: f32 {m32:,.0f} w/s, bf16 {m16:,.0f} w/s '
              f'(median of {ROUNDS} interleaved rounds)', flush=True)


def quality(seeds=(7, 8, 9), n_epochs=6):
    from mocodad_tpu.config import Config
    from mocodad_tpu.data import build_dataset, synthetic
    from mocodad_tpu.eval.harness import post_processing_from_config
    from mocodad_tpu.training.loop import Trainer

    droot = '/tmp/bf16_study/data'
    if not os.path.exists(os.path.join(droot, 'training')):
        synthetic.generate(droot, seed=11, n_clips_per_split=3,
                           n_actors=3, n_frames=96,
                           anomaly_strength=0.02)
    gt = os.path.join(droot, 'testing', 'test_frame_mask')

    def run(seed, dtype):
        eroot = f'/tmp/bf16_study/ckpt_{dtype}_{seed}'
        import shutil
        shutil.rmtree(eroot, ignore_errors=True)
        os.makedirs(eroot, exist_ok=True)
        cfg = Config(
            split='test', data_dir=droot, exp_dir=eroot, ckpt_dir=eroot,
            dataset_choice='UBnormal', seg_len=6,
            conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
            conditioning_architecture='AE', channels=[32, 16, 32],
            embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.0,
            noise_steps=10, opt_lr=1e-3, batch_size=512, num_coords=2,
            num_transform=2, seg_stride=1, n_generated_samples=5,
            aggregation_strategy='best', model_return_value='loss',
            vid_res=[640, 360], normalization_strategy='robust',
            use_hr=False, validation=False, seed=seed,
            filter_kernel_size=4, frames_shift=3, pad_size=-1,
            test_path=gt, gt_path=gt)
        if dtype == 'bf16':
            cfg.extras['train_dtype'] = 'bfloat16'
        train_ds = build_dataset(cfg, 'train')
        test_ds = build_dataset(cfg, 'test')
        trainer = Trainer(cfg)
        state = trainer.fit(train_ds, n_epochs=n_epochs)
        variables = {'params': state.params,
                     'batch_stats': state.batch_stats}
        res = trainer.run_inference(test_ds, variables,
                                    jax.random.key(seed), with_pose=False)
        auc = post_processing_from_config(res['loss'], res['trans'],
                                          res['meta'], res['frames'], cfg)
        return float(auc)

    rows = []
    for seed in seeds:
        a32 = run(seed, 'f32')
        a16 = run(seed, 'bf16')
        rows.append((seed, a32, a16))
        print(f'seed {seed}: AUC f32 {a32:.4f}, bf16 {a16:.4f} '
              f'(delta {a16 - a32:+.4f})', flush=True)
    d = [r[2] - r[1] for r in rows]
    print(f'AUC delta mean {np.mean(d):+.4f}, spread '
          f'[{min(d):+.4f}, {max(d):+.4f}] over {len(rows)} seeds',
          flush=True)


if __name__ == '__main__':
    if 'quality' in sys.argv:
        quality()
    elif 'ksweep' in sys.argv:
        k_sweep()
    else:
        throughput_ab()

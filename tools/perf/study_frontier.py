"""Fast-eval frontier: composed sampler x antithetic x sample-count grid.

Round-3 measured two levers in isolation: the DDIM short chain (K=2:
21.4k w/s at ~the ddpm AUC, one operating point) and antithetic
sampling (recovers most of the S=10 degradation).  This study composes
them — the grid the round-3 verdict asked for:

    sampler {ddpm-9, ddim-3, ddim-2}
  x sampling {independent, antithetic}
  x S {50, 26, 10}
  x aggregation {best, mean}
  x 3 sampling seeds
  x 4 synthetic operating points (anomaly_strength spanning the model's
    noise floor to clearly separable: 0.008 / 0.012 / 0.02 / 0.05)

plus a throughput grid (sampler x sampling x S) at bench settings
(B=2048, bf16 + tuned compiler options).  The ddpm-9 x independent x
S=50 cell is the reference protocol
(/root/reference/config/UBnormal/mocodad_test.yaml:54,68; chain
/root/reference/models/mocodad.py:160-180); every other cell is a
documented protocol extension.

Results accumulate in RESULTS (JSON) so an interrupted run resumes
without redoing finished cells; models are checkpointed per operating
point the same way.  Summary table prints at the end and is transcribed
into PERF_NOTES.md ("Fast-eval frontier").
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))

import jax
import numpy as np

ROOT = '/tmp/frontier_study'
RESULTS = os.path.join(ROOT, 'results.json')

OPERATING_POINTS = [('floor', 0.008), ('mid', 0.012), ('easy', 0.02),
                    ('sep', 0.05)]
SAMPLERS = [('ddpm', 9), ('ddim', 3), ('ddim', 2)]
S_LIST = [50, 26, 10]
AGGRS = ['best', 'mean']
N_SEEDS = 3


from _study_common import load_results as _load  # noqa: E402
from _study_common import get_variables as _get_variables  # noqa: E402
from _study_common import save_results as _save  # noqa: E402


def load_results():
    return _load(RESULTS)


def save_results(res):
    _save(RESULTS, res)


def get_variables(op_name, strength):
    """Train (or reload) the flagship model for one operating point."""
    from mocodad_tpu.data import build_dataset
    cfg, variables = _get_variables(ROOT, op_name, strength,
                                    'frontier_params.npz')
    return cfg, build_dataset(cfg, 'test'), variables


def auc_grid(op_name, cfg, test_ds, variables, res):
    from mocodad_tpu.config import from_dict
    from mocodad_tpu.eval.harness import post_processing_from_config
    from mocodad_tpu.models import MoCoDADModel
    from mocodad_tpu.training.loop import Trainer

    for sampler, k in SAMPLERS:
        for anti in (False, True):
            for s in S_LIST:
                for aggr in AGGRS:
                    key = f'auc/{op_name}/{sampler}-{k}/' \
                          f'{"anti" if anti else "ind"}/S{s}/{aggr}'
                    if key in res:
                        continue
                    aucs = []
                    for seed in range(N_SEEDS):
                        raw = cfg.to_dict()
                        raw.update(n_generated_samples=s,
                                   aggregation_strategy=aggr,
                                   split='test')
                        c2 = from_dict(raw)
                        c2.extras.update(eval_dtype='bfloat16',
                                         fast_eval=True)
                        if sampler == 'ddim':
                            c2.extras.update(sampler='ddim', ddim_steps=k)
                        if anti:
                            c2.extras['antithetic'] = True
                        ev = Trainer(c2, MoCoDADModel(c2))
                        out, trans, meta, frames = ev.evaluate(
                            test_ds, variables, jax.random.key(1000 + seed))
                        aucs.append(float(post_processing_from_config(
                            out, trans, meta, frames, c2)))
                    res[key] = aucs
                    save_results(res)
                    print(f'{key}: '
                          + ' '.join(f'{a:.4f}' for a in aucs)
                          + f'  (mean {np.mean(aucs):.4f} spread '
                            f'{np.max(aucs) - np.min(aucs):.4f})',
                          flush=True)


def throughput_grid(cfg, variables, res):
    """Bench-protocol timing per frontier point (B=2048, bf16+tuned).

    Operating point is irrelevant to throughput — one model's params
    serve all timing cells."""
    from mocodad_tpu.config import from_dict
    from mocodad_tpu.models import MoCoDADModel
    from mocodad_tpu.ops.xla_tuning import tuned_compiler_options

    batch = 2048
    data = jax.random.normal(jax.random.key(1), (batch, 2, 6, 17))
    for sampler, k in SAMPLERS:
        for anti in (False, True):
            for s in S_LIST:
                key = f'wps/{sampler}-{k}/' \
                      f'{"anti" if anti else "ind"}/S{s}'
                if key in res:
                    continue
                raw = cfg.to_dict()
                raw.update(n_generated_samples=s, batch_size=batch)
                c2 = from_dict(raw)
                c2.extras.update(eval_dtype='bfloat16', fast_eval=True)
                if sampler == 'ddim':
                    c2.extras.update(sampler='ddim', ddim_steps=k)
                if anti:
                    c2.extras['antithetic'] = True
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
                np.asarray(last)  # host-fetch fence (PERF_NOTES rule)
                dt = (time.perf_counter() - t0) / iters
                res[key] = {'windows_per_sec': round(batch / dt, 1),
                            'ms_per_batch': round(dt * 1e3, 1)}
                save_results(res)
                print(f'{key}: {batch / dt:,.0f} w/s '
                      f'({dt * 1e3:.1f} ms/batch)', flush=True)


def summarize(res):
    print('\n=== frontier summary (AUC mean over seeds, per cell) ===',
          flush=True)
    for sampler, k in SAMPLERS:
        for anti in (False, True):
            for s in S_LIST:
                mode = 'anti' if anti else 'ind'
                wps = res.get(f'wps/{sampler}-{k}/{mode}/S{s}', {})
                row = [f'{sampler}-{k} {mode:4s} S={s:2d}',
                       f'{wps.get("windows_per_sec", 0):>8,.0f} w/s']
                for op_name, _ in OPERATING_POINTS:
                    for aggr in AGGRS:
                        key = f'auc/{op_name}/{sampler}-{k}/' \
                              f'{mode}/S{s}/{aggr}'
                        vals = res.get(key)
                        row.append(f'{op_name[:2]}/{aggr[0]} '
                                   f'{np.mean(vals):.4f}' if vals
                                   else f'{op_name[:2]}/{aggr[0]} ----')
                print('  '.join(row), flush=True)


def main():
    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache(os.environ['JAX_COMPILATION_CACHE_DIR'])
    os.makedirs(ROOT, exist_ok=True)
    res = load_results()

    first_cfg = None
    first_vars = None
    for op_name, strength in OPERATING_POINTS:
        cfg, test_ds, variables = get_variables(op_name, strength)
        if first_cfg is None:
            first_cfg, first_vars = cfg, variables
        auc_grid(op_name, cfg, test_ds, variables, res)

    throughput_grid(first_cfg, first_vars, res)
    summarize(res)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()

"""Fast-profile aggregation frontier: does the S cap move AUC for the
scalar aggregations the round-4 study did NOT cover?

`eval_profile: fast` caps `n_generated_samples` for EVERY aggregation
strategy (config.py effective_n_generated_samples), but the round-4
frontier study (study_frontier.py, results archived at
results/frontier_20260819.json) measured only {best, mean}.  A
10-sample `quantile:0.9` or `median` is a far coarser estimator than a
50-sample one, so the "measured AUC-free" claim had a hole for those
families.  This study closes it:

    aggregation {median, quantile:0.75, quantile:0.9,
                 mean_pose, median_pose, best, mean}
  x S {50, 26, 10}
  x 3 sampling seeds
  x the same 4 synthetic operating points and eval protocol (ddpm-9
    chain, independent sampling, bf16 + tuned) as the round-4 frontier.

best/mean are RE-MEASURED here (not merged from the round-4 archive) so
the whole table shares one set of freshly trained params; auc_grid()
produces every cell the decision table reads, and a family with no
measured (S=50, S=10) pair prints NO DATA rather than SAFE.

'random' is omitted by construction: it scores ONE uniformly-chosen
sample, so its AUC distribution is S-invariant (losses.py aggregate).
'all' is not a scalar strategy (scoring rejects it).  'worst' is
'best' under negation and shares its estimator class (an extremum),
which IS covered — by best itself and by the tail quantiles here.

Decision rule (transcribed into PERF_NOTES + enforced by the config
gate): an aggregation family is S=10-UNSAFE if |mean AUC(S=10) - mean
AUC(S=50)| > max(2 x max seed spread, 0.005) at ANY operating point —
i.e. the cap moves AUC beyond both sampling noise and a practical
floor.  Ref surface: the 9 strategies, models/mocodad.py:454-520.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))

import numpy as np

ROOT = '/tmp/frontier_study'         # share the round-4 params/datasets
RESULTS = os.path.join(ROOT, 'results_aggr.json')

OPERATING_POINTS = [('floor', 0.008), ('mid', 0.012), ('easy', 0.02),
                    ('sep', 0.05)]
AGGRS = ['median', 'quantile:0.75', 'quantile:0.9',
         'mean_pose', 'median_pose',
         # re-measured fresh (not merged from the round-4 archive) so the
         # whole table shares one set of trained params: /tmp was wiped
         # between rounds, and a fresh train need not reproduce the
         # round-4 params bit-for-bit.
         'best', 'mean']
S_LIST = [50, 26, 10]
N_SEEDS = 3

from _study_common import load_results as _load  # noqa: E402
from _study_common import get_variables as _get_variables  # noqa: E402
from _study_common import save_results as _save  # noqa: E402


def get_variables(op_name, strength):
    from mocodad_tpu.data import build_dataset
    cfg, variables = _get_variables(ROOT, op_name, strength,
                                    'frontier_params.npz')
    return cfg, build_dataset(cfg, 'test'), variables


def auc_grid(op_name, cfg, test_ds, variables, res):
    import jax

    from mocodad_tpu.config import from_dict
    from mocodad_tpu.eval.harness import post_processing_from_config
    from mocodad_tpu.models import MoCoDADModel
    from mocodad_tpu.training.loop import Trainer

    for s in S_LIST:
        for aggr in AGGRS:
            key = f'auc/{op_name}/ddpm-9/ind/S{s}/{aggr}'
            if key in res:
                continue
            aucs = []
            for seed in range(N_SEEDS):
                raw = cfg.to_dict()
                raw.update(n_generated_samples=s,
                           aggregation_strategy=aggr, split='test')
                c2 = from_dict(raw)
                c2.extras.update(eval_dtype='bfloat16', fast_eval=True)
                ev = Trainer(c2, MoCoDADModel(c2))
                out, trans, meta, frames = ev.evaluate(
                    test_ds, variables, jax.random.key(1000 + seed))
                aucs.append(float(post_processing_from_config(
                    out, trans, meta, frames, c2)))
            res[key] = aucs
            _save(RESULTS, res)
            print(f'{key}: ' + ' '.join(f'{a:.4f}' for a in aucs)
                  + f'  (mean {np.mean(aucs):.4f} spread '
                    f'{np.max(aucs) - np.min(aucs):.4f})', flush=True)


def summarize(res):
    """Per-aggregation S-cap safety table and the decision per family.

    A family is UNSAFE if ANY operating point violates ITS OWN bound
    (each op has its own seed spread) — the per-family verdict is the
    OR over ops, not the worst delta against one bound.  A family with
    no measured (S=50, S=10) pair prints NO DATA, never SAFE."""
    print('\n=== S-cap safety per aggregation (ddpm-9, independent) ===',
          flush=True)
    print(f'{"aggr":14s} {"op":6s} {"S=50":>7s} {"S=26":>7s} {"S=10":>7s}'
          f' {"d(10-50)":>9s} {"spread":>7s}', flush=True)
    verdicts = {}
    for aggr in AGGRS:
        violations, n_compared = [], 0
        for op_name, _ in OPERATING_POINTS:
            row = {}
            spread = 0.0
            for s in S_LIST:
                vals = res.get(f'auc/{op_name}/ddpm-9/ind/S{s}/{aggr}')
                if vals:
                    row[s] = float(np.mean(vals))
                    spread = max(spread, float(np.max(vals) - np.min(vals)))
            if 50 in row and 10 in row:
                n_compared += 1
                delta = row[10] - row[50]
                bound = max(2 * spread, 0.005)
                unsafe_here = abs(delta) > bound
                if unsafe_here:
                    violations.append((op_name, delta, bound))
                print(f'{aggr:14s} {op_name:6s} '
                      + ' '.join(f'{row.get(s, float("nan")):7.4f}'
                                 for s in S_LIST)
                      + f' {delta:+9.4f} {spread:7.4f}'
                      + ('  UNSAFE' if unsafe_here else ''),
                      flush=True)
        verdicts[aggr] = (violations, n_compared)
    print('\n=== verdicts (UNSAFE if any op violates its own bound) ===',
          flush=True)
    for aggr, (violations, n_compared) in verdicts.items():
        if not n_compared:
            print(f'{aggr:14s} NO DATA (no S=50/S=10 pair measured)',
                  flush=True)
        elif violations:
            worst = max(violations, key=lambda v: abs(v[1]))
            print(f'{aggr:14s} UNSAFE at {len(violations)}/{n_compared} '
                  f'ops (worst: {worst[0]} d={worst[1]:+.4f} '
                  f'bound={worst[2]:.4f})', flush=True)
        else:
            print(f'{aggr:14s} SAFE over {n_compared} ops', flush=True)


def main():
    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache(os.environ['JAX_COMPILATION_CACHE_DIR'])
    os.makedirs(ROOT, exist_ok=True)
    res = _load(RESULTS)
    for op_name, strength in OPERATING_POINTS:
        cfg, test_ds, variables = get_variables(op_name, strength)
        auc_grid(op_name, cfg, test_ds, variables, res)
    summarize(res)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()

"""Eval-time view-count (num_transform) frontier: the last unmeasured
axis of the fast-eval profile.

The reference protocol scores every window under num_transform=5 affine
views and AVERAGES the per-view frame scores before AUC
(/root/reference/models/mocodad.py:362-424 via eval_utils; here
eval/harness.py post_processing).  End-to-end eval work is therefore
windows x views x chain-cost: the round-3/4 frontier measured the chain
axes (sampler, S, antithetic) and settled on `eval_profile: fast`
(DDPM chain, S<=10, 23.1k window-views/s); this study measures the
VIEWS axis it composes with — per-view throughput is unchanged by the
view count, so views 5 -> v cuts end-to-end eval work by exactly 5/v
and the only question is the AUC cost of averaging fewer views.

Grid: models trained at the reference num_transform=5 (so every eval
view was seen in training; the affine list is a deterministic prefix,
view 0 = identity — data/transforms.py), then frame AUC at

    eval views {5, 3, 2, 1}
  x S {50, 10}            (reference count / fast-profile cap)
  x aggregation {best, mean}
  x 3 sampling seeds
  x 4 synthetic operating points (anomaly_strength 0.008-0.05)

Reference cell: views=5 x S=50.  Results accumulate in RESULTS (JSON)
for resume; summary transcribed into PERF_NOTES.md ("View-count
frontier").
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))

import jax
import numpy as np

ROOT = '/tmp/views_study'
RESULTS = os.path.join(ROOT, 'results.json')

OPERATING_POINTS = [('floor', 0.008), ('mid', 0.012), ('easy', 0.02),
                    ('sep', 0.05)]
VIEWS = [5, 3, 2, 1]
S_LIST = [50, 10]
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
    """Train (or reload) the flagship model for one operating point,
    at the reference num_transform=5."""
    return _get_variables(ROOT, op_name, strength, 'views_params.npz',
                          cfg_overrides={'num_transform': 5})


def auc_grid(op_name, cfg, variables, res):
    from mocodad_tpu.config import from_dict
    from mocodad_tpu.data import build_dataset
    from mocodad_tpu.eval.harness import post_processing_from_config
    from mocodad_tpu.models import MoCoDADModel
    from mocodad_tpu.training.loop import Trainer

    for views in VIEWS:
        # the test dataset enumerates (window x view) pairs; rebuilding
        # it with a smaller num_transform evaluates the PREFIX of the
        # reference's affine list (view 0 = identity)
        raw = cfg.to_dict()
        raw.update(num_transform=views, split='test')
        test_ds = build_dataset(from_dict(raw), 'test')
        for s in S_LIST:
            for aggr in AGGRS:
                key = f'auc/{op_name}/views{views}/S{s}/{aggr}'
                if key in res:
                    continue
                aucs = []
                for seed in range(N_SEEDS):
                    raw = cfg.to_dict()
                    raw.update(num_transform=views,
                               n_generated_samples=s,
                               aggregation_strategy=aggr,
                               split='test')
                    c2 = from_dict(raw)
                    c2.extras.update(eval_dtype='bfloat16',
                                     fast_eval=True)
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


def summarize(res):
    print('\n=== view-count frontier (AUC mean over seeds; end-to-end '
          'work factor vs reference views=5 x S=50) ===', flush=True)
    for views in VIEWS:
        for s in S_LIST:
            work = (views * s) / (5 * 50)
            row = [f'views={views} S={s:2d}  work x{work:.3f}']
            for op_name, _ in OPERATING_POINTS:
                for aggr in AGGRS:
                    vals = res.get(f'auc/{op_name}/views{views}/S{s}/{aggr}')
                    row.append(f'{op_name[:2]}/{aggr[0]} '
                               + (f'{np.mean(vals):.4f}' if vals
                                  else '----'))
            print('  '.join(row), flush=True)


def main():
    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache(os.environ['JAX_COMPILATION_CACHE_DIR'])
    os.makedirs(ROOT, exist_ok=True)
    res = load_results()
    for op_name, strength in OPERATING_POINTS:
        cfg, variables = get_variables(op_name, strength)
        auc_grid(op_name, cfg, variables, res)
    summarize(res)


if __name__ == '__main__':
    main()

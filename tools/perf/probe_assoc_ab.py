"""A/B the shipping generate() with assoc_narrowing on vs off, alternating
measurements in one process so tunnel-RTT drift cancels.  Real model path
at bench settings (bf16, fast_eval, tuned compiler options, batch 2048,
50 samples x 9 steps).  Also A/Bs tuned-vs-untuned compiler options for
the assoc form, since the tuned set was swept on the pre-assoc graph."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))

import jax
import numpy as np

from _harness import flagship_config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.ops.xla_tuning import tuned_compiler_options

BATCH = 2048


def build(assoc, tuned=True):
    cfg = flagship_config(batch_size=BATCH)
    cfg.extras['eval_dtype'] = 'bfloat16'
    cfg.extras['fast_eval'] = True
    cfg.extras['assoc_narrowing'] = assoc
    model = MoCoDADModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    opts = tuned_compiler_options() if tuned else {}
    return jax.jit(lambda d, r: model.generate(variables, d, r),
                   compiler_options=opts)


def time_one(fn, data, base, iters=5):
    last = None
    t0 = time.perf_counter()
    for i in range(iters):
        last = fn(data, jax.random.key(base + i))[1]
    np.asarray(last)
    return (time.perf_counter() - t0) / iters


if __name__ == '__main__':
    data = jax.random.normal(jax.random.key(1), (BATCH, 2, 6, 17))
    builds = [('off+tuned', build(False, True)),
              ('on+tuned', build(True, True)),
              ('on+untuned', build(True, False))]
    for name, fn in builds:
        t = time.perf_counter()
        np.asarray(fn(data, jax.random.key(0))[1])
        print(f'compile {name}: {time.perf_counter()-t:.0f}s', flush=True)
    for round_ in range(4):
        row = []
        for j, (name, fn) in enumerate(builds):
            d = time_one(fn, data, 100 + 10 * round_ + 100 * j)
            row.append(f'{name} {BATCH/d:7.0f} w/s ({d*1e3:.1f} ms)')
        print(f'round {round_}: ' + ' | '.join(row), flush=True)

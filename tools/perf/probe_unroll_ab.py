"""A/B the shipping generate() with scan_unroll 1 vs full (9), alternating
measurements in one process so tunnel-RTT drift cancels.  Uses the real
model path (bench.py settings: bf16, fast_eval, tuned compiler options,
batch 2048, 50 samples x 9 steps)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import numpy as np

from _harness import flagship_config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.ops.xla_tuning import tuned_compiler_options

BATCH = 2048


def build(unroll):
    cfg = flagship_config(batch_size=BATCH)
    cfg.extras['eval_dtype'] = 'bfloat16'
    cfg.extras['fast_eval'] = True
    cfg.extras['scan_unroll'] = unroll
    model = MoCoDADModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    fn = jax.jit(lambda d, r: model.generate(variables, d, r),
                 compiler_options=tuned_compiler_options())
    return fn


def time_one(fn, data, base, iters=5):
    last = None
    t0 = time.perf_counter()
    for i in range(iters):
        last = fn(data, jax.random.key(base + i))[1]
    np.asarray(last)
    return (time.perf_counter() - t0) / iters


if __name__ == '__main__':
    data = jax.random.normal(jax.random.key(1), (BATCH, 2, 6, 17))
    f1 = build(1)
    f9 = build(9)
    t = time.perf_counter()
    np.asarray(f1(data, jax.random.key(0))[1])
    print(f'compile unroll=1: {time.perf_counter()-t:.0f}s', flush=True)
    t = time.perf_counter()
    np.asarray(f9(data, jax.random.key(0))[1])
    print(f'compile unroll=9: {time.perf_counter()-t:.0f}s', flush=True)
    for round_ in range(3):
        d1 = time_one(f1, data, 100 + 10 * round_)
        d9 = time_one(f9, data, 200 + 10 * round_)
        print(f'round {round_}: unroll=1 {BATCH/d1:7.0f} w/s ({d1*1e3:.1f} '
              f'ms) | unroll=9 {BATCH/d9:7.0f} w/s ({d9*1e3:.1f} ms) | '
              f'delta {100*(d1-d9)/d1:+.1f}%', flush=True)

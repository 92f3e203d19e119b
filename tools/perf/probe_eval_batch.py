"""Eval batch-size sweep under the SHIPPING configuration (bf16 +
tuned compiler options) — the original sweep (1024: 3.84k, 2048: 4.12k,
4096: 4.15k w/s) predates the tuned-option win, and fusion-boundary
traffic per window can shift with the fold size."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))

import jax
import numpy as np

from _harness import flagship_config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.ops.xla_tuning import tuned_compiler_options
from mocodad_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache(os.environ['JAX_COMPILATION_CACHE_DIR'])


def run(batch):
    cfg = flagship_config(batch_size=batch)
    cfg.extras['eval_dtype'] = 'bfloat16'
    cfg.extras['fast_eval'] = True
    model = MoCoDADModel(cfg)
    variables = model.init_variables(jax.random.key(0))
    fn = jax.jit(lambda d, r: model.generate(variables, d, r),
                 compiler_options=tuned_compiler_options())
    data = jax.random.normal(jax.random.key(1), (batch, 2, 6, 17))
    np.asarray(fn(data, jax.random.key(2))[1])
    iters = max(2, 8192 // batch)
    t0 = time.perf_counter()
    last = None
    for i in range(iters):
        last = fn(data, jax.random.key(10 + i))[1]
    np.asarray(last)
    dt = (time.perf_counter() - t0) / iters
    print(f'batch {batch:5d}: {batch / dt:7.0f} w/s ({dt * 1e3:.0f} ms)',
          flush=True)


if __name__ == '__main__':
    for b in (2048, 4096, 8192):
        run(b)

"""Fast-profile batch scaling: at `eval_profile: fast` (S capped at 10)
the per-launch sample-fold shrinks from 102,400 rows (S=50 x B=2048) to
20,480 — possibly below the MXU-efficiency knee.  Measure windows/s at
window batches {2048, 4096, 8192} to see whether a larger batch recovers
it (the profile is already a documented protocol deviation; its serving
batch is an operational choice, unlike the parity headline's fixed
protocol).  Timing follows bench.py: pipelined launches, host-fetch
fence of the last loss (PERF_NOTES rule: block_until_ready once returned
without waiting on this transport)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))

import jax
import numpy as np

ITERS = 8
WARMUP = 2


def main():
    from mocodad_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache(os.environ['JAX_COMPILATION_CACHE_DIR'])
    from mocodad_tpu.config import flagship_config
    from mocodad_tpu.models import MoCoDADModel
    from mocodad_tpu.ops.xla_tuning import tuned_compiler_options

    results = {}
    for batch in (2048, 4096, 8192):
        cfg = flagship_config(noise_steps=10, n_generated_samples=50,
                              batch_size=batch)
        cfg.extras.update(eval_dtype='bfloat16', fast_eval=True,
                          eval_profile='fast')
        model = MoCoDADModel(cfg)
        assert model.n_generated_samples == 10
        variables = model.init_variables(jax.random.key(0))
        data = jax.random.normal(jax.random.key(1), (batch, 2, 6, 17))
        fn = jax.jit(lambda v, d, r: model.generate(v, d, r),
                     compiler_options=tuned_compiler_options())
        t0 = time.perf_counter()
        for i in range(WARMUP):
            np.asarray(fn(variables, data, jax.random.key(i))[1])
        print(f'B={batch}: compile+warmup '
              f'{time.perf_counter() - t0:.0f}s', flush=True)
        t0 = time.perf_counter()
        last = None
        for i in range(ITERS):
            last = fn(variables, data, jax.random.key(100 + i))[1]
        np.asarray(last)
        wps = batch / ((time.perf_counter() - t0) / ITERS)
        results[batch] = wps
        print(f'B={batch}: {wps:,.0f} windows/s '
              f'({batch * 10:,} fold rows/launch)', flush=True)

    base = results[2048]
    for batch, wps in results.items():
        print(f'B={batch}: {wps / base:.2f}x vs B=2048', flush=True)


if __name__ == '__main__':
    main()

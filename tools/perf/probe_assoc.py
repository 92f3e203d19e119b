"""Matmul-association probe for the eval fast path.

Each ST-GCNN layer computes (K @ X) @ W (graph mix then channel mix).
Matmul associativity lets layers with C_out < C_in compute K @ (X @ W)
instead — exact same algebra, but the TV^2 graph dot then runs on C_out
channels: fewer FLOPs AND a smaller fusion-boundary intermediate.  On the
flagship schedule (16,32,32,64,64,128,64) this hits d3_1 (128->64),
u4_1 (64->32) and u3_1 (32->2; the graph dot shrinks 16x) — ~14% of the
layer-dot FLOPs and the three largest intermediates.

Variants:
  shipping  : graph-first everywhere (the pre-rewrite form)
  assoc     : channel-first when C_out < C_in (the shipping default)
Parity: f32 forward of 'assoc' vs shipping, max|delta| (on TPU this reads
default-precision bf16 reassociation noise ~1e-3 relative; true-f32 CPU
parity is 1e-7).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))
import numpy as np
import jax
import jax.numpy as jnp

from _harness import build_forward, N
from mocodad_tpu.ops.fast_unet import build_fast_denoiser
from mocodad_tpu.ops.xla_tuning import tuned_compiler_options
from mocodad_tpu.config import flagship_config
from mocodad_tpu.models import MoCoDADModel


def main():
    cfg = flagship_config(n_generated_samples=50, batch_size=1024)
    model = MoCoDADModel(cfg)
    variables = jax.device_get(model.init_variables(jax.random.key(0)))
    P = variables['params']['model']
    S = variables['batch_stats']['model']

    kw = dict(c_in=2, n_frames=3, n_joints=17, embedding_dim=16,
              inject_condition=True)
    den_ship = build_fast_denoiser(P, S, channel_first_when_narrowing=False,
                                   **kw)
    den_assoc = build_fast_denoiser(P, S, channel_first_when_narrowing=True,
                                    **kw)

    # f32 parity on a small batch
    x32 = jax.random.normal(jax.random.key(3), (256, 2, 3, 17), jnp.float32)
    tb = jnp.full((256,), 5, jnp.int32)
    eb = jax.random.normal(jax.random.key(4), (256, 16)) * 0.5
    a = jax.jit(den_ship)(x32, tb, eb)
    b = jax.jit(den_assoc)(x32, tb, eb)
    print('f32 parity max|delta|:', float(jnp.max(jnp.abs(a - b))))

    dt = jnp.bfloat16
    xb = jax.random.normal(jax.random.key(5), (N, 2, 3, 17), dt)
    tbb = jnp.full((N,), 5, jnp.int32)
    ebb = (jax.random.normal(jax.random.key(6), (N, 16)) * 0.5).astype(dt)

    def scan9(den):
        def runf(x):
            def step(c, _):
                return den(c, tbb, ebb), None
            y, _ = jax.lax.scan(step, x, None, length=9)
            return y
        return runf

    opts = tuned_compiler_options()
    dotdot = {k: v for k, v in opts.items() if 'dot_dot' in k}
    vmem = {k: v for k, v in opts.items() if 'vmem' in k.lower()}
    variants = [('tuned', opts), ('untuned', {}), ('dotdot-only', dotdot),
                ('vmem-only', vmem)]
    for name, den in (('shipping', den_ship), ('assoc', den_assoc)):
        for tag, o in (variants if name == 'assoc' else variants[:2]):
            compiled = jax.jit(scan9(den)).lower(xb).compile(
                compiler_options=o)
            out = compiled(xb)
            np.asarray(out)
            t0 = time.perf_counter()
            outs = [compiled(xb) for _ in range(5)]
            np.asarray(outs[-1])
            ms = (time.perf_counter() - t0) / 5 / 9 * 1e3
            cost = compiled.cost_analysis()
            gb = cost.get('bytes accessed', 0) / 1e9 / 9
            print(f'{name:9s} {tag:8s}: {ms:6.2f} ms/forward, '
                  f'{gb:.2f} GB accessed/forward', flush=True)


if __name__ == '__main__':
    main()

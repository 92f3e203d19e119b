"""Probe round 2: optimization-effort knobs + combos on top of the
winners from probe_xla_flags.py (multilevel dot-dot fusion -3.5%,
scoped VMEM 96M -2.3%, combo 25.1 ms vs 26.0 baseline)."""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import jax
import jax.numpy as jnp

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.ops.fast_unet import build_fast_denoiser

N = 51200
cfg = Config(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
             conditioning_architecture='AE', channels=[32, 16, 32],
             embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.0,
             seg_len=6, num_coords=2, noise_steps=10,
             n_generated_samples=50, aggregation_strategy='best',
             batch_size=1024, seed=0)
model = MoCoDADModel(cfg)
variables = jax.device_get(model.init_variables(jax.random.key(0)))
P, S = variables['params']['model'], variables['batch_stats']['model']
den = build_fast_denoiser(P, S, c_in=2, n_frames=3, n_joints=17,
                          embedding_dim=16)

dt = jnp.bfloat16
xb = jax.random.normal(jax.random.key(5), (N, 2, 3, 17), dt)
tbb = jnp.full((N,), 5, jnp.int32)
eb = (jax.random.normal(jax.random.key(6), (N, 16)) * 0.5).astype(dt)


def runf(x):
    def step(c, _):
        return den(c, tbb, eb), None
    y, _ = jax.lax.scan(step, x, None, length=9)
    return y


WIN = {'xla_tpu_enable_multi_level_input_dot_dot_fusion': 'true',
       'xla_tpu_enable_multi_level_output_dot_dot_fusion': 'true',
       'xla_tpu_scoped_vmem_limit_kib': '98304'}

VARIANTS = [
    ('baseline', {}),
    ('combo_prev', dict(WIN)),
    ('exec_effort_1', {'xla_experimental_exec_time_optimization_effort':
                       '1.0'}),
    ('opt_level_3', {'xla_optimization_level': '3'}),
    ('combo+effort', {**WIN,
                      'xla_experimental_exec_time_optimization_effort':
                      '1.0'}),
    ('vmem_112m', {'xla_tpu_scoped_vmem_limit_kib': '114688'}),
    ('combo_vmem112', {**WIN, 'xla_tpu_scoped_vmem_limit_kib': '114688'}),
    ('autotune_dots', {'xla_tpu_autotune_dots': 'true',
                       'xla_tpu_autotune_fusions': 'true'}),
    ('ml_dotdot_only',
     {'xla_tpu_enable_multi_level_input_dot_dot_fusion': 'true',
      'xla_tpu_enable_multi_level_output_dot_dot_fusion': 'true'}),
]


def time_variant(opts, iters=5, k=9):
    try:
        compiled = jax.jit(runf).lower(xb).compile(compiler_options=opts)
    except Exception as e:
        return None, f'compile failed: {str(e)[:120]}'
    o = compiled(xb)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [compiled(xb) for _ in range(iters)]
    jax.block_until_ready(outs)
    return round((time.perf_counter() - t0) / iters / k * 1e3, 2), None


for name, opts in VARIANTS:
    ms, err = time_variant(opts)
    print(f'{name:26s}: {ms if ms is not None else err} ms', flush=True)

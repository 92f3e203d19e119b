"""Probe round 3: refine around the winner (multilevel dot-dot fusion +
scoped VMEM 96M = 24.1 ms vs 25.74 baseline)."""
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


ML = {'xla_tpu_enable_multi_level_input_dot_dot_fusion': 'true',
      'xla_tpu_enable_multi_level_output_dot_dot_fusion': 'true'}

VARIANTS = [
    ('winner(ml+96m)', {**ML, 'xla_tpu_scoped_vmem_limit_kib': '98304'}),
    ('ml+64m', {**ML, 'xla_tpu_scoped_vmem_limit_kib': '65536'}),
    ('ml+80m', {**ML, 'xla_tpu_scoped_vmem_limit_kib': '81920'}),
    ('winner+scavenge', {**ML, 'xla_tpu_scoped_vmem_limit_kib': '98304',
                         'xla_tpu_scavenge_vmem_for_fusions': 'true'}),
    ('winner+mof_limit', {**ML, 'xla_tpu_scoped_vmem_limit_kib': '98304',
                          'xla_tpu_multi_output_fusion_limit': '64'}),
    ('winner+nested_vmem_frac',
     {**ML, 'xla_tpu_scoped_vmem_limit_kib': '98304',
      'xla_tpu_nested_dot_fusion_vmem_fraction': '0.9'}),
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

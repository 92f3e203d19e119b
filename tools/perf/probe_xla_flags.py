"""Probe: XLA TPU compiler-option sweep over the shipping fast path.

The compiled forward is HBM-bound on fusion-boundary traffic (17.1 GB vs
a 3.4 GB minimum; PERF_NOTES.md "Roofline").  libtpu exposes fusion /
scoped-VMEM / scheduler knobs that the default pipeline keeps
conservative; this probe times one 51200-row U-Net forward (the shipping
`ops/fast_unet.py` path, bf16, scan-amortized dispatch) under each
candidate option set via `Lowered.compile(compiler_options=...)`, which
reaches the compiler even through the axon tunnel.

Flag names enumerated from `strings libtpu.so` (libtpu 0.0.34).
"""
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


VARIANTS = [
    ('baseline', {}),
    ('scoped_vmem_64m', {'xla_tpu_scoped_vmem_limit_kib': '65536'}),
    ('scoped_vmem_96m', {'xla_tpu_scoped_vmem_limit_kib': '98304'}),
    ('scavenge_vmem', {'xla_tpu_scavenge_vmem_for_fusions': 'true',
                       'xla_tpu_override_scavenge_vmem_for_fusions': 'true'}),
    ('dot_dot_fusion', {'xla_tpu_dot_dot_fusion': 'true',
                        'xla_tpu_enable_dot_dot_fusion_duplicated': 'true'}),
    ('multilevel_dot_dot',
     {'xla_tpu_enable_multi_level_input_dot_dot_fusion': 'true',
      'xla_tpu_enable_multi_level_output_dot_dot_fusion': 'true'}),
    ('nested_loop_fusion',
     {'xla_tpu_enable_multi_level_nested_loop_fusion': 'true'}),
    ('fusion_cost_model',
     {'xla_tpu_enable_experimental_fusion_cost_model': 'true'}),
    ('aggressive_loop_layout',
     {'xla_tpu_enable_aggressive_loop_fusion_layout_opt': 'true'}),
    ('rwb_fusion', {'xla_tpu_rwb_fusion': 'true'}),
    ('sched_experimental',
     {'xla_tpu_enable_all_experimental_scheduler_features': 'true'}),
    ('layout_negotiation', {'xla_tpu_allow_layout_negotiation': 'true'}),
    ('copy_fusion', {'xla_tpu_enable_copy_fusion': 'true',
                     'xla_tpu_copy_fusion_allow_split': 'true'}),
    ('exec_time_effort_1',
     {'xla_experimental_exec_time_optimization_effort': '1.0'}),
    ('opt_level_3', {'xla_optimization_level': '3'}),
]


def time_variant(opts, iters=3, k=9):
    try:
        compiled = jax.jit(runf).lower(xb).compile(compiler_options=opts)
    except Exception as e:
        return None, f'compile failed: {str(e)[:140]}'
    o = compiled(xb)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [compiled(xb) for _ in range(iters)]
    jax.block_until_ready(outs)
    return round((time.perf_counter() - t0) / iters / k * 1e3, 2), None


results = {}
for name, opts in VARIANTS:
    ms, err = time_variant(opts)
    results[name] = ms
    print(f'{name:26s}: {ms if ms is not None else err} ms', flush=True)

base = results.get('baseline')
if base:
    winners = {n: m for n, m in results.items()
               if m is not None and m < base * 0.97 and n != 'baseline'}
    if winners:
        combo = {}
        for name, opts in VARIANTS:
            if name in winners:
                combo.update(opts)
        ms, err = time_variant(combo)
        print(f'{"combo(winners)":26s}: {ms if ms is not None else err} ms',
              flush=True)
    else:
        print('no variant beat baseline by >3%', flush=True)

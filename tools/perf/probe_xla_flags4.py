"""Probe round 4: additive sweep on top of the shipped winner set
(ops/xla_tuning.py = multilevel dot-dot fusion + 96M scoped VMEM +
scavenge, 23.65 ms).  Candidates target the post-dot adds
(join_mxu_result_add), bf16 vector packing, schedulers, and DMA paths."""
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
from mocodad_tpu.ops.xla_tuning import _TPU_EVAL_OPTIONS as TUNED

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


ADD = [
    ('tuned(shipping)', {}),
    ('join_mxu_result_add', {'xla_tpu_join_mxu_result_add': 'true'}),
    ('latency_hiding_sched', {'xla_tpu_enable_latency_hiding_scheduler':
                              'true'}),
    ('ilp_lh_sched', {'xla_tpu_enable_ilp_latency_hiding_scheduler':
                      'true'}),
    ('layer_sched+overlap',
     {'xla_tpu_enable_latency_hiding_layer_scheduler': 'true',
      'xla_tpu_enable_multi_compute_overlap_in_layer_scheduler': 'true'}),
    ('bf16_slp_vectorizer', {'xla_tpu_enable_bf16_slp_vectorizer': 'true'}),
    ('packed_bf16_math', {'xla_tpu_impure_enable_packed_bf16_math_ops':
                          'true'}),
    ('pack_loads', {'xla_tpu_pack_vloads': 'true',
                    'xla_tpu_pack_cloads': 'true'}),
    ('vmem_to_vmem_dmas', {'xla_tpu_enable_vmem_to_vmem_dmas': 'true'}),
    ('rm_bf16_bitcasts', {'xla_tpu_remove_bf16_bitcast_converts_for_all':
                          'true'}),
    ('input_conv_multi_users', {'xla_tpu_input_conv_multi_users': 'true'}),
    ('pipelined_loop_unroll', {'xla_tpu_enable_pipelined_loop_unrolling':
                               'true'}),
    ('depth_mem_pressure',
     {'xla_tpu_enable_depth_memory_pressure_reduction': 'true'}),
    ('x8_producers_into_conv',
     {'xla_tpu_fuse_non_trivial_x8_producers_into_conv_like': 'true'}),
]


def time_variant(opts, iters=5, k=9):
    try:
        compiled = jax.jit(runf).lower(xb).compile(
            compiler_options={**TUNED, **opts})
    except Exception as e:
        return None, f'compile failed: {str(e)[:120]}'
    o = compiled(xb)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [compiled(xb) for _ in range(iters)]
    jax.block_until_ready(outs)
    return round((time.perf_counter() - t0) / iters / k * 1e3, 2), None


results = {}
for name, opts in ADD:
    ms, err = time_variant(opts)
    results[name] = ms
    print(f'{name:26s}: {ms if ms is not None else err} ms', flush=True)

base = results.get('tuned(shipping)')
if base:
    winners = [(n, o) for n, o in ADD[1:]
               if results.get(n) is not None and results[n] < base * 0.98]
    if winners:
        combo = {}
        for _, o in winners:
            combo.update(o)
        ms, err = time_variant(combo)
        print(f'{"combo(new winners)":26s}: '
              f'{ms if ms is not None else err} ms', flush=True)
    else:
        print('no additive flag beat the shipping set by >2%', flush=True)

"""Re-measure compiled HBM traffic of the 51200-row forward with the
shipped compiler-option set vs untuned (updates the 17.1 GB figure in
PERF_NOTES "Roofline")."""
import os
import sys
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

for name, opts in [('untuned', {}), ('tuned', dict(TUNED))]:
    compiled = jax.jit(lambda x: den(x, tbb, eb)).lower(xb).compile(
        compiler_options=opts)
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    gb = ca.get('bytes accessed', 0) / 1e9
    gf = ca.get('flops', 0) / 1e9
    print(f'{name}: {gb:.2f} GB accessed, {gf:.1f} GFLOP', flush=True)
    hlo = compiled.as_text()
    for op in ('convolution', 'fusion', 'copy'):
        import re
        n_op = len(re.findall(rf'=\s+\S+\s+{op}\(', hlo))
        print(f'  {op} ops: {n_op}', flush=True)

"""RNG levers on the full generate: threefry-in-loop (shipping) vs
precomputed-noise vs rbg keys; full-batch eval timing."""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))
import numpy as np
import jax, jax.numpy as jnp

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADModel

BATCH, S, STEPS = 2048, 50, 10
cfg = Config(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
             conditioning_architecture='AE', channels=[32, 16, 32],
             embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.0,
             seg_len=6, num_coords=2, noise_steps=STEPS,
             n_generated_samples=S, aggregation_strategy='best',
             batch_size=BATCH, seed=0)
cfg.extras['eval_dtype'] = 'bfloat16'
model = MoCoDADModel(cfg)
variables = model.init_variables(jax.random.key(0))
data = jax.random.normal(jax.random.key(1), (BATCH, 2, 6, 17))


def timeit(gen, iters=5):
    for i in range(2):
        _, l = gen(data, jax.random.key(i))
        l.block_until_ready()
    t0 = time.perf_counter()
    outs = [gen(data, jax.random.key(100 + i))[1] for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


g0 = jax.jit(lambda d, r: model.generate(variables, d, r))
dt0 = timeit(g0)
print(f'shipping threefry-in-loop: {BATCH/dt0:.0f} w/s ({dt0*1e3:.1f} ms)',
      flush=True)


# precomputed z (one big draw outside the scan, read back per step)
def gen_pre(d, r):
    r_pre, r_gen = jax.random.split(r)
    b = d.shape[0]
    shape = (S * b, model.num_coords, model.n_frames_corrupt, model.n_joints)
    x0 = jax.random.normal(r_pre, shape, jnp.bfloat16)
    zs = jax.random.normal(r_gen, (STEPS - 1,) + shape, jnp.bfloat16)
    return model.generate(variables, d, r, noise_override=(x0, zs))


g1 = jax.jit(gen_pre)
dt1 = timeit(g1)
print(f'precomputed z            : {BATCH/dt1:.0f} w/s ({dt1*1e3:.1f} ms)',
      flush=True)


# rbg keys: wrap the caller's threefry key bits into an rbg key
def gen_rbg(d, r):
    bits = jax.random.key_data(r)               # (2,) uint32
    rbg = jax.random.wrap_key_data(
        jnp.tile(bits, 2).astype(jnp.uint32), impl='rbg')
    return model.generate(variables, d, rbg)


g2 = jax.jit(gen_rbg)
dt2 = timeit(g2)
print(f'rbg keys in-loop         : {BATCH/dt2:.0f} w/s ({dt2*1e3:.1f} ms)',
      flush=True)

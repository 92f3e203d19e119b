"""Probe: do the eval-winning compiler options also help the TRAIN step?

Times the full jitted train step (affine views + loss + grad + Adam,
f32, B=2048) with and without the tuned option set from
ops/xla_tuning.py.  The eval sweep cannot be assumed to transfer: the
backward pass has a different fusion structure.
"""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.training.loop import Trainer
from mocodad_tpu.ops.xla_tuning import _TPU_EVAL_OPTIONS

B = 2048
cfg = Config(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
             conditioning_architecture='AE', channels=[32, 16, 32],
             embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.1,
             seg_len=6, num_coords=2, noise_steps=10,
             n_generated_samples=5, aggregation_strategy='best',
             batch_size=B, n_epochs=2, seed=0)
model = MoCoDADModel(cfg)
trainer = Trainer(cfg, model)
state = trainer.init_state(steps_per_epoch=10, rng=jax.random.key(0))

rs = np.random.RandomState(0)
batch = {'data': jnp.asarray(rs.randn(B, 2, 6, 17), jnp.float32),
         'trans': jnp.asarray(rs.randint(0, 5, B), jnp.int32),
         'mask': jnp.ones((B,), jnp.float32)}

step_fn = trainer._build_train_step()


def time_step(opts, iters=20):
    # step_fn is already jitted; lower the unjitted callable
    # (jax.jit exposes it as __wrapped__) to control compiler options
    inner = step_fn.__wrapped__
    compiled = jax.jit(inner, donate_argnums=(0,)).lower(
        state, batch, jax.random.key(1)).compile(compiler_options=opts)
    s = jax.device_put(jax.tree_util.tree_map(jnp.copy, state))
    out, _ = compiled(s, batch, jax.random.key(1))
    jax.block_until_ready(out.params)
    t0 = time.perf_counter()
    cur = out
    for i in range(iters):
        cur, _ = compiled(cur, batch, jax.random.key(2 + i))
    jax.block_until_ready(cur.params)
    return round((time.perf_counter() - t0) / iters * 1e3, 2)


for name, opts in [('baseline', {}), ('tuned(eval winners)',
                                      dict(_TPU_EVAL_OPTIONS))]:
    ms = time_step(opts)
    print(f'{name:22s}: {ms} ms/step  ({round(B / ms * 1000):,} w/s)',
          flush=True)

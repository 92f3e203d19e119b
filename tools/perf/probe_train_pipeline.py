"""Probe: where does training steady-state time go?

Device step alone runs ~14 ms at B=2048 (143k w/s) but epochs run at
10-18k w/s. Suspects: host batch assembly (fancy-index gather),
host->device transfer through the axon tunnel, dispatch.

Measures, at B=2048 on a 37k-window synthetic pool:
  a) host assembly per batch (make_loader body)
  b) device_put of the assembled batch (tunnel transfer)
  c) jitted train step (device)
  d) full loop: loader -> prefetch -> step (the shipping path)
  e) device-resident pool variant: pool stays in HBM, only
     (idx, trans, mask) cross the tunnel; gather happens on device
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
from mocodad_tpu.data.pipeline import PoseWindows, make_loader, num_batches
from mocodad_tpu.data.prefetch import prefetch

B = 2048
NW = 36864  # ~37k windows like the at-scale synthetic run
rs = np.random.RandomState(0)
ds = PoseWindows(
    data=rs.randn(NW, 2, 6, 17).astype(np.float32),
    meta=np.zeros((NW, 4), np.int64),
    frames=np.tile(np.arange(1, 7, dtype=np.int32), (NW, 1)),
    num_transform=5)

cfg = Config(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
             conditioning_architecture='AE', channels=[32, 16, 32],
             embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.1,
             seg_len=6, num_coords=2, noise_steps=10,
             n_generated_samples=5, aggregation_strategy='best',
             batch_size=B, n_epochs=1, seed=0)
model = MoCoDADModel(cfg)
trainer = Trainer(cfg, model)
state = trainer.init_state(steps_per_epoch=10, rng=jax.random.key(0))
step = trainer._build_train_step()

# ---- a) host assembly
t0 = time.perf_counter()
batches = list(make_loader(ds, B, shuffle=True, seed=0))
t_assemble = (time.perf_counter() - t0) / len(batches)
print(f'a) host assembly: {t_assemble*1e3:.1f} ms/batch '
      f'({len(batches)} batches)', flush=True)

# ---- b) transfer
sample = batches[0]
jax.block_until_ready(jax.device_put(sample))  # warm
t0 = time.perf_counter()
for b_ in batches[:10]:
    jax.block_until_ready(jax.device_put(b_))
t_put = (time.perf_counter() - t0) / 10
print(f'b) device_put full batch: {t_put*1e3:.1f} ms/batch', flush=True)

# ---- c) device step
dev_batch = jax.device_put(sample)
st, _ = step(state, dev_batch, jax.random.key(1))
jax.block_until_ready(st.params)
t0 = time.perf_counter()
cur = st
for i in range(10):
    cur, _ = step(cur, dev_batch, jax.random.key(i))
jax.block_until_ready(cur.params)
t_step = (time.perf_counter() - t0) / 10
print(f'c) device step: {t_step*1e3:.1f} ms/batch', flush=True)

# ---- d) shipping loop (prefetch depth 2)
state_d = trainer.init_state(steps_per_epoch=10, rng=jax.random.key(0))
t0 = time.perf_counter()
nb = 0
cur = state_d
for b_ in prefetch(make_loader(ds, B, shuffle=True, seed=1),
                   place=jax.device_put, depth=2):
    cur, _ = step(cur, b_, jax.random.key(nb))
    nb += 1
jax.block_until_ready(cur.params)
t_loop = (time.perf_counter() - t0) / nb
print(f'd) shipping loop: {t_loop*1e3:.1f} ms/batch '
      f'({B/t_loop:,.0f} w/s)', flush=True)

# ---- e) device-resident pool
pool = jax.device_put(ds.data)


def step_pool(state, pool, idx, trans, mask, rng):
    batch = {'data': pool[idx], 'trans': trans, 'mask': mask}
    return step.__wrapped__(state, batch, rng)


step_pool_j = jax.jit(step_pool, donate_argnums=(0,))
n = ds.num_samples
n_virtual = len(ds)
order = np.arange(n_virtual)
np.random.default_rng(2).shuffle(order)
idxs = [order[s:s + B] for s in range(0, n_virtual - B + 1, B)]

cur = trainer.init_state(steps_per_epoch=10, rng=jax.random.key(0))
i0 = jnp.asarray(idxs[0] % n, jnp.int32)
tr0 = jnp.asarray((idxs[0] // n), jnp.int32)
m0 = jnp.ones((B,), jnp.float32)
cur, _ = step_pool_j(cur, pool, i0, tr0, m0, jax.random.key(0))
jax.block_until_ready(cur.params)
t0 = time.perf_counter()
k = 0
for ix in idxs:
    cur, _ = step_pool_j(cur, pool, jnp.asarray(ix % n, jnp.int32),
                         jnp.asarray(ix // n, jnp.int32), m0,
                         jax.random.key(k))
    k += 1
jax.block_until_ready(cur.params)
t_pool = (time.perf_counter() - t0) / len(idxs)
print(f'e) device-resident pool loop: {t_pool*1e3:.1f} ms/batch '
      f'({B/t_pool:,.0f} w/s)', flush=True)

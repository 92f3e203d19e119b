"""Probe: K training steps per jit dispatch (lax.scan over stacked
index batches from the device-resident pool).

The pool-mode train step runs ~14 ms on-device at B=2048 but each launch
pays ~4 ms of dispatch latency through the axon tunnel
(PERF_NOTES.md measurement discipline).  Scanning over K pre-sampled
(idx, trans) batches inside one jit amortizes that to 4/K ms — the classic
small-model lever.  Keys stay identical to the shipping path because the
per-step rng is already fold_in(rng, state.step) inside the jit.
"""
import time

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from _harness import flagship_config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.training.loop import Trainer

BATCH = 2048
POOL_N = 36864


def main():
    cfg = flagship_config(batch_size=BATCH)
    model = MoCoDADModel(cfg)
    trainer = Trainer(cfg, model)
    state = trainer.init_state(steps_per_epoch=10, rng=jax.random.key(0))
    step1 = trainer._build_train_step(pool_mode=True)

    rs = np.random.RandomState(0)
    pool = jax.device_put(rs.randn(POOL_N, 2, 6, 17).astype(np.float32))
    rng = jax.random.key(0)

    def batches(k):
        idx = rs.randint(0, POOL_N * cfg.num_transform, (k, BATCH))
        return {'idx': jnp.asarray(idx % POOL_N, jnp.int32),
                'trans': jnp.asarray(idx // POOL_N, jnp.int32),
                'mask': jnp.ones((k, BATCH), jnp.float32)}

    def fence(state):
        np.asarray(jax.tree_util.tree_leaves(state.params)[0])

    # ---- shipping: one step per dispatch --------------------------------
    b1 = {k: v[0] for k, v in batches(1).items()}
    state1, _ = step1(state, pool, b1, rng)
    fence(state1)
    iters = 30
    bs = [{k: v[0] for k, v in batches(1).items()} for _ in range(iters)]
    s = state1
    t0 = time.perf_counter()
    for i in range(iters):
        s, _ = step1(s, pool, bs[i], rng)
    fence(s)
    per1 = (time.perf_counter() - t0) / iters
    print(f'1 step/dispatch : {per1 * 1e3:.2f} ms/step '
          f'({BATCH / per1:.0f} w/s)', flush=True)
    state = s  # the original `state` was donated into the first step

    # ---- K steps per dispatch via lax.scan ------------------------------
    for K in (4, 8, 16):
        def multi(state, pool, kb, rng):
            def body(st, b):
                st, m = step1.__wrapped__(st, pool, b, rng)
                return st, m['loss_noise']
            return jax.lax.scan(body, state, kb)

        multi_j = jax.jit(multi, donate_argnums=(0,))
        kb = batches(K)
        st, _ = multi_j(state, pool, kb, rng)
        fence(st)
        n = max(1, 32 // K)
        kbs = [batches(K) for _ in range(n)]
        s = st
        t0 = time.perf_counter()
        for i in range(n):
            s, _ = multi_j(s, pool, kbs[i], rng)
        fence(s)
        per = (time.perf_counter() - t0) / (n * K)
        print(f'{K:2d} steps/dispatch: {per * 1e3:.2f} ms/step '
              f'({BATCH / per:.0f} w/s)', flush=True)
        state = s  # donated chains: carry the live state forward


if __name__ == '__main__':
    main()

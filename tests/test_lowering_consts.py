"""Guard: jitted train/eval steps must not capture device-resident
constants.

Embedding a captured device array into the MLIR module fetches it back
to host during lowering; on a remote-device transport that costs ~20 s
PER ARRAY on every cold process, even when the compiled executable is
cache-hit (measured: 4 tiny tables = 82 s of lowering; PERF_NOTES.md
"End-to-end eval wall time").  Constant tables (diffusion schedule,
static frame orders, affine matrices) must stay host-side numpy.
"""

import jax
import numpy as np
import pytest

from mocodad_tpu.parallel import make_mesh
from mocodad_tpu.training.loop import Trainer


def _flagship_cfg(**kw):
    from mocodad_tpu.config import flagship_config
    base = dict(n_generated_samples=3, batch_size=16, num_transform=2,
                use_ema=True)
    base.update(kw)
    return flagship_config(**base)


def _device_consts(closed_jaxpr):
    return [(c.shape, str(c.dtype)) for c in closed_jaxpr.consts
            if isinstance(c, jax.Array)]


@pytest.fixture(scope='module')
def trainer():
    return Trainer(_flagship_cfg(), mesh=make_mesh(1))


def _shapes(trainer, pool_mode):
    cfg = trainer.cfg
    b = cfg.batch_size
    key = jax.random.key(0)
    rng = jax.ShapeDtypeStruct(key.shape, key.dtype)
    if pool_mode:
        batch = {'idx': jax.ShapeDtypeStruct((b,), np.int32),
                 'trans': jax.ShapeDtypeStruct((b,), np.int32),
                 'mask': jax.ShapeDtypeStruct((b,), np.float32)}
        pool = jax.ShapeDtypeStruct((64, 2, 6, 17), np.float32)
        return pool, batch, rng
    batch = {'data': jax.ShapeDtypeStruct((b, 2, 6, 17), np.float32),
             'trans': jax.ShapeDtypeStruct((b,), np.int32),
             'mask': jax.ShapeDtypeStruct((b,), np.float32)}
    return None, batch, rng


@pytest.mark.parametrize('pool_mode', [False, True])
def test_eval_step_has_no_device_consts(trainer, pool_mode):
    variables = trainer.model.init_variables(jax.random.key(0))
    mv = {'params': variables['params'],
          'batch_stats': variables.get('batch_stats', {})}
    step = trainer._build_eval_step(with_pose=False, pool_mode=pool_mode)
    pool, batch, rng = _shapes(trainer, pool_mode)
    eb = {'idx': batch['idx'], 'trans': batch['trans']} if pool_mode else \
         {'data': batch['data'], 'trans': batch['trans']}
    traced = (step.trace(mv, pool, eb, rng, 0) if pool_mode
              else step.trace(mv, eb, rng, 0))
    assert _device_consts(traced.jaxpr) == []


@pytest.mark.parametrize('pool_mode', [False, True])
def test_train_step_has_no_device_consts(trainer, pool_mode):
    trainer._opt, _ = trainer.make_optimizer(steps_per_epoch=4)
    state = trainer.init_state(steps_per_epoch=4, rng=jax.random.key(0))
    step = trainer._build_train_step(pool_mode=pool_mode)
    pool, batch, rng = _shapes(trainer, pool_mode)
    traced = (step.trace(state, pool, batch, rng) if pool_mode
              else step.trace(state, batch, rng))
    assert _device_consts(traced.jaxpr) == []

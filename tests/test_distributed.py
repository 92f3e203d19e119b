"""Multi-host (DCN) glue: run a real 2-process CPU mesh via
jax.distributed and drive one data-parallel train step through the same
code path a TPU pod would use (parallel/distributed.py).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow

_WORKER = r'''
import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=2')
sys.path.insert(0, os.environ['MOCODAD_REPO'])
from mocodad_tpu.parallel import maybe_initialize
assert maybe_initialize(), 'coordinator env vars not picked up'

import jax
jax.config.update('jax_platforms', 'cpu')
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # 2 procs x 2 local devices

import numpy as np
from mocodad_tpu.config import Config
from mocodad_tpu.parallel import make_mesh, shard_batch
from mocodad_tpu.training.loop import Trainer

cfg = Config(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
             conditioning_architecture='AE', channels=[8, 4, 8],
             embedding_dim=8, h_dim=8, latent_dim=8, dropout=0.0,
             seg_len=6, num_coords=2, noise_steps=5, n_generated_samples=2,
             aggregation_strategy='best', batch_size=32, num_transform=1,
             opt_lr=1e-3, seed=0, ckpt_dir='/tmp/dist_test')

mesh = make_mesh()  # all 4 global devices
trainer = Trainer(cfg, mesh=mesh)
trainer._opt, _ = trainer.make_optimizer(steps_per_epoch=1)
rng = jax.random.key(0)
state = trainer.init_state(steps_per_epoch=1, rng=rng)
step = trainer._build_train_step()

rs = np.random.default_rng(0)  # same seed on every process -> same batch
batch = {
    'data': rs.normal(size=(cfg.batch_size, 2, 6, 17)).astype(np.float32),
    'trans': np.zeros(cfg.batch_size, np.int32),
    'meta': np.zeros((cfg.batch_size, 4), np.int64),
    'frames': np.tile(np.arange(1, 7, dtype=np.int32), (cfg.batch_size, 1)),
    'mask': np.ones(cfg.batch_size, np.float32),
}
sharded = shard_batch(batch, mesh)
state, metrics = step(state, sharded, rng)
print(f'DIST_LOSS {float(metrics["loss"]):.8f}', flush=True)

# and the evaluation path: per-window losses gathered onto every host
from mocodad_tpu.data.pipeline import PoseWindows
ds = PoseWindows(data=batch['data'], meta=batch['meta'],
                 frames=batch['frames'], num_transform=1)
out, trans, meta2, frames2 = trainer.evaluate(
    ds, {'params': state.params, 'batch_stats': state.batch_stats}, rng)
assert out.shape == (cfg.batch_size,), out.shape
import numpy as _np
assert _np.all(_np.isfinite(out))
print(f'DIST_EVAL {float(out.mean()):.8f}', flush=True)

# pose route: selected poses are likewise gathered onto every host
res = trainer.run_inference(
    ds, {'params': state.params, 'batch_stats': state.batch_stats}, rng,
    with_pose=True)
assert res['pose'].shape == (cfg.batch_size, 2, 3, 17), res['pose'].shape
assert _np.all(_np.isfinite(res['pose']))
print(f'DIST_POSE {float(_np.abs(res["pose"]).mean()):.8f}', flush=True)
'''


def test_two_process_cpu_mesh(tmp_path):
    port = socket.socket()
    port.bind(('localhost', 0))
    addr = f'localhost:{port.getsockname()[1]}'
    port.close()

    worker = tmp_path / 'worker.py'
    worker.write_text(_WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   MOCODAD_COORDINATOR=addr,
                   MOCODAD_NUM_PROCESSES='2',
                   MOCODAD_PROCESS_ID=str(pid),
                   MOCODAD_REPO=REPO,
                   JAX_PLATFORMS='cpu')
        env.pop('PYTHONPATH', None)
        procs.append(subprocess.Popen(
            [sys.executable, '-u', str(worker)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=780)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'worker failed:\n{out}'

    losses, evals, poses = [], [], []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith('DIST_LOSS')]
        elines = [l for l in out.splitlines() if l.startswith('DIST_EVAL')]
        plines = [l for l in out.splitlines() if l.startswith('DIST_POSE')]
        assert lines and elines and plines, out
        losses.append(float(lines[0].split()[1]))
        evals.append(float(elines[0].split()[1]))
        poses.append(float(plines[0].split()[1]))
    # the data-parallel psum makes the loss identical on both hosts, and
    # the eval/pose allgathers give every host the same full vectors
    assert abs(losses[0] - losses[1]) < 1e-7, losses
    assert abs(evals[0] - evals[1]) < 1e-7, evals
    assert abs(poses[0] - poses[1]) < 1e-7, poses

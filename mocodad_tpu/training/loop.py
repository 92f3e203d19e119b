"""Training / evaluation driver: the framework's replacement for the
reference's PyTorch-Lightning Trainer (train_MoCoDAD.py:70-75).

Owns what Lightning owned there: epoch loops, device placement (pjit-style
data sharding over a mesh instead of DDP/NCCL), metric logging with the
reference's metric names, monitored-metric checkpointing (top-2), EMA, and
the validation-AUC epoch hook.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Any, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from mocodad_tpu.config import Config
from mocodad_tpu.data import (affine_transform_matrices,
                              apply_affine_batch, make_loader, num_batches)
from mocodad_tpu.data.prefetch import prefetch
from mocodad_tpu.data.pipeline import PoseWindows
from mocodad_tpu.eval.harness import post_processing_from_config
from mocodad_tpu.models import build_model
from mocodad_tpu.models.losses import elementwise_loss
from mocodad_tpu.parallel import make_mesh, replicated_sharding, shard_batch
from mocodad_tpu.training.checkpoint import (TopKCheckpointManager,
                                             load_state_dict, merge_matching)
from mocodad_tpu.training.ema import ema_init, ema_update


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any        # None when EMA disabled
    step: jnp.ndarray


def _group_batches(it, k: int):
    """Stack k consecutive index-batches into (k, B) arrays for the
    multi-step-per-dispatch train path; trailing batches (< k at the end
    of an epoch) pass through ungrouped and run one-per-launch."""
    buf = []
    for b in it:
        buf.append(b)
        if len(buf) == k:
            yield {key: np.stack([x[key] for x in buf]) for key in buf[0]}
            buf = []
    for b in buf:
        yield b


def monitored_metric_for(cfg: Config):
    """(metric name, mode), mirroring train_MoCoDAD.py:42-50."""
    if cfg.diffusion_on_latent is not None and cfg.stage == 'pretrain':
        return 'pretrain_rec_loss', 'min'
    if cfg.validation:
        return 'AUC', 'max'
    return 'loss_noise', 'min'


class Trainer:

    def __init__(self, cfg: Config, model=None, mesh=None,
                 n_devices: Optional[int] = None):
        self.cfg = cfg
        self.model = model if model is not None else build_model(cfg)
        self.mesh = mesh if mesh is not None else make_mesh(n_devices)
        self.trans_mats = affine_transform_matrices(max(cfg.num_transform, 1))
        self.use_ema = bool(cfg.use_ema)
        self._train_step = None
        self._eval_step: Dict[Any, Any] = {}
        # device-resident eval pools, keyed on the host buffer so per-epoch
        # validation uploads each dataset once (the ref re-materializes 5x
        # host-side per epoch instead, utils/dataset.py:70-75)
        self._eval_pools: Dict[int, Any] = {}
        self._log_every = int(cfg.extras.get('log_every_n_steps', 20))
        # Observability (SURVEY.md section 5): optional wandb mirror of the
        # metric stream, optional jax.profiler trace of the first steps,
        # and a NaN-check debug mode.
        self._wandb = None
        if cfg.use_wandb and jax.process_index() == 0:
            try:
                import wandb
                self._wandb = wandb.init(
                    project=cfg.project_name, group=cfg.group_name,
                    entity=cfg.wandb_entity, name=cfg.dir_name,
                    config=cfg.to_dict())
            except Exception as e:  # wandb not installed / offline
                print(f'wandb disabled ({e})', file=sys.stderr)
        self._profile_dir = cfg.extras.get('profile_dir')
        if cfg.extras.get('debug_nans'):
            jax.config.update('jax_debug_nans', True)

    # ---- optimizer ------------------------------------------------------

    def make_optimizer(self, steps_per_epoch: int):
        """Adam + per-epoch ExponentialLR(gamma=0.99)
        (ref: models/mocodad.py:324-334)."""
        schedule = optax.exponential_decay(
            init_value=self.cfg.opt_lr, transition_steps=steps_per_epoch,
            decay_rate=0.99, staircase=True)
        return optax.adam(schedule), schedule

    # ---- state ----------------------------------------------------------

    def init_state(self, steps_per_epoch: int, rng: jax.Array) -> TrainState:
        variables = self.model.init_variables(rng)
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})

        if getattr(self.model, 'stage', None) == 'diffusion':
            params, batch_stats = self._load_pretrained_into(params,
                                                             batch_stats)

        opt, schedule = self.make_optimizer(steps_per_epoch)
        self._opt = opt
        # kept for observability: fit() logs the decayed lr per epoch
        # (the reference attaches a LearningRateMonitor,
        # ref train_MoCoDAD.py:57-62)
        self._schedule = schedule
        self._update_mask = (self.model.trainable_mask(params)
                             if hasattr(self.model, 'trainable_mask')
                             else None)
        state = TrainState(
            params=params, batch_stats=batch_stats,
            opt_state=jax.jit(opt.init)(params),
            ema_params=ema_init(params) if self.use_ema else None,
            step=jnp.zeros((), jnp.int32))
        # place replicated over the mesh up front so the first train step
        # compiles with the same shardings as every later one
        return jax.device_put(state, replicated_sharding(self.mesh))

    def _load_pretrained_into(self, params, batch_stats):
        """Latent diffusion stage: transfer matching weights AND BatchNorm
        running stats from the pretrain checkpoint (the reference's
        load_state_dict(strict=False) restores BN buffers too,
        ref: mocodad_latent.py:223-228 — without them the frozen encoder
        would normalize with mean=0/var=1 in eval mode)."""
        path = self.cfg.pretrained_model_ckpt_path
        if not path:
            raise ValueError('Pretrained model checkpoint path not specified')
        raw = load_state_dict(path)
        src = raw.get('params', raw)
        params = merge_matching(params, src)
        if isinstance(raw, dict) and raw.get('batch_stats'):
            batch_stats = merge_matching(batch_stats, raw['batch_stats'])
        return params, batch_stats

    # ---- jitted steps ----------------------------------------------------

    def _use_device_pool(self, ds: PoseWindows) -> bool:
        """Keep the training window pool in HBM when it fits.

        Controlled by the `device_data` extras key: 'auto' (default, on
        when the pool is under `device_data_cap_gb`, default 4 GB),
        true/false to force.  Falls back to host batches for the
        per-item host-side random-crop path (old_aug)."""
        mode = self.cfg.extras.get('device_data', 'auto')
        if isinstance(mode, str):
            mode = mode.strip().lower()
        truthy = mode in (True, 'true', 'on', 'yes', '1', 1)
        falsy = mode in (False, 'false', 'off', 'no', '0', 0)
        if not (truthy or falsy or mode == 'auto'):
            raise ValueError(f'device_data must be auto/true/false, '
                             f'got {mode!r}')
        if falsy:
            return False
        if ds.old_aug:
            if truthy:
                # an explicit request that silently degrades to host
                # batches would hide a 5-10x throughput loss
                raise ValueError(
                    'device_data: true is incompatible with the old_aug '
                    'dataset path (per-item host-side random crops need '
                    'materialized batches)')
            return False
        if truthy:
            return True
        cap_gb = float(self.cfg.extras.get('device_data_cap_gb', 4.0))
        return ds.data.nbytes <= cap_gb * 1e9

    def steps_per_dispatch(self, pool_mode: bool) -> int:
        """How many train steps to fuse per jit launch (`steps_per_dispatch`
        extras key; 'auto' = 8 in single-process pool mode, else 1).
        Multi-process meshes keep 1: grouped batches would need a
        second-axis global-array assembly across hosts for marginal gain
        (DCN dispatch is not tunnel-bound)."""
        v = self.cfg.extras.get('steps_per_dispatch', 'auto')
        if v == 'auto':
            return 8 if (pool_mode and jax.process_count() == 1) else 1
        k = int(v)
        if k < 1:
            raise ValueError(f'steps_per_dispatch must be >= 1, got {k}')
        if k > 1 and not pool_mode:
            raise ValueError('steps_per_dispatch > 1 requires the '
                             'device-resident pool (device_data)')
        if k > 1 and jax.process_count() > 1:
            raise ValueError(
                'steps_per_dispatch > 1 is single-process only: grouped '
                '(K, B) batches would need a second-axis global-array '
                'assembly across hosts, and DCN dispatch is not '
                'tunnel-bound (see parallel/mesh.py shard_grouped_batch)')
        return k

    def _build_train_step(self, pool_mode: bool = False,
                          steps_per_dispatch: int = 1):
        """Jitted train step.

        pool_mode: the window pool lives in HBM (replicated over the
        mesh); the step receives it plus per-batch (idx, trans, mask)
        vectors and gathers `pool[idx]` on device.  Cuts per-step
        host->device traffic from the full batch to three (B,) vectors —
        measured 23k -> 135k windows/s through the remote-TPU tunnel
        (tools/perf/probe_train_pipeline.py).

        In both modes the per-step RNG is derived INSIDE the jit
        (fold_in(rng, state.step)) so the loop issues no eager device ops
        between steps; keys are identical to the previous host-side fold.
        """
        model, opt = self.model, self._opt
        mats = self.trans_mats
        mask_tree = self._update_mask
        use_ema = self.use_ema

        def _step(state: TrainState, data, trans, sample_mask, rng_base):
            rng = jax.random.fold_in(rng_base, state.step)
            data = apply_affine_batch(data, mats, trans)

            def loss_fn(params):
                loss, metrics, mutated = model.loss(
                    {'params': params, 'batch_stats': state.batch_stats},
                    data, rng, train=True, sample_mask=sample_mask)
                return loss, (metrics, mutated)

            grads, (metrics, mutated) = jax.grad(loss_fn, has_aux=True)(
                state.params)
            updates, opt_state = opt.update(grads, state.opt_state,
                                            state.params)
            if mask_tree is not None:
                updates = jax.tree_util.tree_map(
                    lambda u, m: u if m else jnp.zeros_like(u),
                    updates, mask_tree)
            params = optax.apply_updates(state.params, updates)
            ema_params = state.ema_params
            if use_ema:
                ema_params = ema_update(ema_params, params)
            new_state = TrainState(
                params=params,
                batch_stats=mutated.get('batch_stats', state.batch_stats),
                opt_state=opt_state, ema_params=ema_params,
                step=state.step + 1)
            return new_state, metrics

        if pool_mode and steps_per_dispatch > 1:
            # K steps per launch: per-launch dispatch latency through the
            # remote-TPU tunnel (~10 ms under load) is comparable to the
            # ~14 ms on-device step and cannot be pipelined (each step
            # consumes the previous state), so scanning K index-batches
            # inside one jit amortizes it K-fold — measured 106k -> 206k
            # windows/s at K=8 (tools/perf/probe_train_multistep.py).
            # The loss trajectory is bit-identical: the per-step key is
            # fold_in(rng, state.step) inside _step either way.
            def train_step(state: TrainState, pool, batches, rng):
                def body(st, b):
                    return _step(st, pool[b['idx']], b['trans'], b['mask'],
                                 rng)
                return jax.lax.scan(body, state, batches)
        elif pool_mode:
            def train_step(state: TrainState, pool, batch, rng):
                data = pool[batch['idx']]
                return _step(state, data, batch['trans'], batch['mask'], rng)
        else:
            def train_step(state: TrainState, batch, rng):
                return _step(state, batch['data'], batch['trans'],
                             batch['mask'], rng)

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_eval_step(self, with_pose: bool, pool_mode: bool = False):
        model = self.model
        mats = self.trans_mats
        n_cond = model.n_frames_condition

        def _eval(variables, data, trans, rng_base, batch_idx):
            # per-batch key derived inside the jit: no eager fold_in
            # dispatch between batches (same pattern as the train step)
            rng = jax.random.fold_in(rng_base, batch_idx)
            data = apply_affine_batch(data, mats, trans)
            if getattr(model, 'stage', None) == 'pretrain':
                # prediction is the reconstructed pose; validation metric
                # is plain reconstruction loss
                # (ref: mocodad_latent.py:131-132, 192-197, 217-218)
                from mocodad_tpu.models import frames as F
                order = model.frame_order(rng, data.shape[0])
                _, corrupt = F.select_frames(data, order, n_cond)
                pose, _ = model.generate(variables, data, rng)
                per = elementwise_loss(model.loss_kind, pose, corrupt)
                loss = per.reshape(per.shape[0], -1).mean(axis=-1)
                return loss, (pose if with_pose else None)
            sel, loss = model.generate(variables, data, rng)
            return loss, (sel if with_pose else None)

        if pool_mode:
            def eval_step(variables, pool, batch, rng_base, batch_idx):
                return _eval(variables, pool[batch['idx']], batch['trans'],
                             rng_base, batch_idx)
        else:
            def eval_step(variables, batch, rng_base, batch_idx):
                return _eval(variables, batch['data'], batch['trans'],
                             rng_base, batch_idx)

        # Measured-winning TPU fusion/VMEM options for the sampling chain
        # (-6% forward time; ops/xla_tuning.py, no-op off-TPU)
        from mocodad_tpu.ops.xla_tuning import tuned_compiler_options
        return jax.jit(eval_step, compiler_options=tuned_compiler_options())

    # ---- loops -----------------------------------------------------------

    def run_inference(self, ds: PoseWindows, variables, rng,
                      with_pose: Optional[bool] = None) -> Dict[str, Any]:
        """Run generation over a dataset once.

        Returns host arrays with padding stripped: {'loss': (N,), 'pose':
        (N, C, Tc, V) or None, 'trans', 'meta', 'frames'}.  `with_pose`
        defaults to whether the configured `model_return_value` needs the
        selected poses ('pose'/'all', ref models/mocodad.py:606-636); the
        loss vector is always produced since scoring consumes it.
        """
        if with_pose is None:
            with_pose = self.model.model_return_value in ('pose', 'all')
        from mocodad_tpu.models.losses import selects_pose
        # latent pretrain returns the reconstruction regardless of the
        # aggregation strategy (mocodad_latent generate ignores it), so
        # the loss-only-aggregation guard does not apply there
        if with_pose and not selects_pose(
                str(self.model.aggregation_strategy)) and \
                getattr(self.model, 'stage', None) != 'pretrain':
            raise ValueError(
                f"model_return_value '{self.model.model_return_value}' "
                f"needs selected poses, but aggregation strategy "
                f"'{self.model.aggregation_strategy}' is loss-only "
                f"(ref models/mocodad.py:492-501 returns selected_x=None)")
        # Domain-separate evaluation keys from training keys: the train
        # step derives fold_in(key(seed), step), and fold_in(k, i) equals
        # split(k)[i], so without a tag eval batch i (fold_in per batch
        # below) would replay train step i's exact key tuple from the same
        # config seed — correlating generation noise / random_imp orders
        # with the noise the weights were trained on.
        rng = jax.random.fold_in(rng, 0x45564C)  # 'EVL' domain tag
        use_pool = self._use_device_pool(ds)
        key = (with_pose, use_pool)
        if key not in self._eval_step:
            self._eval_step[key] = self._build_eval_step(
                with_pose, pool_mode=use_pool)
        step_fn = self._eval_step[key]
        outs: Dict[str, list] = {k: [] for k in
                                 ('loss', 'pose', 'trans', 'meta', 'frames')}
        if use_pool:
            # windows live in HBM; only (idx, trans) cross per batch, and
            # the host-side meta/frames gathers ride in the producer thread
            cached = self._eval_pools.get(id(ds.data))
            if cached is None or cached[0] is not ds.data:
                # single-entry cache: per-epoch validation reuses one ds,
                # and evicting on switch bounds HBM at one pool.  The host
                # buffer rides along so a recycled id() can never alias a
                # stale pool
                cached = (ds.data, jax.device_put(
                    ds.data, replicated_sharding(self.mesh)))
                self._eval_pools = {id(ds.data): cached}
            pool = cached[1]
            loader = prefetch(
                make_loader(ds, self.cfg.batch_size, yield_indices=True),
                place=lambda b: (
                    {'trans': b['trans'], 'mask': b['mask'],
                     'meta': ds.meta[b['idx']],
                     'frames': ds.frames[b['idx']]},
                    shard_batch({'idx': b['idx'], 'trans': b['trans']},
                                self.mesh)))
        else:
            loader = prefetch(
                make_loader(ds, self.cfg.batch_size),
                place=lambda b: (b, shard_batch(
                    {'data': b['data'], 'trans': b['trans']}, self.mesh)))
        model_vars = {'params': variables['params'],
                      'batch_stats': variables.get('batch_stats', {})}
        # Dispatch the whole pass without per-batch device syncs: results
        # stay on device until the end, so batch k+1's launch overlaps
        # batch k's sampling chain (a per-batch np.asarray would serialize
        # every launch against a device->host fetch).  Per-batch results
        # are small ((B,) losses, optionally (B,C,Tc,V) poses), so holding
        # them all is cheap next to the window pool itself.
        pending = []  # (loss_dev, pose_dev, host_batch_metadata)
        keep = ('mask', 'trans', 'meta', 'frames')
        for i, (batch, sb) in enumerate(loader):
            # retain only the strip/meta fields: holding the full host
            # batch would keep every (B, C, T, V) 'data' array alive for
            # the whole pass (~num_transform x dataset bytes in host-batch
            # mode) when each is only needed for its launch
            batch = {k: batch[k] for k in keep}
            if use_pool:
                loss, pose = step_fn(model_vars, pool, sb, rng, i)
            else:
                loss, pose = step_fn(model_vars, sb, rng, i)
            if jax.process_count() > 1:
                # multi-host: the result spans processes; gather the full
                # per-window vectors onto every host for scoring (eager,
                # but DCN meshes don't run behind a serializing tunnel)
                from jax.experimental import multihost_utils
                loss = multihost_utils.process_allgather(loss, tiled=True)
                if pose is not None:
                    pose = multihost_utils.process_allgather(pose,
                                                             tiled=True)
            pending.append((loss, pose, batch))
        jax.block_until_ready([p[0] for p in pending])
        for loss, pose, batch in pending:
            valid = batch['mask'] > 0
            outs['loss'].append(np.asarray(loss)[valid])
            if pose is not None:
                outs['pose'].append(np.asarray(pose)[valid])
            outs['trans'].append(batch['trans'][valid])
            outs['meta'].append(batch['meta'][valid])
            outs['frames'].append(batch['frames'][valid])
        return {k: (np.concatenate(v) if v else None)
                for k, v in outs.items()}

    def evaluate(self, ds: PoseWindows, variables, rng):
        """Loss-route inference: (per-window losses, trans, meta, frames)
        as host arrays — the input of the scoring chain."""
        r = self.run_inference(ds, variables, rng, with_pose=False)
        return r['loss'], r['trans'], r['meta'], r['frames']

    def validation_metric(self, ds: PoseWindows, variables, rng) -> Dict:
        out, trans, meta, frames = self.evaluate(ds, variables, rng)
        if getattr(self.model, 'stage', None) == 'pretrain':
            return {'pretrain_rec_loss': float(out.mean())}
        auc = post_processing_from_config(out, trans, meta, frames, self.cfg)
        return {'AUC': float(auc)}

    def restore_state(self, path: str, template: TrainState,
                      steps_per_epoch: Optional[int] = None
                      ) -> tuple[TrainState, int]:
        """Restore a full TrainState (params/EMA/opt_state/step) written by
        a previous run; returns (state, next_epoch).  The reference has no
        resume path (Lightning's ckpt_path is eval-only there,
        eval_MoCoDAD.py:32); this closes that gap for long trainings.

        Multi-host note: every process reads `path`, so resume on a pod
        requires the checkpoint on a shared filesystem (or pre-staged to
        every host) — process 0 is the only writer during training.
        """
        import json

        from mocodad_tpu.training.checkpoint import load_checkpoint
        state = load_checkpoint(path, jax.device_get(template))
        epoch = None
        if os.path.exists(path + '.json'):
            with open(path + '.json') as f:
                epoch = int(json.load(f).get('epoch', -1))
        if epoch is None:
            # Sidecar meta lost: derive the epoch from the restored step
            # count instead of silently re-running every epoch on top of
            # the restored weights.
            if not steps_per_epoch:
                raise ValueError(
                    f'{path}.json is missing and steps_per_epoch unknown; '
                    'cannot determine the resume epoch')
            epoch = int(state.step) // steps_per_epoch - 1
            print(f'WARNING: {path}.json missing; resuming at epoch '
                  f'{epoch + 1} derived from step {int(state.step)}',
                  file=sys.stderr)
        state = jax.device_put(state, replicated_sharding(self.mesh))
        return state, epoch + 1

    def fit(self, train_ds: PoseWindows, val_ds: Optional[PoseWindows] = None,
            n_epochs: Optional[int] = None,
            resume: Optional[str] = None) -> TrainState:
        cfg = self.cfg
        n_epochs = n_epochs if n_epochs is not None else cfg.n_epochs
        steps_per_epoch = num_batches(train_ds, cfg.batch_size)
        rng = jax.random.key(cfg.seed)
        state = self.init_state(steps_per_epoch, rng)
        start_epoch = 0
        if resume:
            if resume is True or resume == 'auto':
                resume = os.path.join(cfg.ckpt_dir, 'last.ckpt')
            state, start_epoch = self.restore_state(resume, state,
                                                    steps_per_epoch)
            print(f'resumed from {resume} at epoch {start_epoch} '
                  f'(step {int(state.step)})', flush=True)
        use_pool = self._use_device_pool(train_ds)
        k_dispatch = self.steps_per_dispatch(use_pool)
        self._train_step = self._build_train_step(
            pool_mode=use_pool, steps_per_dispatch=k_dispatch)
        # trailing (< K) batches of an epoch run one-per-launch
        tail_step = (self._build_train_step(pool_mode=True)
                     if k_dispatch > 1 else self._train_step)
        pool_arr = None
        if use_pool:
            pool_arr = jax.device_put(train_ds.data,
                                      replicated_sharding(self.mesh))
            print(f'window pool device-resident '
                  f'({train_ds.data.nbytes / 1e6:.0f} MB, '
                  f'index-only batches)', flush=True)

        monitor, mode = monitored_metric_for(cfg)
        ckpt = TopKCheckpointManager(cfg.ckpt_dir, monitor, mode, k=2)
        if resume:
            # always reload top-k bookkeeping on resume (even when the
            # derived start epoch is 0) so retention stays consistent
            ckpt.restore_index()

        # multi-host: every process computes identically (replicated state,
        # psum'd metrics); only process 0 writes artifacts
        from mocodad_tpu.parallel import is_main_process
        main = is_main_process()
        log_path = os.path.join(cfg.ckpt_dir, 'metrics.csv')
        log_f = open(log_path, 'a') if main else open(os.devnull, 'w')

        if self._profile_dir:
            jax.profiler.start_trace(self._profile_dir)

        step = int(state.step)
        for epoch in range(start_epoch, n_epochs):
            epoch_metrics: Dict[str, list] = {}
            t0 = time.time()
            base = make_loader(train_ds, cfg.batch_size, shuffle=True,
                               seed=cfg.seed + epoch, yield_indices=use_pool)
            if k_dispatch > 1:
                base = _group_batches(base, k_dispatch)

            def _place(b):
                if b['idx' if use_pool else 'trans'].ndim == 2:
                    from mocodad_tpu.parallel.mesh import shard_grouped_batch
                    return shard_grouped_batch(b, self.mesh)
                if not use_pool:
                    # the train step consumes data/trans/mask only; meta
                    # and frames are eval-side fields and would cross the
                    # host->device tunnel per step for nothing
                    b = {k: b[k] for k in ('data', 'trans', 'mask')}
                return shard_batch(b, self.mesh)

            loader = prefetch(base, place=_place)
            last_logged = step
            for sb in loader:
                grouped = use_pool and sb['idx'].ndim == 2
                if grouped:
                    state, metrics = self._train_step(state, pool_arr, sb,
                                                      rng)
                    step += int(sb['idx'].shape[0])
                elif use_pool:
                    state, metrics = tail_step(state, pool_arr, sb, rng)
                    step += 1
                else:
                    state, metrics = self._train_step(state, sb, rng)
                    step += 1
                for k, v in metrics.items():
                    # append raw device values: any per-step host-side jnp
                    # op would issue an eager dispatch between train steps
                    epoch_metrics.setdefault(k, []).append(v)
                if step - last_logged >= self._log_every:
                    last_logged = step
                    # grouped launches: log the group's latest step
                    vals = {k: float(jnp.atleast_1d(v)[-1])
                            for k, v in metrics.items()}
                    line = ' '.join(f'{k}={v:.5f}' for k, v in vals.items())
                    print(f'epoch {epoch} step {step}: {line}', flush=True)
                    log_f.write(f'{epoch},{step},' + ','.join(
                        f'{k}={v}' for k, v in vals.items()) + '\n')

            means = {k: float(jnp.mean(jnp.concatenate(
                         [jnp.atleast_1d(x) for x in v])))
                     for k, v in epoch_metrics.items()}
            dt = time.time() - t0
            wps = len(train_ds) / dt if dt > 0 else 0.0

            val_metrics = {}
            if val_ds is not None:
                variables = {'params': state.ema_params if self.use_ema
                             else state.params,
                             'batch_stats': state.batch_stats}
                val_metrics = self.validation_metric(
                    val_ds, variables,
                    jax.random.fold_in(rng, (1 << 30) + epoch))
            means.update(val_metrics)
            # the decayed learning rate, evaluated at the current step —
            # the reference's LearningRateMonitor(logging_interval='epoch')
            # (ref train_MoCoDAD.py:57-62); host-side schedule eval, no
            # device dispatch
            means['lr'] = float(self._schedule(step))
            line = ' '.join(f'{k}={v:.5f}' for k, v in means.items())
            print(f'[epoch {epoch}] {line} ({wps:.0f} windows/s)', flush=True)
            log_f.write(f'{epoch},epoch_end,' + ','.join(
                f'{k}={v}' for k, v in means.items()) + '\n')
            log_f.flush()

            if self._wandb is not None:
                self._wandb.log(means, step=step)
            if self._profile_dir and epoch == 0:
                jax.profiler.stop_trace()
                self._profile_dir = None

            value = means.get(monitor)
            if not main:
                pass                      # process 0 owns checkpoint files
            elif value is not None:
                ckpt.save(state, epoch, value)
            else:
                # monitored metric unavailable (e.g. no validation split):
                # still keep a resumable latest checkpoint
                ckpt.save_last(state, epoch)
            if self._wandb is not None and cfg.extras.get('log_model'):
                # mirror the reference's WandbLogger(log_model='all')
                # checkpoint upload (ref train_MoCoDAD.py:57-62)
                try:
                    import wandb
                    art = wandb.Artifact(f'model-{cfg.dir_name}',
                                         type='model')
                    art.add_file(os.path.join(cfg.ckpt_dir, 'last.ckpt'))
                    self._wandb.log_artifact(art)
                except Exception as e:
                    print(f'wandb log_model failed ({e})', file=sys.stderr)
        log_f.close()
        return state


def restore_and_infer(cfg: Config, n_devices: Optional[int] = None,
                      with_pose: Optional[bool] = None):
    """Shared eval/predict CLI path: build the split dataset, restore the
    configured checkpoint into a fresh template, and run generation over
    the split (ref eval_MoCoDAD.py:32-38 / predict_MoCoDAD.py:31-36 share
    the same restore+predict core via Lightning).

    Returns (trainer, dataset, result) with `result` as run_inference
    returns it.  `with_pose=None` derives from model_return_value.
    """
    from mocodad_tpu.data import build_dataset
    from mocodad_tpu.training.checkpoint import restore_variables

    print('Loading data and creating loaders.....')
    ds = build_dataset(cfg, split=cfg.split)
    print(f'{cfg.split} windows: {ds.num_samples} '
          f'(x{ds.num_transform} transforms)')

    trainer = Trainer(cfg, n_devices=n_devices)
    template = trainer.model.init_variables(jax.random.key(cfg.seed))
    ckpt_path = os.path.join(cfg.ckpt_dir, cfg.load_ckpt)
    variables = restore_variables(ckpt_path, template, use_ema=cfg.use_ema)
    res = trainer.run_inference(ds, variables, jax.random.key(cfg.seed),
                                with_pose=with_pose)
    return trainer, ds, res


def export_prediction_tensors(trainer: 'Trainer', ds, res, cfg: Config
                              ) -> str:
    """Pack a run_inference result into the reference's saved-tensor cache
    layout and write it under ckpt_dir (the predict CLI's artifact; the
    eval CLI writes the same cache when save_tensors is set)."""
    from mocodad_tpu.data import transformed_gt_data
    from mocodad_tpu.utils.tensors import pack_prediction_tensors, save_tensors

    tensors = pack_prediction_tensors(
        res, trainer.model.model_return_value,
        gt_data=transformed_gt_data(ds.data, ds.num_transform))
    # the model's EFFECTIVE sample count names the cache (eval_profile:
    # fast caps it below cfg.n_generated_samples; the replay path builds
    # the same model, so both sides resolve the same directory)
    return save_tensors(tensors, cfg.ckpt_dir, cfg.split,
                        cfg.aggregation_strategy,
                        trainer.model.n_generated_samples)

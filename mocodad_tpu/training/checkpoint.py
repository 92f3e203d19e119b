"""Pytree checkpointing with top-k retention by a monitored metric.

Replaces Lightning ModelCheckpoint(save_top_k=2, monitor=...)
(ref: train_MoCoDAD.py:51-53) and torch state-dict loading.  State is a
flax-serialized msgpack of the full train-state pytree plus a JSON index;
`merge_matching` provides the strict=False load used by the latent
variant's pretrained-encoder transfer (ref: mocodad_latent.py:223-228).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import flax.serialization as ser
import jax
import numpy as np


def save_checkpoint(path: str, state: Any, meta: Optional[Dict] = None
                    ) -> None:
    state = jax.device_get(state)
    with open(path, 'wb') as f:
        f.write(ser.to_bytes(state))
    if meta is not None:
        with open(path + '.json', 'w') as f:
            json.dump(meta, f)


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into a template pytree of the same structure."""
    with open(path, 'rb') as f:
        return ser.from_bytes(target, f.read())


def merge_matching(target: Any, source_state_dict: Dict) -> Any:
    """Copy leaves from a (possibly differently-shaped) source state dict
    into `target` wherever path and shape match — torch
    load_state_dict(strict=False) semantics."""
    tgt = ser.to_state_dict(target)

    def merge(t, s):
        if isinstance(t, dict):
            return {k: (merge(t[k], s[k]) if isinstance(s, dict) and k in s
                        else t[k]) for k in t}
        if isinstance(s, (np.ndarray, jax.Array)) and \
                getattr(s, 'shape', None) == getattr(t, 'shape', None):
            return s
        return t

    return ser.from_state_dict(target, merge(tgt, source_state_dict))


def load_state_dict(path: str) -> Dict:
    """Load a checkpoint as a raw nested dict (no template needed)."""
    with open(path, 'rb') as f:
        return ser.msgpack_restore(f.read())


def is_torch_checkpoint(path: str) -> bool:
    """Reference checkpoints are torch.save files: zip archives ('PK...')
    or legacy pickle streams ('\\x80')."""
    with open(path, 'rb') as f:
        magic = f.read(2)
    return magic in (b'PK', b'\x80\x02', b'\x80\x03', b'\x80\x04',
                     b'\x80\x05')


def restore_variables(path: str, template_variables: Dict,
                      use_ema: bool = False) -> Dict:
    """Restore model variables (params + batch_stats) from a TrainState
    checkpoint written by the training loop, or directly from a reference
    (PyTorch/Lightning) checkpoint (ref eval_MoCoDAD.py:32-38)."""
    if is_torch_checkpoint(path):
        from mocodad_tpu.utils.torch_compat import load_torch_checkpoint
        return load_torch_checkpoint(path, template_variables, strict=False,
                                     use_ema=use_ema)
    raw = load_state_dict(path)
    if use_ema and not raw.get('ema_params'):
        import sys
        print(f'WARNING: use_ema requested but {path} carries no '
              'ema_params; loading raw weights', file=sys.stderr)
    params_src = raw.get('ema_params' if use_ema and raw.get('ema_params')
                         else 'params', raw)
    params = ser.from_state_dict(template_variables['params'], params_src)
    batch_stats = template_variables.get('batch_stats', {})
    if raw.get('batch_stats'):
        batch_stats = ser.from_state_dict(batch_stats, raw['batch_stats'])
    return {'params': params, 'batch_stats': batch_stats}


class TopKCheckpointManager:
    """Keep the best k checkpoints by a monitored metric, plus 'last.ckpt'.

    File naming mirrors Lightning's epoch=N-metric=V pattern so runs are
    inspectable; 'best_weights.ckpt' is a stable symlink-style copy of the
    current best, matching the load_ckpt name the shipped test configs use.
    """

    def __init__(self, ckpt_dir: str, monitor: str, mode: str = 'min',
                 k: int = 2):
        assert mode in ('min', 'max')
        self.ckpt_dir = ckpt_dir
        self.monitor = monitor
        self.mode = mode
        self.k = k
        self.entries = []  # list of (value, path)
        os.makedirs(ckpt_dir, exist_ok=True)

    def _better(self, a: float, b: float) -> bool:
        return a < b if self.mode == 'min' else a > b

    def restore_index(self) -> None:
        """Reload the top-k bookkeeping written by a previous run so a
        resumed training continues the same retention policy."""
        path = os.path.join(self.ckpt_dir, 'topk.json')
        if not os.path.exists(path):
            return
        with open(path) as f:
            idx = json.load(f)
        if idx.get('monitor') != self.monitor or idx.get('mode') != self.mode:
            return  # different run configuration; start fresh
        self.entries = [(float(v), os.path.join(self.ckpt_dir, name))
                        for v, name in idx.get('entries', [])
                        if os.path.exists(os.path.join(self.ckpt_dir, name))]

    @property
    def best(self) -> Optional[float]:
        return self.entries[0][0] if self.entries else None

    def save_last(self, state: Any, epoch: int) -> None:
        save_checkpoint(os.path.join(self.ckpt_dir, 'last.ckpt'), state,
                        {'epoch': epoch})

    def save(self, state: Any, epoch: int, value: float) -> str:
        name = f'epoch={epoch}-{self.monitor}={value:.6f}.ckpt'
        path = os.path.join(self.ckpt_dir, name)
        meta = {'epoch': epoch, self.monitor: value, 'monitor': self.monitor}
        save_checkpoint(os.path.join(self.ckpt_dir, 'last.ckpt'), state, meta)
        self.entries.append((value, path))
        self.entries.sort(key=lambda e: e[0],
                          reverse=(self.mode == 'max'))
        if (value, path) in self.entries[:self.k]:
            save_checkpoint(path, state, meta)
            if self.entries[0][1] == path:
                save_checkpoint(os.path.join(self.ckpt_dir,
                                             'best_weights.ckpt'),
                                state, meta)
        for _, stale in self.entries[self.k:]:
            if os.path.exists(stale):
                os.remove(stale)
            if os.path.exists(stale + '.json'):
                os.remove(stale + '.json')
        self.entries = self.entries[:self.k]
        with open(os.path.join(self.ckpt_dir, 'topk.json'), 'w') as f:
            json.dump({'monitor': self.monitor, 'mode': self.mode,
                       'entries': [[v, os.path.basename(p)]
                                   for v, p in self.entries]}, f)
        return path

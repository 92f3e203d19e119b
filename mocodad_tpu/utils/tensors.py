"""Saved-tensor cache: export eval outputs, replay scoring without the model.

Counterpart of MoCoDAD._save_tensors/_load_tensors/test_on_saved_tensors
(ref: models/mocodad.py:433-448, 583-603, 689-705) and predict_MoCoDAD.py.
Arrays are stored as .npy; .pt files written by the reference are also
readable (torch is an optional runtime dependency for that path only).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

TENSOR_NAMES = ['prediction', 'gt_data', 'trans', 'metadata', 'frames']


def tensors_dir(ckpt_dir: str, split: str, aggr_strategy: str,
                n_gen: int) -> str:
    return os.path.join(ckpt_dir,
                        f'saved_tensors_{split}_{aggr_strategy}_{n_gen}')


def save_tensors(tensors: Dict[str, np.ndarray], ckpt_dir: str, split: str,
                 aggr_strategy: str, n_gen: int) -> str:
    path = tensors_dir(ckpt_dir, split, aggr_strategy, n_gen)
    os.makedirs(path, exist_ok=True)
    for name, arr in tensors.items():
        np.save(os.path.join(path, name + '.npy'), np.asarray(arr))
    return path


def load_tensors(ckpt_dir: str, split: str, aggr_strategy: str,
                 n_gen: int) -> Dict[str, np.ndarray]:
    path = tensors_dir(ckpt_dir, split, aggr_strategy, n_gen)
    out: Dict[str, np.ndarray] = {}
    for fname in os.listdir(path):
        name, ext = os.path.splitext(fname)
        full = os.path.join(path, fname)
        if ext == '.npy':
            out[name] = np.load(full)
        elif ext == '.pt':  # reference-written caches
            import torch
            out[name] = torch.load(full, map_location='cpu').numpy()
    if not out:
        raise FileNotFoundError(f'no tensors found in {path}')
    return out

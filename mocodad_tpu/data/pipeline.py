"""Dataset assembly + host-side batch iterator.

Counterpart of `get_dataset_and_loader` (utils/dataset.py:286-330) and the
torch DataLoader semantics the reference relies on, with one structural
change for TPU: the reference multiplies the dataset length by
num_transform and materializes each affine view on the host per item
(utils/dataset.py:67-110); here the base windows are stored ONCE and
batches carry a transform index, applied on device as a tiny einsum
(see data/transforms.py).  Virtual index i maps to
(sample = i % N, transform = i // N), exactly like the reference.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Iterator

import numpy as np

from mocodad_tpu.config import Config
from mocodad_tpu.data.json_pose import json_pose_windows
from mocodad_tpu.data.robust import robust_pose_windows
from mocodad_tpu.data.scalers import load_scaler


@dataclass
class PoseWindows:
    """Base (un-transformed) pose windows + metadata."""
    data: np.ndarray      # (N, C, T, V) float32
    meta: np.ndarray      # (N, 4) int64 [scene, clip, person, start_frame]
    frames: np.ndarray    # (N, T) int32 actual frame numbers
    num_transform: int
    # With no affine transform list, the reference applies a RANDOM temporal
    # crop per item instead — even at test time (utils/dataset.py:81,125-130).
    old_aug: bool = False

    @property
    def num_samples(self) -> int:
        return self.data.shape[0]

    def __len__(self) -> int:
        # virtual length: every sample under every transform
        return self.num_samples * max(self.num_transform, 1)


def build_dataset(cfg: Config, split: str = 'train') -> PoseWindows:
    """Build the window arrays for a split (ref: utils/dataset.py:286-330).

    Test/validation always use stride 1 (ref: utils/dataset.py:308,318)."""
    seg_stride = cfg.seg_stride if split == 'train' else 1
    num_transform = max(cfg.num_transform, 1)

    if cfg.normalization_strategy == 'robust':
        data, meta, frames = robust_pose_windows(
            trajectories_path=cfg.data_dir, split=split, seg_len=cfg.seg_len,
            seg_stride=seg_stride, vid_res=cfg.vid_res,
            normalization_strategy=cfg.normalization_strategy,
            exp_dir=cfg.ckpt_dir, normalize_pose=True,
            include_global=(cfg.num_coords == 6), debug=cfg.debug,
            kp18_format=cfg.kp18_format, headless=cfg.headless)
    else:
        scaler = None
        if cfg.use_fitted_scaler:
            scaler = load_scaler(os.path.join(cfg.ckpt_dir, 'robust.npz'))
        data, meta, frames, artifact = json_pose_windows(
            path_to_json=cfg.pose_path[split], seg_len=cfg.seg_len,
            seg_stride=seg_stride, start_ofst=cfg.start_offset,
            kp_threshold=0, num_clips=(5 if cfg.debug else None),
            normalize=(cfg.normalization_strategy != 'none'),
            normalization_strategy=cfg.normalization_strategy,
            kp18_format=cfg.kp18_format, headless=cfg.headless,
            scaler=scaler, vid_res=cfg.vid_res, symm_range=cfg.symm_range,
            hip_center=cfg.hip_center, sub_mean=False, return_mean=False)
        # NOTE: no scaler artifact is persisted on this branch.  The
        # robust strategy always routes to the CSV path above (mirroring
        # the reference's dispatch, utils/dataset.py:309-312), so the
        # JSON path's robust-scaler save (ref utils/dataset.py:181-182)
        # is unreachable in the reference too; `use_fitted_scaler` exists
        # for externally-provided robust.npz files.

    # keep only the modeled coordinate channels (ref: utils/dataset.py:75)
    data = data[:, :cfg.num_coords]
    return PoseWindows(data=data, meta=meta, frames=frames,
                       num_transform=num_transform,
                       old_aug=(cfg.num_transform < 1))


def make_loader(ds: PoseWindows, batch_size: int, shuffle: bool = False,
                seed: int = 0, pad_to_full: bool = True,
                double_item: bool = False, yield_indices: bool = False
                ) -> Iterator[Dict[str, np.ndarray]]:
    """Yield host batches over the virtual (sample x transform) index space.

    Each batch dict carries the UN-transformed window data plus its
    transform index; the train/eval steps apply the affine on device.
    The final partial batch is padded to batch_size (static shapes under
    jit) with `mask` marking the valid rows.

    yield_indices: emit only {'idx', 'trans', 'mask'} (no data/meta/frames
    gathers) for device-resident-pool training, where the window pool
    lives in HBM and the train step gathers `pool[idx]` on device —
    per-step host->device traffic drops from the full (B,C,T,V) batch to
    three (B,) vectors.  Incompatible with the per-item host-side random
    augmentations (old_aug / double_item), which need materialized
    per-item data — requesting both is an error (the pool-eligibility
    decision lives in Trainer._use_device_pool).
    """
    if yield_indices and (ds.old_aug or double_item):
        raise ValueError('yield_indices is incompatible with old_aug/'
                         'double_item (per-item host-side augmentation)')
    n_virtual = len(ds)
    rng = np.random.default_rng(seed)
    order = np.arange(n_virtual)
    if shuffle:
        rng.shuffle(order)
    n = ds.num_samples
    for start in range(0, n_virtual, batch_size):
        idx = order[start:start + batch_size]
        valid = idx.shape[0]
        if valid < batch_size and pad_to_full:
            # pad by wrapping the (shuffled) epoch order, not by
            # duplicating one row: padded rows are loss-masked, but in
            # train mode they still enter BatchNorm batch statistics, so
            # filler drawn from the real data distribution keeps those
            # stats sane (the reference trains the true smaller batch)
            pad = np.resize(order, batch_size - valid).astype(idx.dtype)
            idx = np.concatenate([idx, pad])
        sample_idx = idx % n
        trans_idx = (idx // n).astype(np.int32)
        mask = np.zeros(idx.shape[0], dtype=np.float32)
        mask[:valid] = 1.0
        if yield_indices:
            yield {'idx': sample_idx.astype(np.int32), 'trans': trans_idx,
                   'mask': mask}
            continue
        data = ds.data[sample_idx]
        if ds.old_aug:
            from mocodad_tpu.data.transforms import temporal_crop
            data = np.stack([temporal_crop(d, rng=rng) for d in data])
        batch = {
            'data': data,
            'trans': trans_idx,
            'meta': ds.meta[sample_idx],
            'frames': ds.frames[sample_idx],
            'mask': mask,
        }
        if double_item:
            # second, strongly-augmented view of each window
            # (ref: utils/dataset.py:99-108, double_item)
            from mocodad_tpu.data.transforms import strong_augment
            batch['data2'] = np.stack(
                [strong_augment(d, rng=rng).astype(np.float32)
                 for d in ds.data[sample_idx]])
        yield batch


def num_batches(ds: PoseWindows, batch_size: int) -> int:
    return -(-len(ds) // batch_size)

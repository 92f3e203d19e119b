"""Pose augmentations: the 5 affine view transforms + skeleton aug library.

Behavioural counterpart of /root/reference/utils/dataset_utils.py:255-310
(`get_aff_trans_mat`, `apply_pose_transform`, `ae_trans_list`) and of the
SSL-style augs in utils/tools.py that are reachable from the dataset
(`temporal_crop`, utils/tools.py:66-75; the strong-aug chain).

TPU-first difference: the reference multiplies the dataset length by
num_transform and applies each affine per __getitem__ on the host
(utils/dataset.py:70-75).  Here the base windows are stored once and the
(K, 3, 3) matrix bank is applied on device inside the jitted step — one
tiny einsum — so host memory and dataloader time don't scale with K.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np


def affine_matrix(sx=1.0, sy=1.0, tx=0.0, ty=0.0, rot=0.0,
                  flip=False) -> np.ndarray:
    """3x3 matrix: flip @ (rot @ trans_scale)
    (ref: utils/dataset_utils.py:255-269)."""
    cos_r = math.cos(math.radians(rot))
    sin_r = math.sin(math.radians(rot))
    flip_mat = np.eye(3, dtype=np.float32)
    if flip:
        flip_mat[0, 0] = -1.0
    trans_scale = np.array([[sx, 0, tx], [0, sy, ty], [0, 0, 1]],
                           dtype=np.float32)
    rot_mat = np.array([[cos_r, -sin_r, 0], [sin_r, cos_r, 0], [0, 0, 1]],
                       dtype=np.float32)
    return flip_mat @ (rot_mat @ trans_scale)


# The 5 shipped view transforms (ref: utils/dataset_utils.py:304-310):
# identity, flip, rot90, rot90+flip, rot45.
_AE_TRANS_SPECS = [
    dict(rot=0, flip=False),
    dict(rot=0, flip=True),
    dict(rot=90, flip=False),
    dict(rot=90, flip=True),
    dict(rot=45, flip=False),
]


def affine_transform_matrices(num_transform: int) -> np.ndarray:
    """(K, 3, 3) bank of the first K shipped transforms."""
    if num_transform > len(_AE_TRANS_SPECS):
        raise ValueError(f'only {len(_AE_TRANS_SPECS)} shipped transforms')
    return np.stack([affine_matrix(**spec)
                     for spec in _AE_TRANS_SPECS[:num_transform]])


def apply_affine_np(pose: np.ndarray, mat: np.ndarray) -> np.ndarray:
    """Apply one 3x3 affine to (C, T, V) pose data with C in {2, 3}.

    Channel layout (x, y[, conf]); conf passes through unchanged
    (ref `apply_pose_transform`, utils/dataset_utils.py:272-286)."""
    c = pose.shape[0]
    xy1 = np.concatenate([pose[:2], np.ones_like(pose[:1])], axis=0)
    out = np.einsum('ktv,ck->ctv', xy1, mat)
    if c > 2:
        return np.concatenate([out[:2], pose[2:]], axis=0)
    return out[:2]


def transformed_gt_data(data: np.ndarray, num_transform: int) -> np.ndarray:
    """All affine views of the stored-once windows, stacked transform-major
    (transform 0 block first): the reference's saved 'gt_data' tensor
    (ref predict_MoCoDAD.py:31-36 via utils/model_utils.py:110-137; the
    reference materializes the dataset num_transform times instead,
    utils/dataset.py:70-75).  data is (N, C, T, V); returns (K*N, C, T, V).
    """
    mats = affine_transform_matrices(max(num_transform, 1))
    blocks = []
    for m in mats:
        xy = np.einsum('dk,bktv->bdtv', m[:2, :2], data[:, :2])
        xy += m[:2, 2][None, :, None, None]
        blocks.append(np.concatenate([xy, data[:, 2:]], axis=1)
                      if data.shape[1] > 2 else xy)
    return np.concatenate(blocks, axis=0)


def apply_affine_batch(data, mats, trans_idx):
    """Device-side batched affine: data (B, C, T, V) with C>=2, mats
    (K, 3, 3), trans_idx (B,) int -> transformed data.

    Only the first two channels (x, y) mix; extra channels (conf / global
    features) pass through, matching apply_pose_transform's conf handling.
    Pure jnp; safe under jit/vmap/shard_map.
    """
    import jax.numpy as jnp
    m = jnp.asarray(mats)[trans_idx]              # (B, 3, 3)
    xy = data[:, :2]                              # (B, 2, T, V)
    lin = jnp.einsum('bdk,bktv->bdtv', m[:, :2, :2], xy)
    out_xy = lin + m[:, :2, 2][:, :, None, None]
    if data.shape[1] > 2:
        return jnp.concatenate([out_xy, data[:, 2:]], axis=1)
    return out_xy


# ---------------------------------------------------------------------------
# Skeleton augmentation library (ref: utils/tools.py).  Only temporal_crop
# (and the strong-aug chain for double_item) is reachable from the reference
# dataset; the rest are provided for API completeness.
# ---------------------------------------------------------------------------


def temporal_crop(pose: np.ndarray, padding_ratio: int = 6,
                  rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Reflect-pad in time then randomly crop back to T
    (ref: utils/tools.py:66-75)."""
    rng = rng or np.random.default_rng()
    c, t, v = pose.shape
    pad = t // padding_ratio
    start = int(rng.integers(0, pad * 2 + 1))
    padded = np.concatenate([pose[:, :pad][:, ::-1], pose,
                             pose[:, -pad:][:, ::-1]], axis=1)
    return padded[:, start:start + t]


def random_time_flip(pose: np.ndarray, p: float = 0.5,
                     rng: Optional[np.random.Generator] = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    if rng.random() < p:
        return pose[:, ::-1]
    return pose


def gaussian_noise(pose: np.ndarray, mean: float = 0.0, std: float = 0.01,
                   p: float = 0.5,
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    if rng.random() < p:
        return pose + rng.normal(mean, std, size=pose.shape)
    return pose


def axis_mask(pose: np.ndarray, p: float = 0.5,
              rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Zero one coordinate axis (ref: utils/tools.py:185-207)."""
    rng = rng or np.random.default_rng()
    if rng.random() < p:
        out = pose.copy()
        out[int(rng.integers(0, 2))] = 0.0
        return out
    return pose


def shear(pose: np.ndarray, r: float = 0.5,
          rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random shear of the coordinate channels (ref: utils/tools.py:52-63).
    Expects 3 channels (the reference applies it pre-slicing)."""
    rng = rng or np.random.default_rng()
    s = rng.uniform(-r, r, size=6)
    m = np.array([[1, s[0], s[1]],
                  [s[2], 1, s[3]],
                  [s[4], s[5], 1]])
    return np.einsum('ktv,kc->ctv', pose, m)


def random_rotate(pose: np.ndarray,
                  rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random small 3-D rotation of (x, y[, pad]) coordinates
    (ref: utils/tools.py:98-138): one axis gets up to 30 degrees, the other
    up to 1 degree; the 2-channel pose is padded to 3-D by repetition."""
    rng = rng or np.random.default_rng()

    def rot_mat(axis, angle):
        c, s = math.cos(angle), math.sin(angle)
        if axis == 0:
            return np.array([[1, 0, 0], [0, c, s], [0, -s, c]])
        return np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]])

    seq = np.transpose(pose.copy(), (1, 2, 0))  # (T, V, C)
    c = seq.shape[-1]
    main_axis = int(rng.integers(0, 3))
    for axis in (0, 1):
        hi = 30 if axis == main_axis else 1
        angle = math.radians(rng.uniform(0, hi))
        # the reference re-pads 2->3 channels by repetition and truncates
        # back after EVERY rotation (utils/tools.py:117-119), so the 3rd
        # channel entering each rotation is the CURRENT x — not the
        # rotated z carried over from the previous rotation
        reps = -(-3 // c)
        seq3 = np.tile(seq, (1, 1, reps))[:, :, :3]
        seq = np.matmul(seq3, rot_mat(axis, angle).T)[:, :, :c]
    return np.transpose(seq, (2, 0, 1))


def gaussian_blur(pose: np.ndarray, kernel: int = 15, sigma=(0.1, 2.0),
                  p: float = 0.5,
                  rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random-sigma temporal gaussian blur (ref GaussianBlurConv,
    utils/tools.py:156-182)."""
    rng = rng or np.random.default_rng()
    if rng.random() >= p:
        return pose
    s = rng.uniform(sigma[0], sigma[1])
    radius = kernel // 2
    idx = np.arange(-radius, radius + 1)
    w = np.exp(-idx.astype(np.float64) ** 2 / (2.0 * s ** 2))
    # the reference does NOT normalize the kernel; 'same' conv over time
    out = np.empty_like(pose, dtype=np.float64)
    c, t, v = pose.shape
    padded = np.pad(pose, ((0, 0), (radius, radius), (0, 0)))
    for k in range(len(idx)):
        if k == 0:
            acc = padded[:, k:k + t] * w[k]
        else:
            acc += padded[:, k:k + t] * w[k]
    out[:] = acc
    return out


def resample(pose: np.ndarray,
             rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """FFT time resampling to a random 0.7-1.3x rate
    (ref: utils/tools.py:210-214; scipy.signal.resample equivalent)."""
    rng = rng or np.random.default_rng()
    rate = int(rng.integers(7, 14)) * 0.1
    n = pose.shape[1]
    num = int(n * rate)
    spec = np.fft.rfft(pose, axis=1)
    new_spec = np.zeros((pose.shape[0], num // 2 + 1, pose.shape[2]),
                        dtype=spec.dtype)
    n_min = min(num, n)
    nyq = n_min // 2 + 1
    new_spec[:, :nyq] = spec[:, :nyq]
    if n_min % 2 == 0:  # Nyquist-component split/fold, as scipy does
        if num < n:
            new_spec[:, n_min // 2] *= 2.0
        elif num > n:
            new_spec[:, n_min // 2] *= 0.5
    return np.fft.irfft(new_spec, n=num, axis=1) * (num / n)


def limbs_mask(pose: np.ndarray, p: float = 0.5,
               rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Drop one body side's limb joints (NTU 25-joint indexing;
    ref: utils/tools.py:224-235)."""
    rng = rng or np.random.default_rng()
    if rng.random() < p:
        out = pose.copy()
        if rng.random() < 0.5:
            drop = [9, 10, 11, 17, 18, 19, 23, 24]
        else:
            drop = [5, 6, 7, 13, 14, 15, 21, 22]
        drop = [d for d in drop if d < pose.shape[2]]
        out[:, :, drop] = 0
        return out
    return pose


def temporal_shift(pose: np.ndarray,
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Circular time shift (ref: utils/tools.py:238-241)."""
    rng = rng or np.random.default_rng()
    offset = int(rng.integers(0, pose.shape[1]))
    return np.concatenate([pose[:, offset:], pose[:, :offset]], axis=1)


def strong_augment(pose: np.ndarray, padding_ratio: int = 6,
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """The reference's strong-aug chain for double_item
    (ref: utils/dataset.py:112-123): temporal crop, random rotate, gaussian
    noise, gaussian blur, axis mask, time flip."""
    rng = rng or np.random.default_rng()
    pose = temporal_crop(pose, padding_ratio, rng=rng)
    pose = random_rotate(pose, rng=rng)
    pose = gaussian_noise(pose, rng=rng)
    pose = gaussian_blur(pose, rng=rng)
    pose = axis_mask(pose, rng=rng)
    pose = random_time_flip(pose, rng=rng)
    return np.ascontiguousarray(pose)

"""Frame selection and input assembly for the conditioning strategies.

Behavioural counterpart of models/mocodad.py:523-543 (`_cut_array_from_indices`),
:654-686 (`_prepare_input_data`), :708-750 (`_select_frames`) and the
corrupt-frame extraction in `_unet_forward` (:811-840).

The reference assembles boolean masks on the CPU ("indexing ... fails on
GPU", models/mocodad.py:673-683) — a host round-trip in the hot sampling
loop.  Here selection/assembly are pure gathers with a per-batch frame
ORDER array: order[:, :n_cond] holds the (sorted) conditioning positions,
order[:, n_cond:] the (sorted) corrupted positions.  Assembling the full
window is a gather with the inverse order; extracting the corrupted frames
is a gather with order[:, n_cond:].  Everything stays on device and is
trivially vmap/scan-compatible.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def static_order(cond_idxs: Tuple[int, ...], corrupt_idxs: Tuple[int, ...]
                 ) -> np.ndarray:
    """(T,) order for the deterministic strategies.

    Host (numpy) on purpose: it is a compile-time gather pattern, and a
    device-resident constant would be fetched back through the device
    transport at every cold-process lowering (see DiffusionSchedule)."""
    return np.asarray(tuple(cond_idxs) + tuple(corrupt_idxs), dtype=np.int32)


def random_order(rng: jax.Array, batch: int, n_frames: int, n_cond: int
                 ) -> jnp.ndarray:
    """(B, T) per-example random conditioning subsets (random_imp).

    Mirrors models/mocodad.py:719-724: a random permutation marks which
    positions condition; both groups are then used in sorted position order
    (the reference's boolean-mask indexing preserves position order).
    """
    def one(key):
        perm = jax.random.permutation(key, n_frames)
        # positions whose perm-value < n_cond are conditioning frames
        is_cond = perm < n_cond
        pos = jnp.arange(n_frames)
        # stable sort key: conditioning positions first (in order), then rest
        key_ = jnp.where(is_cond, pos, n_frames + pos)
        return jnp.argsort(key_).astype(jnp.int32)
    return jax.vmap(one)(jax.random.split(rng, batch))


def _gather_frames(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather frames (axis 2 of (B, C, T, V)) by static (K,) or per-batch
    (B, K) indices."""
    if idx.ndim == 1:
        return jnp.take(x, idx, axis=2)
    return jnp.take_along_axis(x, idx[:, None, :, None], axis=2)


def select_frames(data: jnp.ndarray, order: jnp.ndarray, n_cond: int
                  ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """Split (B, C, T, V) into (conditioning, corrupted) frame groups."""
    if n_cond == 0:
        return None, data
    cond = _gather_frames(data, order[..., :n_cond])
    corrupt = _gather_frames(data, order[..., n_cond:])
    return cond, corrupt


def assemble_input(strategy: str, cond: Optional[jnp.ndarray],
                   corrupt: jnp.ndarray, order: jnp.ndarray, n_cond: int
                   ) -> jnp.ndarray:
    """Build the U-Net input (ref `_prepare_input_data`,
    models/mocodad.py:654-686)."""
    if strategy == 'concat':
        # conditioning frames first, regardless of their positions
        # (ref :668-669)
        return jnp.concatenate([cond, corrupt], axis=2)
    if strategy in ('inject', 'no_condition'):
        return corrupt
    if strategy in ('random_imp', 'inbetween_imp'):
        stacked = jnp.concatenate([cond, corrupt], axis=2)
        inv = jnp.argsort(order, axis=-1).astype(jnp.int32)
        return _gather_frames(stacked, inv)
    raise ValueError(f'unknown strategy {strategy}')


def extract_corrupt(strategy: str, prediction: jnp.ndarray,
                    order: jnp.ndarray, n_cond: int) -> jnp.ndarray:
    """Keep only the corrupted-frame predictions (ref `_unet_forward`,
    models/mocodad.py:828-838)."""
    if strategy in ('inject', 'no_condition'):
        return prediction
    return _gather_frames(prediction, order[..., n_cond:])

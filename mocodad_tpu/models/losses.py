"""Elementwise losses and sample-aggregation strategies.

Loss zoo mirrors models/mocodad.py:24 (l1 / smooth_l1 / mse, all built with
reduction='none' and averaged by the caller).  Aggregation mirrors
`_aggregation_strategy` (models/mocodad.py:454-520) but operates on a
stacked (S, B, ...) tensor of generated samples on device instead of a
Python list, so selection fuses into the sampling program.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def elementwise_loss(kind: str, pred: jnp.ndarray, target: jnp.ndarray
                     ) -> jnp.ndarray:
    if kind == 'l1':
        return jnp.abs(pred - target)
    if kind == 'mse':
        return jnp.square(pred - target)
    if kind == 'smooth_l1':
        # torch.nn.SmoothL1Loss with beta=1.0
        d = jnp.abs(pred - target)
        return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
    raise ValueError(f'unknown loss {kind!r}')


def _lower_median(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """torch.median semantics: for even counts, the LOWER of the two middle
    values (jnp.median would average them)."""
    n = x.shape[axis]
    return jnp.sort(x, axis=axis).take(indices=(n - 1) // 2, axis=axis)


def per_sample_losses(kind: str, xs: jnp.ndarray, target: jnp.ndarray
                      ) -> jnp.ndarray:
    """(S, B, ...) generated samples vs (B, ...) target -> (S, B) mean loss
    per sample (ref models/mocodad.py:483-485)."""
    l = elementwise_loss(kind, xs, target[None])
    return l.reshape(l.shape[0], l.shape[1], -1).mean(axis=-1)


def selects_pose(strategy: str) -> bool:
    """Whether aggregate() returns a selected pose for this strategy
    (selected_x is None for the loss-only ones, as in the reference)."""
    return not (strategy in ('mean', 'median')
                or strategy.startswith('quantile'))


def aggregate(strategy: str, loss_kind: str, xs: jnp.ndarray,
              target: jnp.ndarray, rng: Optional[jax.Array] = None
              ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray]:
    """Select a sample / loss per window from S generations.

    xs: (S, B, ...); target: (B, ...).  Returns (selected_x, loss) where
    selected_x is None for the loss-only strategies (as in the reference).
    For 'all', selected_x is (B, S, ...) and loss is (B, S).

    'random' in the reference returns a bare tensor that would crash the
    caller (models/mocodad.py:480-481); here it selects one sample uniformly
    and returns (sample, its loss) — documented fix.
    """
    s = xs.shape[0]
    losses = per_sample_losses(loss_kind, xs, target)  # (S, B)

    if strategy == 'all':
        sel = jnp.moveaxis(xs, 0, 1)
        return sel, jnp.moveaxis(losses, 0, 1)
    if strategy == 'mean':
        return None, losses.mean(axis=0)
    if strategy == 'mean_pose':
        sel = xs.mean(axis=0)
        l = elementwise_loss(loss_kind, sel, target)
        return sel, l.reshape(l.shape[0], -1).mean(axis=-1)
    if strategy == 'median':
        return None, _lower_median(losses, axis=0)
    if strategy == 'median_pose':
        sel = _lower_median(xs, axis=0)
        l = elementwise_loss(loss_kind, sel, target)
        return sel, l.reshape(l.shape[0], -1).mean(axis=-1)
    if strategy in ('best', 'worst'):
        # the reference's running-comparison loop (models/mocodad.py:
        # 504-512) never selects a NaN loss (strict </> against a large
        # sentinel); a bare argmin/argmax would propagate the NaN into the
        # window's anomaly score — mask NaN to the neutral infinity
        ls = jnp.where(jnp.isnan(losses),
                       jnp.inf if strategy == 'best' else -jnp.inf, losses)
        idx = jnp.argmin(ls, axis=0) if strategy == 'best' \
            else jnp.argmax(ls, axis=0)
        loss = jnp.take_along_axis(ls, idx[None], axis=0)[0]
        sel = jnp.take_along_axis(
            xs, idx.reshape((1, -1) + (1,) * (xs.ndim - 2)), axis=0)[0]
        return sel, loss
    if strategy.startswith('quantile'):
        q = float(strategy.split(':')[-1])
        return None, jnp.quantile(losses, q, axis=0)
    if strategy == 'random':
        if rng is None:
            raise ValueError("aggregation 'random' needs an rng")
        idx = jax.random.randint(rng, (losses.shape[1],), 0, s)
        loss = jnp.take_along_axis(losses, idx[None], axis=0)[0]
        sel = jnp.take_along_axis(
            xs, idx.reshape((1, -1) + (1,) * (xs.ndim - 2)), axis=0)[0]
        return sel, loss
    raise ValueError(f'Unknown aggregation strategy {strategy}')

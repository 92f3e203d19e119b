"""Exponential moving average of parameters as a jitted pytree lerp.

Replaces the reference's EMACallback (utils/ema.py), which is broken as
shipped (its timm imports are commented out, utils/ema.py:10-11) and only
safe because configs set use_ema: false.  Decay matches timm
ModelEmaV2's default (0.9999).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    """Deep copy — the shadow tree must NOT alias the live params, or
    buffer donation in the train step donates the same buffer twice."""
    return jax.tree_util.tree_map(jnp.copy, params)


def ema_update(ema_params, params, decay: float = 0.9999):
    """Pure pytree lerp; call from inside a jitted step (a nested jit here
    would create a cross-module boundary that can deadlock collectives on
    multi-device meshes)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params)

"""Condition-encoder stacks and the latent-space MLP denoiser.

Behavioural counterpart of /root/reference/models/common/components.py
(Encoder :8-86, Decoder :91-164, Denoiser :203-291) as flax modules.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from mocodad_tpu.nn.init import torch_bias_for_fan_in, torch_linear_weight
from mocodad_tpu.nn.stsgcn import STGCNNLayer


def sinusoidal_pos_encoding(t: jnp.ndarray, channels: int) -> jnp.ndarray:
    """Sinusoidal timestep embedding (ref: models/stsae/stsae_unet.py:161-179).

    t: (B,) or (B, 1) float; returns (B, channels) = [sin(t*f), cos(t*f)].
    """
    t = t.reshape(-1, 1).astype(jnp.float32)
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, channels, 2,
                                           dtype=jnp.float32) / channels))
    ang = t * inv_freq  # (B, channels//2)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class Encoder(nn.Module):
    """Stack of ST-GCNN layers: channels layer_channels + [hidden_dimension]
    (ref: models/common/components.py:41-86)."""
    input_dim: int
    layer_channels: Sequence[int]
    hidden_dimension: int
    n_frames: int
    n_joints: int
    dropout: float
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: Optional[jnp.ndarray] = None,
                 *, train: bool = False) -> jnp.ndarray:
        channels = list(self.layer_channels) + [self.hidden_dimension]
        c_in = self.input_dim
        for i, c_out in enumerate(channels):
            x = STGCNNLayer(in_channels=c_in, out_channels=c_out,
                            time_dim=self.n_frames, joints_dim=self.n_joints,
                            dropout=self.dropout, bias=self.bias,
                            name=f'layer_{i}')(x, t_emb, train=train)
            c_in = c_out
        return x


class Decoder(nn.Module):
    """Mirrored stack: reversed(layer_channels) + [output_dim]
    (ref: models/common/components.py:124-164)."""
    output_dim: int
    layer_channels: Sequence[int]
    hidden_dimension: int
    n_frames: int
    n_joints: int
    dropout: float
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: Optional[jnp.ndarray] = None,
                 *, train: bool = False) -> jnp.ndarray:
        channels = list(self.layer_channels)[::-1] + [self.output_dim]
        c_in = self.hidden_dimension
        for i, c_out in enumerate(channels):
            x = STGCNNLayer(in_channels=c_in, out_channels=c_out,
                            time_dim=self.n_frames, joints_dim=self.n_joints,
                            dropout=self.dropout, bias=self.bias,
                            name=f'layer_{i}')(x, t_emb, train=train)
            c_in = c_out
        return x


class Denoiser(nn.Module):
    """Conditioned MLP denoiser for latent diffusion
    (ref: models/common/components.py:203-291).

    Per layer: Linear (+BN+ReLU except last), then an additive projection of
    (sinusoidal time embedding + condition).
    """
    input_size: int
    hidden_sizes: Sequence[int]
    cond_size: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 cond: Optional[jnp.ndarray] = None,
                 *, train: bool = False) -> jnp.ndarray:
        emb = sinusoidal_pos_encoding(t, self.cond_size)
        c = emb + cond if cond is not None else emb

        n_layers = len(self.hidden_sizes)
        size_in = self.input_size
        for i, size_out in enumerate(self.hidden_sizes):
            wk = self.param(f'w{i}_kernel', torch_linear_weight,
                            (size_in, size_out))
            wb = (self.param(f'w{i}_bias', torch_bias_for_fan_in(size_in),
                             (size_out,)) if self.bias else None)
            x = x @ wk + (wb if wb is not None else 0.0)
            if i != n_layers - 1:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 axis=-1, name=f'bn{i}')(x)
                x = nn.relu(x)
            ck = self.param(f'c{i}_kernel', torch_linear_weight,
                            (self.cond_size, size_out))
            cb = (self.param(f'c{i}_bias',
                             torch_bias_for_fan_in(self.cond_size),
                             (size_out,)) if self.bias else None)
            x = x + (c @ ck + (cb if cb is not None else 0.0))
            size_in = size_out
        return x

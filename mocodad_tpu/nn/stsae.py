"""STS-GCN condition encoders: STSE (encoder-only) and STSAE (autoencoder).

Behavioural counterpart of /root/reference/models/stsae/stsae.py.  The
reference's encode() performs a permute/reshape round-trip with a phantom
M=1 "figures" axis (stsae.py:72-77) that is an identity on (N, C, T, V);
we omit it.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mocodad_tpu.nn.components import Decoder, Encoder
from mocodad_tpu.nn.init import torch_bias_for_fan_in, torch_linear_weight


class STSE(nn.Module):
    """Encoder + flatten + linear bottleneck -> latent
    (ref: models/stsae/stsae.py:9-107)."""
    c_in: int
    h_dim: int = 32
    latent_dim: int = 64
    n_frames: int = 12
    n_joints: int = 17
    layer_channels: Sequence[int] = (128, 64, 128)
    dropout: float = 0.3

    def setup(self):
        self.encoder = Encoder(input_dim=self.c_in,
                               layer_channels=self.layer_channels,
                               hidden_dimension=self.h_dim,
                               n_frames=self.n_frames,
                               n_joints=self.n_joints,
                               dropout=self.dropout)
        self.flat_dim = self.h_dim * self.n_frames * self.n_joints
        self.btlnk_kernel = self.param('btlnk_kernel', torch_linear_weight,
                                       (self.flat_dim, self.latent_dim))
        self.btlnk_bias = self.param('btlnk_bias',
                                     torch_bias_for_fan_in(self.flat_dim),
                                     (self.latent_dim,))

    def encode(self, x: jnp.ndarray, t_emb: Optional[jnp.ndarray] = None,
               *, train: bool = False) -> jnp.ndarray:
        assert x.ndim == 4  # (N, C, T, V)
        h = self.encoder(x, t_emb, train=train)
        h = h.reshape(h.shape[0], -1)
        return h @ self.btlnk_kernel + self.btlnk_bias

    def __call__(self, x: jnp.ndarray, t_emb: Optional[jnp.ndarray] = None,
                 *, train: bool = False
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        return self.encode(x, t_emb, train=train), None


class STSAE(STSE):
    """STSE + mirrored decoder; returns (latent, reconstruction)
    (ref: models/stsae/stsae.py:112-188)."""

    def setup(self):
        super().setup()
        self.decoder = Decoder(output_dim=self.c_in,
                               layer_channels=self.layer_channels,
                               hidden_dimension=self.h_dim,
                               n_frames=self.n_frames,
                               n_joints=self.n_joints,
                               dropout=self.dropout)
        self.rev_btlnk_kernel = self.param(
            'rev_btlnk_kernel', torch_linear_weight,
            (self.latent_dim, self.flat_dim))
        self.rev_btlnk_bias = self.param(
            'rev_btlnk_bias', torch_bias_for_fan_in(self.latent_dim),
            (self.flat_dim,))

    def decode(self, z: jnp.ndarray, t_emb: Optional[jnp.ndarray] = None,
               *, train: bool = False) -> jnp.ndarray:
        h = z @ self.rev_btlnk_kernel + self.rev_btlnk_bias
        h = h.reshape(-1, self.h_dim, self.n_frames, self.n_joints)
        return self.decoder(h, t_emb, train=train)

    def __call__(self, x: jnp.ndarray, t_emb: Optional[jnp.ndarray] = None,
                 *, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.encode(x, train=train)
        rec = self.decode(z, t_emb, train=train)
        return z, rec

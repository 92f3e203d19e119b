"""Space-time-separable U-Net over the joints dimension.

Behavioural counterpart of /root/reference/models/stsae/stsae_unet.py:
a down path of ST-GCNN stacks at shrinking joint counts (a -> b -> c via
dense joint-mix layers), an up path with skip residuals, sinusoidal time
embedding with optional injected conditioning, and an optional flat linear
latent head / bottleneck.

TPU notes: the reference hardcodes the joint pyramid to 17/12/10/8
(stsae_unet.py:11) and crashes for headless(14)/kp18(18) inputs; here level
'a' is n_joints so every config shipped with the reference works, while the
17-joint case is exactly the reference pyramid.  All joint re-scalings are
dense contractions in the native (N, C, T, V) layout (see JointMixLayer),
so the whole network lowers to a chain of MXU matmuls with no layout
shuffles.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mocodad_tpu.nn.components import sinusoidal_pos_encoding
from mocodad_tpu.nn.init import torch_bias_for_fan_in, torch_linear_weight
from mocodad_tpu.nn.stsgcn import JointMixLayer, STGCNNLayer


def joint_pyramid(n_joints: int) -> dict:
    """Joint counts per U-Net level (ref: stsae_unet.py:11, generalized so
    level 'a' follows the input's joint count).  'd' mirrors the
    reference's dict for documentation; no 4th level exists — the U-Net
    descends a -> b -> c (as in the reference)."""
    return {'a': n_joints, 'b': 12, 'c': 10, 'd': 8}


class STSEUnet(nn.Module):
    """Downscaling half (encoder) of the U-Net
    (ref: models/stsae/stsae_unet.py:8-249)."""
    c_in: int
    embedding_dim: Optional[int] = 256
    latent_dim: int = 64
    n_frames: int = 12
    n_joints: int = 17
    unet_down_channels: Sequence[int] = (16, 32, 32, 64, 64, 128, 6)
    dropout: float = 0.3
    set_out_layer: bool = True

    def _gcn(self, c_in, c_out, joints, name):
        return STGCNNLayer(in_channels=c_in, out_channels=c_out,
                           time_dim=self.n_frames, joints_dim=joints,
                           dropout=self.dropout, emb_dim=self.embedding_dim,
                           name=name)

    def setup(self):
        jp = joint_pyramid(self.n_joints)
        ch = list(self.unet_down_channels)
        self.p1a = self._gcn(self.c_in, ch[0], jp['a'], 'p1a')
        self.d1_0 = self._gcn(ch[0], ch[1], jp['a'], 'd1_0')
        self.d1_1 = self._gcn(ch[1], ch[2], jp['a'], 'd1_1')
        self.d2_0 = self._gcn(ch[2], ch[3], jp['b'], 'd2_0')
        self.d2_1 = self._gcn(ch[3], ch[4], jp['b'], 'd2_1')
        self.d3_0 = self._gcn(ch[4], ch[5], jp['c'], 'd3_0')
        self.d3_1 = self._gcn(ch[5], ch[6], jp['c'], 'd3_1')
        self.down1 = JointMixLayer(jp['a'], jp['b'], self.dropout,
                                   name='down1')
        self.down2 = JointMixLayer(jp['b'], jp['c'], self.dropout,
                                   name='down2')
        self._flat_dim = ch[6] * self.n_frames * jp['c']
        if self.set_out_layer or getattr(self, 'use_bottleneck', False):
            self.to_time_dim_kernel = self.param(
                'to_time_dim_kernel', torch_linear_weight,
                (self._flat_dim, self.latent_dim))
            self.to_time_dim_bias = self.param(
                'to_time_dim_bias', torch_bias_for_fan_in(self._flat_dim),
                (self.latent_dim,))

    def time_embedding(self, t: Optional[jnp.ndarray],
                       condition: Optional[jnp.ndarray]
                       ) -> Optional[jnp.ndarray]:
        """Encode integer timesteps; add conditioning embedding if given
        (ref: stsae_unet.py:235-241, 420-426)."""
        if t is None or self.embedding_dim is None:
            return None
        emb = sinusoidal_pos_encoding(t, self.embedding_dim)
        if condition is not None:
            emb = emb + condition
        return emb

    def downscale(self, x: jnp.ndarray, t_emb: Optional[jnp.ndarray],
                  *, train: bool
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        f = self.p1a(x, t_emb, train=train)
        f = self.d1_0(f, t_emb, train=train)
        f = self.d1_1(f, t_emb, train=train)
        d1 = f
        f = self.down1(f, train=train)
        f = self.d2_0(f, t_emb, train=train)
        f = self.d2_1(f, t_emb, train=train)
        d2 = f
        f = self.down2(f, train=train)
        f = self.d3_0(f, t_emb, train=train)
        f = self.d3_1(f, t_emb, train=train)
        return f, d1, d2

    def out_layer(self, f: jnp.ndarray) -> jnp.ndarray:
        f = f.reshape(f.shape[0], -1)
        return f @ self.to_time_dim_kernel + self.to_time_dim_bias

    def __call__(self, x: jnp.ndarray, t: Optional[jnp.ndarray] = None,
                 condition: Optional[jnp.ndarray] = None,
                 *, train: bool = False) -> Tuple[jnp.ndarray, List]:
        t_emb = self.time_embedding(t, condition)
        f, _, _ = self.downscale(x, t_emb, train=train)
        if self.set_out_layer:
            f = self.out_layer(f)
        return f, []


class STSAEUnet(STSEUnet):
    """Full U-Net: down path + up path with skip residuals
    (ref: models/stsae/stsae_unet.py:254-438).

    The final up channel equals c_in so the terminal +X residual is valid
    (the reference hardcodes 2; identical for all shipped configs where
    num_coords == 2)."""
    unet_down_channels: Sequence[int] = (16, 32, 32, 64, 64, 128, 64)
    unet_up_channels: Optional[Sequence[int]] = None
    inject_condition: bool = False
    use_bottleneck: bool = False
    set_out_layer: bool = False  # superseded by use_bottleneck

    def setup(self):
        super().setup()
        jp = joint_pyramid(self.n_joints)
        up = (list(self.unet_up_channels) if self.unet_up_channels is not None
              else [64, 32, 32, self.c_in])
        dn = list(self.unet_down_channels)
        self.u4_0 = self._gcn(dn[-1], up[0], jp['b'], 'u4_0')
        self.u4_1 = self._gcn(up[0], up[1], jp['b'], 'u4_1')
        self.u3_0 = self._gcn(up[1], up[2], jp['a'], 'u3_0')
        self.u3_1 = self._gcn(up[2], up[3], jp['a'], 'u3_1')
        self.up2 = JointMixLayer(jp['b'], jp['a'], self.dropout, name='up2')
        self.up3 = JointMixLayer(jp['c'], jp['b'], self.dropout, name='up3')
        self._bottleneck_shape = (dn[6], self.n_frames, jp['c'])
        if self.use_bottleneck:
            self.rev_to_time_dim_kernel = self.param(
                'rev_to_time_dim_kernel', torch_linear_weight,
                (self.latent_dim, self._flat_dim))
            self.rev_to_time_dim_bias = self.param(
                'rev_to_time_dim_bias', torch_bias_for_fan_in(self.latent_dim),
                (self._flat_dim,))

    def bottleneck(self, f: jnp.ndarray) -> jnp.ndarray:
        """Flat latent round-trip (ref: stsae_unet.py:359-361, 430-434)."""
        f = self.out_layer(f)
        f = f @ self.rev_to_time_dim_kernel + self.rev_to_time_dim_bias
        return f.reshape(-1, *self._bottleneck_shape)

    def upscale(self, x, f, d1, d2, t_emb, *, train: bool) -> jnp.ndarray:
        f = self.up3(f, train=train)
        f = f + d2
        f = self.u4_0(f, t_emb, train=train)
        f = self.u4_1(f, t_emb, train=train)
        f = self.up2(f, train=train)
        f = f + d1
        f = self.u3_0(f, t_emb, train=train)
        f = self.u3_1(f, t_emb, train=train)
        return f + x

    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 condition: Optional[jnp.ndarray] = None,
                 *, train: bool = False) -> Tuple[jnp.ndarray, List]:
        emb = sinusoidal_pos_encoding(t, self.embedding_dim)
        if self.inject_condition and condition is not None:
            emb = emb + condition
        f, d1, d2 = self.downscale(x, emb, train=train)
        if self.use_bottleneck:
            f = self.bottleneck(f)
        f = self.upscale(x, f, d1, d2, emb, train=train)
        return f, []

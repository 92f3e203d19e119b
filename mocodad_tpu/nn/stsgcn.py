"""Space-Time-Separable GCN building blocks, TPU-first.

Behavioural counterpart of /root/reference/models/gcae/stsgcn.py, with one
structural redesign: the reference applies two skinny einsums per layer
(`nctv,vtq->ncqv` then `nctv,tvw->nctw`, stsgcn.py:154-155) whose contraction
dims are T<=24 and V<=18 — far below the 128x128 MXU tile.  Because the
time-mix and joint-mix compose linearly over the (t, v) plane, we fold them
into ONE dense (T*V, T*V) operator K:

    Y[n,c,q,w] = sum_{t,v} X[n,c,t,v] * Tm[v,t,q] * A[q,v,w]
               = reshape(X, (N*C, T*V)) @ K,   K[(t,v),(q,w)] = Tm[v,t,q]*A[q,v,w]

so the hot op is a (N*C, T*V) x (T*V, T*V) matmul (T*V ~ 102 for the default
6x17 window — one MXU tile) instead of 2*V + 2*T tiny ones.  Building K costs
O(T^2 V^2) flops per layer call — negligible, and differentiable, so A/Tm
keep the reference's parameterization and gradients.

Layout is channels-first (N, C, T, V) like the reference; 1x1 convs are
expressed as dense contractions over the feature axis (MXU-native) rather
than conv ops.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mocodad_tpu.nn.init import (adjacency_init, torch_bias_for_fan_in,
                                 torch_linear_weight)


def graph_mix_reference(x: jnp.ndarray, tm: jnp.ndarray, a: jnp.ndarray
                        ) -> jnp.ndarray:
    """The reference's two-einsum form (stsgcn.py:154-155); used as the
    numerical oracle in tests and as a fallback path."""
    x = jnp.einsum('nctv,vtq->ncqv', x, tm)
    x = jnp.einsum('nctv,tvw->nctw', x, a)
    return x


def compose_graph_operator(tm: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Fold (time-mix Tm, joint-mix A) into one (T*V, T*V) matrix.

    Row index is the input (t, v) pair, column index the output (q, w) pair,
    both flattened C-order to match reshape(N, C, T*V)."""
    t_dim, v_dim = a.shape[0], a.shape[1]
    k = jnp.einsum('vtq,qvw->tvqw', tm, a)
    return k.reshape(t_dim * v_dim, t_dim * v_dim)


class ConvTemporalGraphical(nn.Module):
    """Learnable dense space-time adjacency mix
    (ref: models/gcae/stsgcn.py:120-156)."""
    time_dim: int
    joints_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        t_dim, v_dim = self.time_dim, self.joints_dim
        # A: (T, V, V) with U(+-1/sqrt(V)); Tm: (V, T, T) with U(+-1/sqrt(T)).
        a = self.param('A', adjacency_init(1), (t_dim, v_dim, v_dim))
        tm = self.param('T', adjacency_init(1), (v_dim, t_dim, t_dim))
        k = compose_graph_operator(tm, a)
        n, c = x.shape[0], x.shape[1]
        y = x.reshape(n, c, t_dim * v_dim) @ k
        return y.reshape(n, c, t_dim, v_dim)


def _dense_over_axis(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: Optional[jnp.ndarray], axis: int) -> jnp.ndarray:
    """Apply y[..., o, ...] = sum_i x[..., i, ...] * kernel[i, o] over `axis`."""
    x = jnp.moveaxis(x, axis, -1)
    y = x @ kernel
    if bias is not None:
        y = y + bias
    return jnp.moveaxis(y, -1, axis)


class STGCNNLayer(nn.Module):
    """Space-time GCN layer: graph mix -> 1x1 conv + BN + dropout ->
    residual -> PReLU -> optional additive time embedding
    (ref: models/gcae/stsgcn.py:9-116).

    Input/output layout (N, C, T, V); feature (BN) axis is 1.
    """
    in_channels: int
    out_channels: int
    time_dim: int
    joints_dim: int
    dropout: float
    kernel_size: Sequence[int] = (1, 1)
    stride: int = 1
    bias: bool = True
    emb_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: Optional[jnp.ndarray] = None,
                 *, train: bool = False) -> jnp.ndarray:
        assert self.kernel_size[0] % 2 == 1 and self.kernel_size[1] % 2 == 1
        if tuple(self.kernel_size) != (1, 1) or self.stride != 1:
            raise NotImplementedError(
                'All reference call sites use kernel (1,1), stride 1 '
                '(models/stsae/stsae_unet.py:58-59); larger kernels are not '
                'wired up in this rebuild.')

        # Residual branch (ref stsgcn.py:69-80): identity when shapes match,
        # else 1x1 conv + BN.
        if self.in_channels == self.out_channels:
            res = x
        else:
            rk = self.param('residual_kernel', torch_linear_weight,
                            (self.in_channels, self.out_channels))
            rb = (self.param('residual_bias',
                             torch_bias_for_fan_in(self.in_channels),
                             (self.out_channels,)) if self.bias else None)
            res = _dense_over_axis(x, rk, rb, axis=1)
            res = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               axis=1, name='residual_bn')(res)

        # Graph mix then 1x1 "tcn" conv + BN + dropout (ref stsgcn.py:54-67).
        y = ConvTemporalGraphical(self.time_dim, self.joints_dim,
                                  name='gcn')(x)
        tk = self.param('tcn_kernel', torch_linear_weight,
                        (self.in_channels, self.out_channels))
        tb = (self.param('tcn_bias', torch_bias_for_fan_in(self.in_channels),
                         (self.out_channels,)) if self.bias else None)
        y = _dense_over_axis(y, tk, tb, axis=1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis=1, name='tcn_bn')(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)

        y = y + res
        # PReLU with a single shared slope, torch-init 0.25.
        y = nn.PReLU(negative_slope_init=0.25)(y)

        if self.emb_dim is not None and t_emb is not None:
            # SiLU -> Linear(emb_dim -> out_channels), broadcast over (T, V)
            # (ref stsgcn.py:84-91, 112-114).
            ek = self.param('emb_kernel', torch_linear_weight,
                            (self.emb_dim, self.out_channels))
            eb = self.param('emb_bias', torch_bias_for_fan_in(self.emb_dim),
                            (self.out_channels,))
            emb = jax.nn.silu(t_emb) @ ek + eb
            # cast: the sinusoidal embedding path runs in f32; adding it
            # raw would promote a bf16 activation chain back to f32
            y = y + emb.astype(y.dtype)[:, :, None, None]
        return y


class JointMixLayer(nn.Module):
    """Joint-dimension up/down-scaling: dense map over V + BN + dropout.

    Counterpart of the reference's `CNN_layer` (models/gcae/stsgcn.py:161-199),
    which permutes to (N, V, C, T) and runs a 1x1 Conv2d over the joints
    "channel".  Here it is a single dense contraction over the last axis of
    the native (N, C, T, V) layout — no transposes materialized.
    BatchNorm normalizes per output joint over (N, C, T), matching the
    reference's BatchNorm2d(out_joints) on the permuted layout.
    """
    in_joints: int
    out_joints: int
    dropout: float
    bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        k = self.param('kernel', torch_linear_weight,
                       (self.in_joints, self.out_joints))
        b = (self.param('bias', torch_bias_for_fan_in(self.in_joints),
                        (self.out_joints,)) if self.bias else None)
        y = x @ k
        if b is not None:
            y = y + b
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis=-1)(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y

"""Flattened eval-mode U-Net forward (the sampling hot path).

Runs the denoiser as a flat chain of einsums on a logical (T*V, N, C)
activation tensor with all BatchNorms folded to eval-mode scale/shift
constants and the graph mix pre-composed into one (T*V, T*V) operator per
layer.  Versus the module forward (nn/unet.py) this removes flax apply
overhead per scan step and gives XLA one flat jaxpr to fuse.

Layout lesson (measured on v5e): contractions must be expressed as
einsums over the LOGICAL 3-D tensor — dot_general reads "transposed"
operands for free via dimension numbers, whereas forcing 2-D reshapes
like (TV, N*C) <-> (TV*N, C) makes XLA materialize physical tile
relayouts each layer, which is ~6x SLOWER despite being "pure reshapes"
on paper.

Association lesson (measured, tools/perf/probe_assoc.py): the per-layer
dot pair is associative — (K @ X) @ W == K @ (X @ W) — so layers whose
channel mix NARROWS (C_out < C_in: d3_1 128->64, u4_1 64->32, u3_1
32->2 on the flagship schedule) run channel-mix-first, putting the TV^2
graph dot on the narrow side: ~14% fewer layer-dot FLOPs and the three
largest fusion-boundary intermediates shrink (u3_1's by 16x).  Exact in
real f32 (CPU max|delta| 1e-7); on the MXU the two associations differ
by default-precision bf16 rounding only.

Joint down/up-scaling becomes a block-diagonal operator
D[(t,v),(t,w)] = M[v,w]; its per-joint BatchNorm becomes a per-row
scale/shift.  The time/condition embedding adds per (N, C_out).

Numerical parity with the module forward is tested in
tests/test_fast_unet.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mocodad_tpu.nn.components import sinusoidal_pos_encoding
from mocodad_tpu.nn.stsgcn import compose_graph_operator


def _fold_bn(bn_params: Dict, bn_stats: Dict, eps: float = 1e-5):
    """Running-stat BatchNorm -> (scale, shift)."""
    var = bn_stats['var']
    mean = bn_stats['mean']
    scale = bn_params['scale'] / jnp.sqrt(var + eps)
    shift = bn_params['bias'] - mean * scale
    return scale, shift


def _block_diag_joint_mix(kernel: jnp.ndarray, t_dim: int) -> jnp.ndarray:
    """(V_in, V_out) joint-mix kernel -> (T*V_in, T*V_out) block-diagonal
    left operator."""
    v_in, v_out = kernel.shape
    eye = jnp.eye(t_dim, dtype=kernel.dtype)
    # D[(t,v),(s,w)] = eye[t,s] * kernel[v,w]
    d = jnp.einsum('ts,vw->tvsw', eye, kernel)
    return d.reshape(t_dim * v_in, t_dim * v_out)


class _Layer:
    """Precomputed constants for one ST-GCNN layer in graph-major form."""

    def __init__(self, p: Dict, s: Dict, channel_first: bool = False):
        # left operator: K^T so that  out = K_T @ X  ((TV_out, TV_in) @ ...)
        self.k_t = compose_graph_operator(p['gcn']['T'], p['gcn']['A']).T
        # (K @ X) @ W == K @ (X @ W): when C_out < C_in, channel-mix-first
        # runs the TV^2 graph dot on the narrower channel count — fewer
        # FLOPs and a smaller fusion-boundary intermediate (exact algebra;
        # bf16 reassociation noise only, bounded by the parity tests).
        self.channel_first = channel_first and (
            p['tcn_kernel'].shape[1] < p['tcn_kernel'].shape[0])
        self.w = p['tcn_kernel']
        self.b = p.get('tcn_bias')
        self.bn_scale, self.bn_shift = _fold_bn(p['tcn_bn'], s['tcn_bn'])
        self.has_res = 'residual_kernel' in p
        if self.has_res:
            self.rw = p['residual_kernel']
            self.rb = p.get('residual_bias')
            self.rbn_scale, self.rbn_shift = _fold_bn(p['residual_bn'],
                                                      s['residual_bn'])
        self.prelu = p['PReLU_0']['negative_slope']
        self.has_emb = 'emb_kernel' in p
        if self.has_emb:
            self.ek, self.eb = p['emb_kernel'], p['emb_bias']

    def __call__(self, x: jnp.ndarray,
                 emb: Optional[jnp.ndarray]) -> jnp.ndarray:
        """x: (TV, N, C_in) -> (TV, N, C_out).

        Logical 3-D form throughout; contractions are expressed as einsums
        so XLA reads 'transposed' operands via dot_general dimension
        numbers instead of materializing tile relayouts."""
        dt = x.dtype
        # graph mix + channel mix: one fused contraction pair, associated
        # per-layer so the TV^2 dot sees min(C_in, C_out) channels
        if self.channel_first:
            y = jnp.einsum('xnc,co->xno', x, self.w.astype(dt))
            y = jnp.einsum('kx,xno->kno', self.k_t.astype(dt), y)
        else:
            y = jnp.einsum('kx,xnc->knc', self.k_t.astype(dt), x)
            y = jnp.einsum('knc,co->kno', y, self.w.astype(dt))
        if self.b is not None:
            y = y + self.b.astype(dt)
        y = y * self.bn_scale.astype(dt) + self.bn_shift.astype(dt)

        if self.has_res:
            r = jnp.einsum('knc,co->kno', x, self.rw.astype(dt))
            if self.rb is not None:
                r = r + self.rb.astype(dt)
            r = r * self.rbn_scale.astype(dt) + self.rbn_shift.astype(dt)
        else:
            r = x
        y = y + r
        a = self.prelu.astype(dt)
        y = jnp.where(y >= 0, y, a * y)                  # PReLU

        if self.has_emb and emb is not None:
            e = jax.nn.silu(emb) @ self.ek + self.eb     # (N, C_out), f32
            y = y + e.astype(dt)[None]
        return y


class _JointMix:
    """Joint up/downscale + per-joint BN as a left operator + row affine."""

    def __init__(self, p: Dict, s: Dict, t_dim: int):
        self.d = _block_diag_joint_mix(p['kernel'], t_dim)
        v_out = p['kernel'].shape[1]
        # bias and BN act per output joint w -> per-row over (t, w)
        bn_scale, bn_shift = _fold_bn(p['BatchNorm_0'], s['BatchNorm_0'])
        bias = p.get('bias', jnp.zeros(v_out, self.d.dtype))
        self.row_scale = jnp.tile(bn_scale, t_dim)       # (T*V_out,)
        self.row_shift = jnp.tile(bias * bn_scale + bn_shift, t_dim)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = x.dtype
        y = jnp.einsum('kx,xnc->knc', self.d.T.astype(dt), x)
        return (y * self.row_scale.astype(dt)[:, None, None]
                + self.row_shift.astype(dt)[:, None, None])


def build_fast_denoiser(params: Dict, batch_stats: Dict, *, c_in: int,
                        n_frames: int, n_joints: int, embedding_dim: int,
                        inject_condition: bool = False,
                        channel_first_when_narrowing: bool = True):
    """Build fn(x_nctv, t, cond_emb) -> eps_nctv from an STSAEUnet variables
    tree ('model' subtree of MoCoDADNet), numerically matching
    nn/unet.py:STSAEUnet.__call__ in eval mode.  Channel widths come from
    the weights themselves; `inject_condition` defaults to False to match
    STSAEUnet's default."""
    from mocodad_tpu.nn.unet import joint_pyramid

    jp = joint_pyramid(n_joints)
    p, s = params, batch_stats
    t_dim = n_frames

    def L(name):
        return _Layer(p[name], s[name],
                      channel_first=channel_first_when_narrowing)

    layers_a = [L('p1a'), L('d1_0'), L('d1_1')]
    down1 = _JointMix(p['down1'], s['down1'], t_dim)
    layers_b = [L('d2_0'), L('d2_1')]
    down2 = _JointMix(p['down2'], s['down2'], t_dim)
    layers_c = [L('d3_0'), L('d3_1')]
    up3 = _JointMix(p['up3'], s['up3'], t_dim)
    layers_u4 = [L('u4_0'), L('u4_1')]
    up2 = _JointMix(p['up2'], s['up2'], t_dim)
    layers_u3 = [L('u3_0'), L('u3_1')]

    def fn(x_nctv: jnp.ndarray, t: jnp.ndarray,
           cond_emb: Optional[jnp.ndarray]) -> jnp.ndarray:
        n = x_nctv.shape[0]
        dt = x_nctv.dtype
        emb = sinusoidal_pos_encoding(t, embedding_dim)
        if inject_condition and cond_emb is not None:
            emb = emb + cond_emb

        # (N, C, T, V) -> (T*V, N, C): logical transpose only
        x = jnp.transpose(x_nctv, (2, 3, 0, 1)).reshape(
            t_dim * jp['a'], n, c_in)

        f = x
        for l in layers_a:
            f = l(f, emb)
        d1 = f
        f = down1(f)
        for l in layers_b:
            f = l(f, emb)
        d2 = f
        f = down2(f)
        for l in layers_c:
            f = l(f, emb)
        f = up3(f) + d2
        for l in layers_u4:
            f = l(f, emb)
        f = up2(f) + d1
        for l in layers_u3:
            f = l(f, emb)
        f = f + x

        out = f.reshape(t_dim, jp['a'], n, c_in)
        return jnp.transpose(out, (2, 3, 0, 1))

    return fn

"""Pallas TPU megakernel: one fused denoise forward per batch tile.

The sampling loop is HBM-bandwidth-bound under XLA: every layer's
intermediates round-trip to HBM (measured ~2-4k windows/s on v5e).  This
kernel runs the ENTIRE eval-mode U-Net on an (NB, T*V, C) batch tile with
every intermediate — graph mixes, channel mixes, folded BatchNorms,
residuals, PReLUs, skip tensors, time/condition embedding adds — resident
in VMEM.  HBM traffic per denoise step collapses to: read x tile + read
silu(embedding) tile + write eps tile (+ the sub-1MB weight stacks).

Mosaic-portability notes (probed on v5e):
  * graph/joint mixes: `lax.dot_general((NB, TVi, C), (TVi, TVo))`
    contracting the lhs MIDDLE dim is supported -> (NB, C, TVo), followed
    by a supported `swapaxes(1, 2)`;
  * channel mixes: sublane-merging reshape (NB, TV, C) -> (NB*TV, C) then
    a plain 2-D dot;
  * lane-merging reshapes and rank-3 einsums are NOT supported — avoided.

Per-layer weights are stacked into a few padded buffers (pad -> max dims)
and statically sliced to their true shapes inside the kernel, so operand
count stays small and no padded FLOPs are executed.

Covers the main MoCoDAD config family (STSAEUnet, inject conditioning);
`model.generate` falls back to the XLA fast path otherwise.  Numerical
parity with the module forward is tested in tests/test_pallas_unet.py
(interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mocodad_tpu.nn.stsgcn import compose_graph_operator
from mocodad_tpu.nn.unet import joint_pyramid
from mocodad_tpu.ops.fast_unet import _block_diag_joint_mix, _fold_bn

# padded stack dims
KP = 128   # max T*V per level (T=6: TV=102 -> pad 128)
CP = 128   # max channels


class _OpSpec(NamedTuple):
    kind: str          # 'gcn' | 'joint' | 'save' | 'add_skip' | 'add_input'
    idx: int           # index into the corresponding weight stack
    tvi: int
    tvo: int
    ci: int
    co: int
    has_res: bool
    slot: int          # skip slot for save/add_skip


def _pad_to(a, shape):
    a = np.asarray(jax.device_get(a))
    out = np.zeros(shape, dtype=a.dtype)
    out[tuple(slice(0, s) for s in a.shape)] = a
    return out


def build_pallas_denoiser(params: Dict, batch_stats: Dict, *, c_in: int,
                          n_frames: int, n_joints: int, embedding_dim: int,
                          unet_down_channels=(16, 32, 32, 64, 64, 128, 64),
                          unet_up_channels=None, nb: int = 128,
                          compute_dtype=jnp.float32,
                          interpret: bool = False,
                          max_ops: Optional[int] = None,
                          debug_skip: frozenset = frozenset(),
                          vmem_limit_bytes: Optional[int] = 100 * 2**20):
    """fn(x_ntvc, silu_emb) -> eps_ntvc for an STSAEUnet variables tree.

    x_ntvc: (N, T*V, C_in); silu_emb: (N, embedding_dim) = silu(time emb +
    condition emb) precomputed per step.  N must be a positive multiple of
    8; it is padded to a multiple of nb internally.
    """
    jp = joint_pyramid(n_joints)
    dn = list(unet_down_channels)
    up = (list(unet_up_channels) if unet_up_channels is not None
          else [64, 32, 32, c_in])
    t = n_frames
    tva, tvb, tvc = t * jp['a'], t * jp['b'], t * jp['c']
    emb_dim = embedding_dim

    # ---- collect per-layer constants (host-side, once) ----
    gcn_layers = [
        ('p1a', tva, c_in, dn[0]), ('d1_0', tva, dn[0], dn[1]),
        ('d1_1', tva, dn[1], dn[2]),
        ('d2_0', tvb, dn[2], dn[3]), ('d2_1', tvb, dn[3], dn[4]),
        ('d3_0', tvc, dn[4], dn[5]), ('d3_1', tvc, dn[5], dn[6]),
        ('u4_0', tvb, dn[-1], up[0]), ('u4_1', tvb, up[0], up[1]),
        ('u3_0', tva, up[1], up[2]), ('u3_1', tva, up[2], up[3]),
    ]
    joint_layers = [('down1', tva, tvb), ('down2', tvb, tvc),
                    ('up3', tvc, tvb), ('up2', tvb, tva)]

    n_g, n_j = len(gcn_layers), len(joint_layers)
    ks = np.zeros((n_g, KP, KP), np.float32)
    ws = np.zeros((n_g, CP, CP), np.float32)
    bs = np.zeros((n_g, 1, CP), np.float32)
    bn_s = np.zeros((n_g, 1, CP), np.float32)
    bn_t = np.zeros((n_g, 1, CP), np.float32)
    rws = np.zeros((n_g, CP, CP), np.float32)
    rbn_s = np.zeros((n_g, 1, CP), np.float32)
    rbn_t = np.zeros((n_g, 1, CP), np.float32)
    prel = np.zeros((n_g, 1, 8), np.float32)
    eks = np.zeros((n_g, emb_dim, CP), np.float32)
    ebs = np.zeros((n_g, 1, CP), np.float32)
    has_res_flags: List[bool] = []

    for i, (name, tv, ci, co) in enumerate(gcn_layers):
        p, s = params[name], batch_stats[name]
        k = compose_graph_operator(p['gcn']['T'], p['gcn']['A'])
        ks[i] = _pad_to(k, (KP, KP))
        ws[i] = _pad_to(p['tcn_kernel'], (CP, CP))
        if 'tcn_bias' in p:
            bs[i, 0, :co] = np.asarray(jax.device_get(p['tcn_bias']))
        sc, sh = _fold_bn(p['tcn_bn'], s['tcn_bn'])
        bn_s[i, 0, :co] = np.asarray(jax.device_get(sc))
        bn_t[i, 0, :co] = np.asarray(jax.device_get(sh))
        has_res = 'residual_kernel' in p
        has_res_flags.append(has_res)
        if has_res:
            rws[i] = _pad_to(p['residual_kernel'], (CP, CP))
            rsc, rsh = _fold_bn(p['residual_bn'], s['residual_bn'])
            rbn_s[i, 0, :co] = np.asarray(jax.device_get(rsc))
            rbn_t[i, 0, :co] = np.asarray(jax.device_get(rsh))
            if 'residual_bias' in p:
                # fold conv bias into the BN shift: (x@W + b)*s + t
                rbn_t[i, 0, :co] += (
                    np.asarray(jax.device_get(p['residual_bias']))
                    * rbn_s[i, 0, :co])
        prel[i, 0, :] = float(np.asarray(
            jax.device_get(p['PReLU_0']['negative_slope'])).reshape(-1)[0])
        eks[i] = _pad_to(p['emb_kernel'], (emb_dim, CP))
        ebs[i, 0, :co] = np.asarray(jax.device_get(p['emb_bias']))

    ds = np.zeros((n_j, KP, KP), np.float32)
    d_row_s = np.zeros((n_j, KP, 8), np.float32)
    d_row_t = np.zeros((n_j, KP, 8), np.float32)
    for j, (name, tvi, tvo) in enumerate(joint_layers):
        p, s = params[name], batch_stats[name]
        d = _block_diag_joint_mix(p['kernel'], t)
        ds[j] = _pad_to(d, (KP, KP))
        sc, sh = _fold_bn(p['BatchNorm_0'], s['BatchNorm_0'])
        v_out = np.asarray(jax.device_get(p['kernel'])).shape[1]
        bias = (np.asarray(jax.device_get(p['bias']))
                if 'bias' in p else np.zeros(v_out, np.float32))
        row_s = np.tile(np.asarray(jax.device_get(sc)), t)
        row_t = np.tile(np.asarray(jax.device_get(sh))
                        + bias * np.asarray(jax.device_get(sc)), t)
        d_row_s[j, :tvo, 0] = row_s
        d_row_t[j, :tvo, 0] = row_t

    # ---- op program ----
    g = iter(range(n_g))
    jt = iter(range(n_j))
    program: List[_OpSpec] = []

    def G(tv, ci, co):
        i = next(g)
        program.append(_OpSpec('gcn', i, tv, tv, ci, co,
                               has_res_flags[i], -1))

    def J(tvi, tvo, c):
        program.append(_OpSpec('joint', next(jt), tvi, tvo, c, c, False, -1))

    G(tva, c_in, dn[0]); G(tva, dn[0], dn[1]); G(tva, dn[1], dn[2])
    program.append(_OpSpec('save', -1, tva, tva, dn[2], dn[2], False, 0))
    J(tva, tvb, dn[2])
    G(tvb, dn[2], dn[3]); G(tvb, dn[3], dn[4])
    program.append(_OpSpec('save', -1, tvb, tvb, dn[4], dn[4], False, 1))
    J(tvb, tvc, dn[4])
    G(tvc, dn[4], dn[5]); G(tvc, dn[5], dn[6])
    J(tvc, tvb, dn[6])
    program.append(_OpSpec('add_skip', -1, tvb, tvb, dn[6], dn[6], False, 1))
    G(tvb, dn[-1], up[0]); G(tvb, up[0], up[1])
    J(tvb, tva, up[1])
    program.append(_OpSpec('add_skip', -1, tva, tva, up[1], up[1], False, 0))
    G(tva, up[1], up[2]); G(tva, up[2], up[3])
    program.append(_OpSpec('add_input', -1, tva, tva, up[3], up[3], False, -1))

    cdt = compute_dtype

    # ---- the kernel ----
    def kernel(x_ref, emb_ref, ks_ref, ws_ref, bs_ref, bns_ref, bnt_ref,
               rws_ref, rbns_ref, rbnt_ref, prel_ref, eks_ref, ebs_ref,
               ds_ref, drs_ref, drt_ref, o_ref):
        x0 = x_ref[:].astype(cdt)             # (NB, TVA, C_in)
        emb = emb_ref[:].astype(cdt)          # (NB, E)
        skips: Dict[int, Any] = {}
        f = x0

        prog = program if max_ops is None else program[:max_ops]
        for op in prog:
            if op.kind == 'save':
                skips[op.slot] = f
                continue
            if op.kind == 'add_skip':
                f = f + skips[op.slot]
                continue
            if op.kind == 'add_input':
                f = f + x0
                continue
            if op.kind == 'joint':
                d = ds_ref[op.idx, :op.tvi, :op.tvo].astype(cdt)
                y = jax.lax.dot_general(
                    f, d, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (NB, C, TVo)
                y = jnp.swapaxes(y, 1, 2)                 # (NB, TVo, C)
                # keep slices >= 2-D (Mosaic dislikes 1-D intermediates)
                rs = drs_ref[op.idx, :op.tvo, 0:1][None]  # (1, TVo, 1)
                rt = drt_ref[op.idx, :op.tvo, 0:1][None]
                f = (y * rs + rt).astype(cdt)
                continue

            # gcn layer.  Layers with tiny channel counts compute in f32:
            # Mosaic lowers their rank-3 dots through a bf16 shape cast
            # that is unsupported for small lane counts.
            i = op.idx
            ldt = jnp.float32 if min(op.ci, op.co) < 16 else cdt
            fl = f.astype(ldt)
            k = ks_ref[i, :op.tvi, :op.tvo].astype(ldt)
            y = jax.lax.dot_general(
                fl, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (NB, Ci, TVo)
            y = jnp.swapaxes(y, 1, 2).astype(ldt)          # (NB, TVo, Ci)
            w = ws_ref[i, :op.ci, :op.co].astype(ldt)
            # Channel mix as a rank-3 last-dim contraction: no reshapes at
            # all (sublane-merge reshapes fail to lower for small bf16
            # lane counts: "unsupported shape cast").
            y = jax.lax.dot_general(
                y, w, dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (NB, TVo, Co)
            if 'bn' not in debug_skip:
                y = (y + bs_ref[i, :, :op.co][None]) \
                    * bns_ref[i, :, :op.co][None] \
                    + bnt_ref[i, :, :op.co][None]           # (1, 1, co)

            if 'res' not in debug_skip:
                if op.has_res:
                    rw = rws_ref[i, :op.ci, :op.co].astype(ldt)
                    r = jax.lax.dot_general(
                        fl, rw, dimension_numbers=(((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    r = r * rbns_ref[i, :, :op.co][None] \
                        + rbnt_ref[i, :, :op.co][None]
                else:
                    r = f.astype(jnp.float32)
                y = y + r
            if 'prelu' not in debug_skip:
                a = prel_ref[i, :, 0:1][None]               # (1, 1, 1)
                y = jnp.where(y >= 0, y, a * y)

            if 'emb' not in debug_skip:
                e = jnp.dot(emb, eks_ref[i, :, :op.co].astype(cdt),
                            preferred_element_type=jnp.float32) \
                    + ebs_ref[i, :, :op.co]                 # (NB, Co)
                y = y + e[:, None, :]
            f = y.astype(cdt)

        if max_ops is not None and f.shape != o_ref.shape:
            # compile-bisection mode: partial-store into the output shape
            o_ref[:] = jnp.zeros(o_ref.shape, o_ref.dtype)
            tvm = min(f.shape[1], o_ref.shape[1])
            cm = min(f.shape[2], o_ref.shape[2])
            o_ref[:, :tvm, :cm] = f[:, :tvm, :cm].astype(o_ref.dtype)
            return
        o_ref[:] = f.astype(o_ref.dtype)

    consts = [ks, ws, bs, bn_s, bn_t, rws, rbn_s, rbn_t, prel, eks, ebs,
              ds, d_row_s, d_row_t]
    # Under a grid, every spec needs an explicit block shape + index map;
    # constants use the full array at block (0, ..., 0) every step.
    const_specs = [
        pl.BlockSpec(c.shape, functools.partial(
            lambda nd, i: (0,) * nd, c.ndim), memory_space=pltpu.VMEM)
        for c in consts]

    def call(x_ntvc: jnp.ndarray, silu_emb: jnp.ndarray) -> jnp.ndarray:
        n = x_ntvc.shape[0]
        n_pad = -(-n // nb) * nb
        if n_pad != n:
            x_ntvc = jnp.pad(x_ntvc, ((0, n_pad - n), (0, 0), (0, 0)))
            silu_emb = jnp.pad(silu_emb, ((0, n_pad - n), (0, 0)))
        grid = (n_pad // nb,)
        # VMEM footprint is dominated by tile-padding of small-lane tensors
        # (C as low as 2 pads to 128 lanes); raise the scoped-vmem cap and
        # keep NB modest.
        params = (dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_bytes))
            if vmem_limit_bytes and not interpret else {})
        out = pl.pallas_call(
            kernel,
            grid=grid,
            **params,
            in_specs=[
                pl.BlockSpec((nb, tva, c_in), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, emb_dim), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ] + const_specs,
            out_specs=pl.BlockSpec((nb, tva, c_in), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, tva, c_in),
                                           x_ntvc.dtype),
            interpret=interpret,
        )(x_ntvc, silu_emb, *consts)
        return out[:n]

    return call

"""Pallas TPU megakernel: one fused denoise forward per batch tile.

Runs the ENTIRE eval-mode U-Net on a batch tile with every intermediate —
graph mixes, channel mixes, folded BatchNorms, residuals, PReLUs, skips,
embedding adds — resident in VMEM.  HBM traffic per denoise step collapses
to read-x + read-silu(emb) + write-eps (+ sub-MB weights, fetched once).

Layout (chosen from measured Mosaic behaviour on this toolchain — see
PERF_NOTES.md "Mosaic probe results"):

  * activations are batch-in-lanes, alternating
        A = (C, TV, NB)   and   B = (TV, C, NB),
    so every matrix operand is the rank-2 WEIGHT on the lhs and the
    contraction hits a leading/middle dim of the rank-3 rhs — the one
    dot_general family this Mosaic version both supports and compiles in
    finite time (rank-3-lhs chains and P/Q batch-in-sublane layouts
    compile pathologically: >10 min for a 2-dot kernel);
  * each dot then has N = (free dim)·NB with NB = 128·k lanes fully used,
    K, M <= 1 MXU tile — cost ~ M·ceil(N/128) rows, matching the
    MXU-granularity roofline (see ops/roofline.py);
  * eval-mode BatchNorms are folded into the weights/biases on the host;
    per-layer conv + BN biases collapse into one (Co,1,1) broadcast add.

Covers the main MoCoDAD config family (STSAEUnet, inject conditioning);
`model.generate` is the XLA fallback otherwise.  Numerical parity with the
module forward is tested in tests/test_pallas_unet.py (interpret mode on
CPU; compiled on TPU).  Hot op in the reference this replaces:
models/gcae/stsgcn.py:154-155 dispatched ~450x per eval batch
(models/mocodad.py:160-180).
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mocodad_tpu.nn.stsgcn import compose_graph_operator
from mocodad_tpu.nn.unet import joint_pyramid
from mocodad_tpu.ops.fast_unet import _block_diag_joint_mix, _fold_bn


class _GcnW(NamedTuple):
    k2: jnp.ndarray        # (TVo, TVi)  graph operator, left form
    w2: jnp.ndarray        # (Co, Ci)    channel mix, BN-scale folded
    bias: jnp.ndarray      # (Co, 1, 1)  conv bias + BN shifts (both paths)
    slope: jnp.ndarray     # (1, 1)      PReLU negative slope
    we2: jnp.ndarray       # (Co, E)     embedding projection
    eb: jnp.ndarray        # (Co, 1)     embedding bias
    wr2: Optional[jnp.ndarray]  # (Co, Ci) residual mix or None (identity)


class _JointW(NamedTuple):
    d2: jnp.ndarray        # (TVo, TVi) block-diag joint mix, left form
    rs: jnp.ndarray        # (TVo, 1, 1) per-row scale (folded BN)
    rt: jnp.ndarray        # (TVo, 1, 1) per-row shift (bias + BN)


def _np(x):
    return np.asarray(jax.device_get(x), np.float32)


def _fold_gcn(p: Dict, s: Dict, cdt) -> _GcnW:
    k2 = _np(compose_graph_operator(p['gcn']['T'], p['gcn']['A'])).T
    sc, sh = _fold_bn(p['tcn_bn'], s['tcn_bn'])
    sc, sh = _np(sc), _np(sh)
    w2 = (_np(p['tcn_kernel']) * sc[None, :]).T          # (Co, Ci)
    b = _np(p['tcn_bias']) if 'tcn_bias' in p else 0.0
    bias = b * sc + sh
    wr2 = None
    if 'residual_kernel' in p:
        rsc, rsh = _fold_bn(p['residual_bn'], s['residual_bn'])
        rsc, rsh = _np(rsc), _np(rsh)
        wr2 = (_np(p['residual_kernel']) * rsc[None, :]).T
        rb = _np(p['residual_bias']) if 'residual_bias' in p else 0.0
        bias = bias + rb * rsc + rsh
    slope = float(_np(p['PReLU_0']['negative_slope']).reshape(-1)[0])
    return _GcnW(
        k2=jnp.asarray(k2, cdt), w2=jnp.asarray(w2, cdt),
        bias=jnp.asarray(bias.reshape(-1, 1, 1), jnp.float32),
        slope=jnp.full((1, 1), slope, jnp.float32),
        we2=jnp.asarray(_np(p['emb_kernel']).T, cdt),
        eb=jnp.asarray(_np(p['emb_bias']).reshape(-1, 1), jnp.float32),
        wr2=None if wr2 is None else jnp.asarray(wr2, cdt))


def _fold_joint(p: Dict, s: Dict, t_dim: int, cdt) -> _JointW:
    d = _np(_block_diag_joint_mix(jnp.asarray(p['kernel']), t_dim)).T
    sc, sh = _fold_bn(p['BatchNorm_0'], s['BatchNorm_0'])
    sc, sh = _np(sc), _np(sh)
    v_out = _np(p['kernel']).shape[1]
    b = _np(p['bias']) if 'bias' in p else np.zeros(v_out, np.float32)
    row_s = np.tile(sc, t_dim)
    row_t = np.tile(b * sc + sh, t_dim)
    return _JointW(d2=jnp.asarray(d, cdt),
                   rs=jnp.asarray(row_s.reshape(-1, 1, 1), jnp.float32),
                   rt=jnp.asarray(row_t.reshape(-1, 1, 1), jnp.float32))


def build_pallas_denoiser(params: Dict, batch_stats: Dict, *, c_in: int,
                          n_frames: int, n_joints: int, embedding_dim: int,
                          unet_down_channels=(16, 32, 32, 64, 64, 128, 64),
                          unet_up_channels=None, nb: int = 256,
                          compute_dtype=jnp.bfloat16,
                          interpret: bool = False,
                          vmem_limit_bytes: Optional[int] = 100 * 2**20):
    """fn(x_ctn, silu_emb_en) -> eps_ctn for an STSAEUnet variables tree.

    x_ctn: (C_in, T*V, N) activations (batch in lanes); silu_emb_en:
    (E, N) = silu(time emb + condition emb)^T precomputed per step.
    N is padded internally to a multiple of nb.
    """
    jp = joint_pyramid(n_joints)
    dn = list(unet_down_channels)
    up = (list(unet_up_channels) if unet_up_channels is not None
          else [64, 32, 32, c_in])
    t = n_frames
    tva, tvb, tvc = t * jp['a'], t * jp['b'], t * jp['c']
    cdt = compute_dtype

    gw = [_fold_gcn(params[n], batch_stats[n], cdt)
          for n in ('p1a', 'd1_0', 'd1_1', 'd2_0', 'd2_1', 'd3_0', 'd3_1',
                    'u4_0', 'u4_1', 'u3_0', 'u3_1')]
    jw = [_fold_joint(params[n], batch_stats[n], t, cdt)
          for n in ('down1', 'down2', 'up3', 'up2')]

    flats: List[jnp.ndarray] = []
    for w in gw:
        flats += [w.k2, w.w2, w.bias, w.slope, w.we2, w.eb]
        if w.wr2 is not None:
            flats += [w.wr2]
    for w in jw:
        flats += [w.d2, w.rs, w.rt]
    has_res = [w.wr2 is not None for w in gw]

    def kernel(x_ref, semb_ref, *refs):
        it = iter(refs)
        ws = []
        for hr in has_res:
            w = dict(k2=next(it), w2=next(it), bias=next(it),
                     slope=next(it), we2=next(it), eb=next(it),
                     wr2=next(it) if hr else None)
            ws.append(w)
        js = [dict(d2=next(it), rs=next(it), rt=next(it)) for _ in jw]
        o_ref = next(it)

        def dg(a, b, dims):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(dims, ((), ())),
                preferred_element_type=jnp.float32)

        x0 = x_ref[:].astype(cdt)         # A: (C_in, TVA, NB)
        semb = semb_ref[:].astype(cdt)    # (E, NB)

        def gcn(f, w, in_b):
            """One ST-GCNN layer; f in A (in_b=False) or B (in_b=True)
            layout, output in A."""
            f = f.astype(cdt)
            if in_b:
                g = dg(w['k2'][:], f, ((1,), (0,)))       # B -> B
                r_dims = ((1,), (1,))
            else:
                g = dg(w['k2'][:], f, ((1,), (1,)))       # A -> B
                r_dims = ((1,), (0,))
            y = dg(w['w2'][:], g, ((1,), (1,)))           # -> A (Co, TV, NB)
            if w['wr2'] is not None:
                y = y + dg(w['wr2'][:], f, r_dims)
            else:
                y = y + (jnp.swapaxes(f, 0, 1) if in_b else f)
            y = y + w['bias'][:]
            a = w['slope'][0, 0]
            y = jnp.where(y >= 0, y, a * y)
            e = dg(w['we2'][:], semb, ((1,), (0,))) + w['eb'][:]  # (Co, NB)
            return (y + e[:, None, :]).astype(cdt)

        def joint(f, w):
            """Joint re-scaling; A input -> B output + row affine."""
            h = dg(w['d2'][:], f.astype(cdt), ((1,), (1,)))
            return (h * w['rs'][:] + w['rt'][:]).astype(cdt)

        f = gcn(x0, ws[0], False)
        f = gcn(f, ws[1], False)
        f = gcn(f, ws[2], False)
        d1 = f
        f = joint(f, js[0])                               # B (TVB, ., NB)
        f = gcn(f, ws[3], True)
        f = gcn(f, ws[4], False)
        d2 = f
        f = joint(f, js[1])                               # B (TVC, ., NB)
        f = gcn(f, ws[5], True)
        f = gcn(f, ws[6], False)
        f = jnp.swapaxes(joint(f, js[2]), 0, 1) + d2      # -> A
        f = gcn(f, ws[7], False)
        f = gcn(f, ws[8], False)
        f = jnp.swapaxes(joint(f, js[3]), 0, 1) + d1      # -> A
        f = gcn(f, ws[9], False)
        f = gcn(f, ws[10], False)
        o_ref[:] = (f.astype(jnp.float32)
                    + x0.astype(jnp.float32)).astype(o_ref.dtype)

    const_specs = [
        pl.BlockSpec(c.shape, functools.partial(
            lambda ndim, i: (0,) * ndim, c.ndim), memory_space=pltpu.VMEM)
        for c in flats]
    params_kw = (dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=vmem_limit_bytes))
        if vmem_limit_bytes and not interpret else {})

    def call(x_ctn: jnp.ndarray, silu_emb_en: jnp.ndarray) -> jnp.ndarray:
        n = x_ctn.shape[2]
        n_pad = -(-n // nb) * nb
        if n_pad != n:
            x_ctn = jnp.pad(x_ctn, ((0, 0), (0, 0), (0, n_pad - n)))
            silu_emb_en = jnp.pad(silu_emb_en, ((0, 0), (0, n_pad - n)))
        out = pl.pallas_call(
            kernel,
            grid=(n_pad // nb,),
            in_specs=[
                pl.BlockSpec((c_in, tva, nb), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((embedding_dim, nb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ] + const_specs,
            out_specs=pl.BlockSpec((c_in, tva, nb), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((c_in, tva, n_pad), x_ctn.dtype),
            interpret=interpret,
            **params_kw,
        )(x_ctn, silu_emb_en, *flats)
        return out[:, :, :n]

    return call

"""Grouped Pallas kernels: 2-4 layers per kernel, nb=512 (the unexplored
middle between whole-step@256 and layer-wise@512).  5 kernels:
  K1 p1a,d1_0,d1_1,down1 | K2 d2_0,d2_1,down2 | K3 d3_0,d3_1,up3+skip
  K4 u4_0,u4_1,up2+skip  | K5 u3_0,u3_1,+x
Measured against the bf16 XLA fast path with a dispatch-amortized scan."""
import functools
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.environ['JAX_COMPILATION_CACHE_DIR'])
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.nn.unet import joint_pyramid
from mocodad_tpu.ops.pallas_unet import _fold_gcn, _fold_joint
from mocodad_tpu.ops.fast_unet import build_fast_denoiser
from mocodad_tpu.nn.components import sinusoidal_pos_encoding

NB = int(os.environ.get('NB', '512'))
N = 51200
cfg = Config(conditioning_strategy='inject', conditioning_indices=[0, 1, 2],
             conditioning_architecture='AE', channels=[32, 16, 32],
             embedding_dim=16, h_dim=32, latent_dim=16, dropout=0.0,
             seg_len=6, num_coords=2, noise_steps=10,
             n_generated_samples=50, aggregation_strategy='best',
             batch_size=1024, seed=0)
model = MoCoDADModel(cfg)
variables = jax.device_get(model.init_variables(jax.random.key(0)))
P, S = variables['params']['model'], variables['batch_stats']['model']
jp = joint_pyramid(17)
t, c_in, E = 3, 2, 16
tva, tvb, tvc = t * jp['a'], t * jp['b'], t * jp['c']
cdt = jnp.bfloat16

gw = {n: _fold_gcn(P[n], S[n], cdt)
      for n in ('p1a', 'd1_0', 'd1_1', 'd2_0', 'd2_1', 'd3_0', 'd3_1',
                'u4_0', 'u4_1', 'u3_0', 'u3_1')}
jw = {n: _fold_joint(P[n], S[n], t, cdt)
      for n in ('down1', 'down2', 'up3', 'up2')}


def dg(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def gcn_body(f, w, semb, in_b):
    f = f.astype(cdt)
    if in_b:
        g = dg(w['k2'][:], f, ((1,), (0,)))
        r_dims = ((1,), (1,))
    else:
        g = dg(w['k2'][:], f, ((1,), (1,)))
        r_dims = ((1,), (0,))
    y = dg(w['w2'][:], g.astype(cdt), ((1,), (1,)))
    if w['wr2'] is not None:
        y = y + dg(w['wr2'][:], f, r_dims)
    else:
        y = y + (jnp.swapaxes(f, 0, 1) if in_b else f).astype(jnp.float32)
    y = y + w['bias'][:]
    a = w['slope'][0, 0]
    y = jnp.where(y >= 0, y, a * y)
    e = dg(w['we2'][:], semb.astype(cdt), ((1,), (0,))) + w['eb'][:]
    return (y + e[:, None, :]).astype(cdt)


def joint_body(f, w):
    h = dg(w['d2'][:], f.astype(cdt), ((1,), (1,)))
    return (h * w['rs'][:] + w['rt'][:]).astype(cdt)


def pack(names, jnames):
    flats, spec = [], []
    for n in names:
        w = gw[n]
        d = dict(k2=w.k2, w2=w.w2, bias=w.bias, slope=w.slope,
                 we2=w.we2, eb=w.eb)
        if w.wr2 is not None:
            d['wr2'] = w.wr2
        spec.append(('g', n, sorted(d)))
        flats += [d[k] for k in sorted(d)]
    for n in jnames:
        w = jw[n]
        d = dict(d2=w.d2, rs=w.rs, rt=w.rt)
        spec.append(('j', n, sorted(d)))
        flats += [d[k] for k in sorted(d)]
    return flats, spec


def unpack(refs, spec):
    it = iter(refs)
    out = {}
    for kind, n, keys in spec:
        d = {k: next(it) for k in keys}
        if kind == 'g' and 'wr2' not in d:
            d['wr2'] = None
        out[n] = d
    return out, it


def make_kernel(body, in_shapes, out_shapes, names, jnames):
    """in_shapes/out_shapes: list of (dim0, dim1) with NB appended."""
    flats, spec = pack(names, jnames)

    def kernel(*refs):
        ins = refs[:len(in_shapes) + 1]      # + semb
        ws, it = unpack(refs[len(in_shapes) + 1:], spec)
        outs = list(it)
        body(ins, ws, outs)

    const_specs = [
        pl.BlockSpec(c.shape, functools.partial(
            lambda nd, i: (0,) * nd, c.ndim), memory_space=pltpu.VMEM)
        for c in flats]

    def call(*arrs):
        n_pad = arrs[0].shape[-1]
        grid = (n_pad // NB,)
        in_specs = [pl.BlockSpec(s + (NB,), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM)
                    for s in in_shapes]
        in_specs.append(pl.BlockSpec((E, NB), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        out_specs = [pl.BlockSpec(s + (NB,), lambda i: (0, 0, i),
                                  memory_space=pltpu.VMEM)
                     for s in out_shapes]
        out_shape = [jax.ShapeDtypeStruct(s + (n_pad,), cdt)
                     for s in out_shapes]
        if len(out_specs) == 1:
            out_specs, out_shape = out_specs[0], out_shape[0]
        return pl.pallas_call(
            kernel, grid=grid, in_specs=in_specs + const_specs,
            out_specs=out_specs, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20),
        )(*arrs, *flats)

    return call


# K1: x0 -> 3 gcn(A) -> d1 ; joint down1 -> fB
def k1_body(ins, ws, outs):
    x0, semb = ins
    f = gcn_body(x0[:], ws['p1a'], semb[:], False)
    f = gcn_body(f, ws['d1_0'], semb[:], False)
    f = gcn_body(f, ws['d1_1'], semb[:], False)
    outs[0][:] = f                       # d1 (32, TVA, NB)
    outs[1][:] = joint_body(f, ws['down1'])   # (TVB, 32, NB)


K1 = make_kernel(k1_body, [(c_in, tva)], [(32, tva), (tvb, 32)],
                 ['p1a', 'd1_0', 'd1_1'], ['down1'])


def k2_body(ins, ws, outs):
    fb, semb = ins
    f = gcn_body(fb[:], ws['d2_0'], semb[:], True)
    f = gcn_body(f, ws['d2_1'], semb[:], False)
    outs[0][:] = f                       # d2 (64, TVB, NB)
    outs[1][:] = joint_body(f, ws['down2'])   # (TVC, 64, NB)


K2 = make_kernel(k2_body, [(tvb, 32)], [(64, tvb), (tvc, 64)],
                 ['d2_0', 'd2_1'], ['down2'])


def k3_body(ins, ws, outs):
    fb, d2, semb = ins
    f = gcn_body(fb[:], ws['d3_0'], semb[:], True)
    f = gcn_body(f, ws['d3_1'], semb[:], False)
    f = jnp.swapaxes(joint_body(f, ws['up3']), 0, 1) + d2[:].astype(cdt)
    outs[0][:] = f.astype(cdt)           # (64, TVB, NB)


K3 = make_kernel(k3_body, [(tvc, 64), (64, tvb)], [(64, tvb)],
                 ['d3_0', 'd3_1'], ['up3'])


def k4_body(ins, ws, outs):
    f, d1, semb = ins
    f = gcn_body(f[:], ws['u4_0'], semb[:], False)
    f = gcn_body(f, ws['u4_1'], semb[:], False)
    f = jnp.swapaxes(joint_body(f, ws['up2']), 0, 1) + d1[:].astype(cdt)
    outs[0][:] = f.astype(cdt)           # (32, TVA, NB)


K4 = make_kernel(k4_body, [(64, tvb), (32, tva)], [(32, tva)],
                 ['u4_0', 'u4_1'], ['up2'])


def k5_body(ins, ws, outs):
    f, x0, semb = ins
    f = gcn_body(f[:], ws['u3_0'], semb[:], False)
    f = gcn_body(f, ws['u3_1'], semb[:], False)
    outs[0][:] = (f.astype(jnp.float32)
                  + x0[:].astype(jnp.float32)).astype(cdt)


K5 = make_kernel(k5_body, [(32, tva), (c_in, tva)], [(c_in, tva)],
                 ['u3_0', 'u3_1'], [])


def grouped(x_ctn, semb):
    d1, fb = K1(x_ctn, semb)
    d2, fc = K2(fb, semb)
    f = K3(fc, d2, semb)
    f = K4(f, d1, semb)
    return K5(f, x_ctn, semb)


# ---- parity + timing ----------------------------------------------------
den_bf = build_fast_denoiser(P, S, c_in=2, n_frames=3, n_joints=17,
                             embedding_dim=16, inject_condition=True)

n_small = 2048
x = jax.random.normal(jax.random.key(3), (n_small, 2, 3, 17), jnp.bfloat16)
tb = jnp.full((n_small,), 5, jnp.int32)
emb = (jax.random.normal(jax.random.key(4), (n_small, 16)) * 0.5
       ).astype(jnp.bfloat16)
want = np.asarray(den_bf(x, tb, emb), np.float32)

x_ctn = jnp.transpose(x, (1, 2, 3, 0)).reshape(2, tva, n_small)
semb = jax.nn.silu(sinusoidal_pos_encoding(tb, E).astype(jnp.float32)
                   + emb.astype(jnp.float32)).astype(cdt).T
print('compiling grouped kernels...', flush=True)
t0 = time.perf_counter()
got = np.asarray(jax.jit(grouped)(x_ctn, semb), np.float32)
print(f'compile+run {time.perf_counter()-t0:.0f}s', flush=True)
got = got.reshape(2, 3, 17, n_small).transpose(3, 0, 1, 2)
err = np.abs(got - want)
print(f'parity: mean|d| {err.mean():.5f} max|d| {err.max():.5f} '
      f'(out std {want.std():.3f})', flush=True)

# timing on the fold
xb = jax.random.normal(jax.random.key(5), (2, tva, N), cdt)
sembb = (jax.random.normal(jax.random.key(6), (E, N)) * 0.5).astype(cdt)


def scan_time(body, x0, iters=3, k=9):
    @jax.jit
    def runf(x):
        def step(c, _):
            return body(c), None
        y, _ = jax.lax.scan(step, x, None, length=k)
        return y
    o = runf(x0); jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [runf(x0) for _ in range(iters)]
    jax.block_until_ready(outs)
    return round((time.perf_counter() - t0) / iters / k * 1e3, 2)


print('grouped pallas nb=%d :' % NB,
      scan_time(lambda c: grouped(c, sembb), xb), 'ms', flush=True)

xn = jax.random.normal(jax.random.key(7), (N, 2, 3, 17), cdt)
tbn = jnp.full((N,), 5, jnp.int32)
en = (jax.random.normal(jax.random.key(8), (N, 16)) * 0.5).astype(cdt)
print('bf16 fast path       :',
      scan_time(lambda c: den_bf(c, tbn, en), xn), 'ms', flush=True)

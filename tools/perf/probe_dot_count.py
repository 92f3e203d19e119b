"""XLA fast-path variants that REDUCE DOT COUNT:
  A: all 11 per-layer emb projections batched into one (N,E)@(E,sumCo) dot
  B: residual channel-mix merged into the main channel mix via
     concat([graph_out, x]) @ [[W'],[R']]  (7 dots removed, exact algebra)
  C: A+B combined
Measured with the dispatch-amortized scan harness vs the shipping path."""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))
import numpy as np
import jax, jax.numpy as jnp

from mocodad_tpu.config import Config
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.ops.fast_unet import (build_fast_denoiser, _fold_bn,
                                       _block_diag_joint_mix)
from mocodad_tpu.nn.stsgcn import compose_graph_operator
from mocodad_tpu.nn.components import sinusoidal_pos_encoding
from mocodad_tpu.nn.unet import joint_pyramid

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
t_dim, c_in, E = 3, 2, 16
GNAMES = ['p1a', 'd1_0', 'd1_1', 'd2_0', 'd2_1', 'd3_0', 'd3_1',
          'u4_0', 'u4_1', 'u3_0', 'u3_1']


class Layer:
    def __init__(self, p, s):
        self.k_t = compose_graph_operator(p['gcn']['T'], p['gcn']['A']).T
        bn_s, bn_sh = _fold_bn(p['tcn_bn'], s['tcn_bn'])
        w = p['tcn_kernel'] * bn_s[None, :]
        bias = bn_sh + (p['tcn_bias'] * bn_s if 'tcn_bias' in p else 0.0)
        self.has_res = 'residual_kernel' in p
        if self.has_res:
            rbn_s, rbn_sh = _fold_bn(p['residual_bn'], s['residual_bn'])
            r = p['residual_kernel'] * rbn_s[None, :]
            bias = bias + rbn_sh + (p['residual_bias'] * rbn_s
                                    if 'residual_bias' in p else 0.0)
            self.wcat = jnp.concatenate([w, r], axis=0)  # (Cg+Cin, Co)
            self.r = r
        self.w = w
        self.bias = bias
        self.prelu = p['PReLU_0']['negative_slope']
        self.ek = p['emb_kernel']
        self.eb = p['emb_bias']
        self.co = w.shape[1]

    def fwd(self, x, e, merge_res):
        dt = x.dtype
        g = jnp.einsum('kx,xnc->knc', self.k_t.astype(dt), x)
        if self.has_res and merge_res:
            z = jnp.concatenate([g, x], axis=-1)
            y = jnp.einsum('knc,co->kno', z, self.wcat.astype(dt))
        else:
            y = jnp.einsum('knc,co->kno', g, self.w.astype(dt))
            if self.has_res:
                y = y + jnp.einsum('knc,co->kno', x, self.r.astype(dt))
        if not self.has_res:
            y = y + x
        y = y + self.bias.astype(dt)
        a = self.prelu.astype(dt)
        y = jnp.where(y >= 0, y, a * y)
        return y + e[None]


class Mix:
    def __init__(self, p, s):
        self.d = _block_diag_joint_mix(p['kernel'], t_dim)
        bn_s, bn_sh = _fold_bn(p['BatchNorm_0'], s['BatchNorm_0'])
        v_out = p['kernel'].shape[1]
        bias = p.get('bias', jnp.zeros(v_out, self.d.dtype))
        self.row_s = jnp.tile(bn_s, t_dim)
        self.row_t = jnp.tile(bias * bn_s + bn_sh, t_dim)

    def __call__(self, x):
        dt = x.dtype
        y = jnp.einsum('kx,xnc->knc', self.d.T.astype(dt), x)
        return (y * self.row_s.astype(dt)[:, None, None]
                + self.row_t.astype(dt)[:, None, None])


L = {n: Layer(P[n], S[n]) for n in GNAMES}
M = {n: Mix(P[n], S[n]) for n in ('down1', 'down2', 'up2', 'up3')}
EK_ALL = jnp.concatenate([L[n].ek for n in GNAMES], axis=1)   # (E, sumCo)
EB_ALL = jnp.concatenate([L[n].eb for n in GNAMES])
SPLITS = np.cumsum([L[n].co for n in GNAMES])[:-1].tolist()


def forward(x_nctv, t, cond_emb, *, fused_emb, merge_res):
    n = x_nctv.shape[0]
    dt = x_nctv.dtype
    emb = sinusoidal_pos_encoding(t, E)
    if cond_emb is not None:
        emb = emb + cond_emb
    se = jax.nn.silu(emb)
    if fused_emb:
        e_all = (se @ EK_ALL + EB_ALL).astype(dt)
        es = dict(zip(GNAMES, jnp.split(e_all, SPLITS, axis=1)))
    else:
        es = {nm: (se @ L[nm].ek + L[nm].eb).astype(dt) for nm in GNAMES}

    x = jnp.transpose(x_nctv, (2, 3, 0, 1)).reshape(t_dim * jp['a'], n, c_in)
    f = x
    for nm in ('p1a', 'd1_0', 'd1_1'):
        f = L[nm].fwd(f, es[nm], merge_res)
    d1 = f
    f = M['down1'](f)
    for nm in ('d2_0', 'd2_1'):
        f = L[nm].fwd(f, es[nm], merge_res)
    d2 = f
    f = M['down2'](f)
    for nm in ('d3_0', 'd3_1'):
        f = L[nm].fwd(f, es[nm], merge_res)
    f = M['up3'](f) + d2
    for nm in ('u4_0', 'u4_1'):
        f = L[nm].fwd(f, es[nm], merge_res)
    f = M['up2'](f) + d1
    for nm in ('u3_0', 'u3_1'):
        f = L[nm].fwd(f, es[nm], merge_res)
    f = f + x
    return jnp.transpose(f.reshape(t_dim, jp['a'], n, c_in), (2, 3, 0, 1))


den_bf = build_fast_denoiser(P, S, c_in=2, n_frames=3, n_joints=17,
                             embedding_dim=16, inject_condition=True)

# parity
x = jax.random.normal(jax.random.key(3), (2048, 2, 3, 17), jnp.float32)
tb = jnp.full((2048,), 5, jnp.int32)
emb = jax.random.normal(jax.random.key(4), (2048, 16)) * 0.5
want = np.asarray(den_bf(x, tb, emb))
for fe, mr, tag in [(True, False, 'A'), (False, True, 'B'), (True, True,
                                                             'C')]:
    got = np.asarray(jax.jit(
        lambda a, b, c: forward(a, b, c, fused_emb=fe, merge_res=mr)
    )(x, tb, emb))
    print(f'variant {tag}: f32 max|d| vs shipping '
          f'{np.abs(got - want).max():.2e}', flush=True)

# timing
dt = jnp.bfloat16
xb = jax.random.normal(jax.random.key(5), (N, 2, 3, 17), dt)
tbb = jnp.full((N,), 5, jnp.int32)
eb = (jax.random.normal(jax.random.key(6), (N, 16)) * 0.5).astype(dt)


def scan_time(body, iters=3, k=9):
    @jax.jit
    def runf(x):
        def step(c, _):
            return body(c), None
        y, _ = jax.lax.scan(step, x, None, length=k)
        return y
    o = runf(xb); jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [runf(xb) for _ in range(iters)]
    jax.block_until_ready(outs)
    return round((time.perf_counter() - t0) / iters / k * 1e3, 2)


print('shipping fast path:', scan_time(lambda c: den_bf(c, tbb, eb)), 'ms',
      flush=True)
for fe, mr, tag in [(True, False, 'A'), (False, True, 'B'),
                    (True, True, 'C')]:
    print(f'variant {tag} (fused_emb={fe}, merge_res={mr}):',
          scan_time(lambda c: forward(c, tbb, eb, fused_emb=fe,
                                      merge_res=mr)), 'ms', flush=True)

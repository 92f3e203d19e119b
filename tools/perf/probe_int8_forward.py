"""Prototype: full U-Net forward with int8 activations between layers.

Per-tensor static activation scales (calibrated from a bf16 reference run),
per-tensor int8 weights, BN/PReLU/emb in bf16 fused elementwise, boundary
tensors int8 (half the bf16 traffic).  Measures per-forward time inside a
scan (dispatch-amortized) vs the bf16 fast path, plus output error."""
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
from mocodad_tpu.ops.fast_unet import build_fast_denoiser, _fold_bn
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
dn = [16, 32, 32, 64, 64, 128, 64]
up = [64, 32, 32, 2]


def q8(a):
    """Symmetric per-tensor int8 quant -> (q, scale)."""
    a = np.asarray(a, np.float32)
    s = max(np.abs(a).max(), 1e-8) / 127.0
    return jnp.asarray(np.clip(np.round(a / s), -127, 127), jnp.int8), s


class QLayer:
    def __init__(self, p, s, v_dim):
        self.k8, self.sk = q8(np.asarray(
            compose_graph_operator(p['gcn']['T'], p['gcn']['A'])).T)
        self.w8, self.sw = q8(p['tcn_kernel'])
        self.b = p.get('tcn_bias')
        self.bn_scale, self.bn_shift = _fold_bn(p['tcn_bn'], s['tcn_bn'])
        self.has_res = 'residual_kernel' in p
        if self.has_res:
            self.rw8, self.srw = q8(p['residual_kernel'])
            self.rb = p.get('residual_bias')
            self.rbn_scale, self.rbn_shift = _fold_bn(p['residual_bn'],
                                                      s['residual_bn'])
        self.prelu = float(p['PReLU_0']['negative_slope'])
        self.has_emb = 'emb_kernel' in p
        if self.has_emb:
            self.ek, self.eb = p['emb_kernel'], p['emb_bias']
        # activation scales, set by calibration
        self.sg = 1.0   # scale of graph-mix output (int8 boundary)

    def __call__(self, x8, sx, emb):
        """x8 int8 (TV,N,C) with scale sx -> (y8, sy) int8, plus raw bf16
        output for the last layer."""
        g = jax.lax.dot_general(self.k8, x8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        # requant graph output to int8 at scale sg
        g8 = jnp.clip(jnp.round(g.astype(jnp.float32) *
                                (self.sk * sx / self.sg)),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(g8, self.w8, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        yf = y.astype(jnp.bfloat16) * jnp.bfloat16(self.sg * self.sw)
        if self.b is not None:
            yf = yf + self.b.astype(jnp.bfloat16)
        yf = (yf * self.bn_scale.astype(jnp.bfloat16)
              + self.bn_shift.astype(jnp.bfloat16))
        if self.has_res:
            r = jax.lax.dot_general(x8, self.rw8, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            rf = r.astype(jnp.bfloat16) * jnp.bfloat16(sx * self.srw)
            if self.rb is not None:
                rf = rf + self.rb.astype(jnp.bfloat16)
            rf = (rf * self.rbn_scale.astype(jnp.bfloat16)
                  + self.rbn_shift.astype(jnp.bfloat16))
        else:
            rf = x8.astype(jnp.bfloat16) * jnp.bfloat16(sx)
        yf = yf + rf
        a = jnp.bfloat16(self.prelu)
        yf = jnp.where(yf >= 0, yf, a * yf)
        if self.has_emb and emb is not None:
            e = jax.nn.silu(emb) @ self.ek + self.eb
            yf = yf + e.astype(jnp.bfloat16)[None]
        return yf


class QJointMix:
    def __init__(self, p, s, t_dim):
        from mocodad_tpu.ops.fast_unet import _block_diag_joint_mix
        d = np.asarray(_block_diag_joint_mix(p['kernel'], t_dim)).T
        self.d8, self.sd = q8(d)
        v_out = p['kernel'].shape[1]
        bn_scale, bn_shift = _fold_bn(p['BatchNorm_0'], s['BatchNorm_0'])
        bias = p.get('bias', jnp.zeros(v_out))
        self.row_scale = jnp.tile(bn_scale, t_dim)
        self.row_shift = jnp.tile(bias * bn_scale + bn_shift, t_dim)

    def __call__(self, x8, sx):
        y = jax.lax.dot_general(self.d8, x8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        yf = y.astype(jnp.bfloat16) * jnp.bfloat16(self.sd * sx)
        return (yf * self.row_scale.astype(jnp.bfloat16)[:, None, None]
                + self.row_shift.astype(jnp.bfloat16)[:, None, None])


layers = {
    'p1a': QLayer(P['p1a'], S['p1a'], jp['a']),
    'd1_0': QLayer(P['d1_0'], S['d1_0'], jp['a']),
    'd1_1': QLayer(P['d1_1'], S['d1_1'], jp['a']),
    'd2_0': QLayer(P['d2_0'], S['d2_0'], jp['b']),
    'd2_1': QLayer(P['d2_1'], S['d2_1'], jp['b']),
    'd3_0': QLayer(P['d3_0'], S['d3_0'], jp['c']),
    'd3_1': QLayer(P['d3_1'], S['d3_1'], jp['c']),
    'u4_0': QLayer(P['u4_0'], S['u4_0'], jp['b']),
    'u4_1': QLayer(P['u4_1'], S['u4_1'], jp['b']),
    'u3_0': QLayer(P['u3_0'], S['u3_0'], jp['a']),
    'u3_1': QLayer(P['u3_1'], S['u3_1'], jp['a']),
}
mixes = {m: QJointMix(P[m], S[m], t_dim)
         for m in ('down1', 'down2', 'up2', 'up3')}
ORDER = [('p1a', 'a'), ('d1_0', 'a'), ('d1_1', 'a'), ('down1', None),
         ('d2_0', 'b'), ('d2_1', 'b'), ('down2', None),
         ('d3_0', 'c'), ('d3_1', 'c'), ('up3', None), ('skip_d2', None),
         ('u4_0', 'b'), ('u4_1', 'b'), ('up2', None), ('skip_d1', None),
         ('u3_0', 'a'), ('u3_1', 'a')]

# ---- calibration: bf16 fast path intermediate maxima -------------------
den_bf = build_fast_denoiser(P, S, c_in=2, n_frames=3, n_joints=17,
                             embedding_dim=16, inject_condition=True)
xc = jax.random.normal(jax.random.key(1), (2048, 2, 3, 17), jnp.float32)
tc_ = jnp.full((2048,), 5, jnp.int32)
ec = jax.random.normal(jax.random.key(2), (2048, 16), jnp.float32) * 0.5

# calibration by re-running the q-chain in float and recording maxima
scales = {}


def run(x_nctv, t, cond_emb, calibrate=False):
    n = x_nctv.shape[0]
    emb = sinusoidal_pos_encoding(t, E)
    if cond_emb is not None:
        emb = emb + cond_emb
    x0 = jnp.transpose(x_nctv, (2, 3, 0, 1)).reshape(t_dim * jp['a'], n, c_in)

    def quant(name, f):
        if calibrate:
            s = float(jnp.abs(f).max()) / 127.0
            scales[name] = max(scales.get(name, 1e-8), s)
        s = scales[name] if not calibrate else scales[name]
        q = jnp.clip(jnp.round(f.astype(jnp.float32) / s), -127, 127
                     ).astype(jnp.int8)
        return q, s

    f = x0.astype(jnp.bfloat16)
    x8, sx = quant('in', f)
    skips = {}
    for i, (name, lvl) in enumerate(ORDER):
        if name.startswith('skip_'):
            f = f + skips[name[5:]]
            x8, sx = quant(f'{name}_out', f)
            continue
        if name in mixes:
            f = mixes[name](x8, sx)
            x8, sx = quant(f'{name}_out', f)
            continue
        l = layers[name]
        if calibrate:
            # graph-output scale from float run
            g = jax.lax.dot_general(
                l.k8, x8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (l.sk * sx)
            l.sg = max(getattr(l, 'sg_cal', 1e-8),
                       float(jnp.abs(g).max()) / 127.0)
            l.sg_cal = l.sg
        f = l(x8, sx, emb)
        if name == 'd1_1':
            skips['d1'] = f
        if name == 'd2_1':
            skips['d2'] = f
        if name != 'u3_1':
            x8, sx = quant(f'{name}_out', f)
    f = f + x0.astype(jnp.bfloat16)
    out = f.reshape(t_dim, jp['a'], n, c_in)
    return jnp.transpose(out, (2, 3, 0, 1))


_ = run(xc, tc_, ec, calibrate=True)
print('calibrated scales:', {k: round(v, 4) for k, v in scales.items()})

# ---- parity vs bf16 fast path ------------------------------------------
x = jax.random.normal(jax.random.key(3), (4096, 2, 3, 17), jnp.bfloat16)
tb = jnp.full((4096,), 5, jnp.int32)
emb = (jax.random.normal(jax.random.key(4), (4096, 16)) * 0.5
       ).astype(jnp.bfloat16)
want = np.asarray(den_bf(x, tb, emb), np.float32)
got = np.asarray(jax.jit(lambda *a: run(*a))(x, tb, emb), np.float32)
err = np.abs(got - want)
rel = err.mean() / np.abs(want).mean()
print(f'int8 vs bf16: mean|d| {err.mean():.4f}, max|d| {err.max():.4f}, '
      f'rel-mean {rel:.4f}, out std {want.std():.3f}')

# ---- timing inside scan (dispatch-amortized) ----------------------------
xb = jax.random.normal(jax.random.key(5), (N, 2, 3, 17), jnp.bfloat16)
tbb = jnp.full((N,), 5, jnp.int32)
embb = (jax.random.normal(jax.random.key(6), (N, 16)) * 0.5
        ).astype(jnp.bfloat16)


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


print('bf16 fast forward :', scan_time(lambda c: den_bf(c, tbb, embb)), 'ms')
print('int8 forward      :', scan_time(lambda c: run(c, tbb, embb)), 'ms')

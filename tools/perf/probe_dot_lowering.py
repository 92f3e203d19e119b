"""Round-5 dot-lowering probe: the two untried levers on the 4.7x HBM
traffic multiple (VERDICT r4 weak #1a).

The 34 matmuls of the fast U-Net lower to 44 unfusable `convolution`
HLOs + 28 copies (PERF_NOTES "Roofline"); the copies are layout
relayouts XLA inserts around the odd row/contraction extents
(tva=51, tvb=36, tvc=30 on the flagship 3x17 corrupt fold).  Variants:

  ship    : the shipping fast path (same-run baseline)
  pte-f32 : every layer einsum with preferred_element_type=f32
            (f32 accumulate + f32 layer tail, cast back to bf16 at layer
            exit) — does a wider accumulator change the conv lowering or
            fusion boundaries?
  padP    : the TV axis zero-padded to P in {56, 64, 128} through the
            WHOLE net (padded graph operators / joint mixes / row
            affines; zeros in all padded<->real couplings keep the real
            rows exact — parity-checked below) — do aligned tiles kill
            the copies, and does that win over the extra padded FLOPs?

Each variant reports ms/forward (dispatch-amortized 9-step scan,
tuned compiler options = shipping), HLO op mix, and bytes accessed.
All timings same-run (cross-run tunnel drift reaches +-15%).
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))

import jax
import jax.numpy as jnp
import numpy as np

from _harness import build_forward, N
from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.ops import fast_unet as F
from mocodad_tpu.ops.xla_tuning import tuned_compiler_options

ITERS = 5
K = 9


def flagship_variables():
    from mocodad_tpu.config import flagship_config
    cfg = flagship_config(n_generated_samples=50, batch_size=1024)
    model = MoCoDADModel(cfg)
    variables = jax.device_get(model.init_variables(jax.random.key(0)))
    return variables['params']['model'], variables['batch_stats']['model']


def _pad_square(m, p):
    out = jnp.zeros((p, p), m.dtype)
    return out.at[:m.shape[0], :m.shape[1]].set(m)


def _pad_vec(v, p):
    out = jnp.zeros((p,), v.dtype)
    return out.at[:v.shape[0]].set(v)


def build_padded_denoiser(P, S, pad):
    """fast_unet.build_fast_denoiser with every TV extent padded to
    `pad` (zero blocks in all TV-coupling operators, so real rows stay
    exact)."""
    t_dim, c_in, emb_dim = 3, 2, 16
    from mocodad_tpu.nn.components import sinusoidal_pos_encoding
    from mocodad_tpu.nn.unet import joint_pyramid

    jp = joint_pyramid(17)
    tva = t_dim * jp['a']

    def L(name):
        l = F._Layer(P[name], S[name], channel_first=True)
        l.k_t = _pad_square(l.k_t, pad)
        return l

    def JM(name):
        jm = F._JointMix(P[name], S[name], t_dim)
        jm.d = _pad_square(jm.d, pad)
        jm.row_scale = _pad_vec(jm.row_scale, pad)
        jm.row_shift = _pad_vec(jm.row_shift, pad)
        return jm

    layers_a = [L('p1a'), L('d1_0'), L('d1_1')]
    down1, down2 = JM('down1'), JM('down2')
    layers_b = [L('d2_0'), L('d2_1')]
    layers_c = [L('d3_0'), L('d3_1')]
    up3, up2 = JM('up3'), JM('up2')
    layers_u4 = [L('u4_0'), L('u4_1')]
    layers_u3 = [L('u3_0'), L('u3_1')]

    def fn(x_nctv, t, cond_emb):
        n = x_nctv.shape[0]
        emb = sinusoidal_pos_encoding(t, emb_dim)
        if cond_emb is not None:
            emb = emb + cond_emb
        x = jnp.transpose(x_nctv, (2, 3, 0, 1)).reshape(tva, n, c_in)
        x = jnp.pad(x, ((0, pad - tva), (0, 0), (0, 0)))
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
        out = f[:tva].reshape(t_dim, jp['a'], n, c_in)
        return jnp.transpose(out, (2, 3, 0, 1))

    return fn


def build_pte_denoiser(P, S, pte):
    """The shipping (unpadded) wiring with preferred_element_type'd
    einsums, via a module-level einsum patch during tracing only."""
    den = F.build_fast_denoiser(P, S, c_in=2, n_frames=3, n_joints=17,
                                embedding_dim=16, inject_condition=True)

    def fn(x, t, e):
        orig = jnp.einsum

        def einsum_pte(*a, **kw):
            kw.setdefault('preferred_element_type', pte)
            return orig(*a, **kw)

        try:
            jnp.einsum = einsum_pte
            y = den(x, t, e)
        finally:
            jnp.einsum = orig
        return y.astype(x.dtype)

    return fn


def measure(name, den, xb, tbb, eb, results):
    def runf(x):
        def step(c, _):
            return den(c, tbb, eb), None
        y, _ = jax.lax.scan(step, x, None, length=K)
        return y

    compiled = jax.jit(runf).lower(xb).compile(
        compiler_options=tuned_compiler_options())
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    hlo = compiled.as_text()
    mix = {op: len(re.findall(rf'=\s+\S+\s+{op}\(', hlo))
           for op in ('convolution', 'dot', 'fusion', 'copy')}
    np.asarray(compiled(xb))    # warm + fence
    t0 = time.perf_counter()
    last = None
    for _ in range(ITERS):
        last = compiled(xb)
    np.asarray(last)
    ms = (time.perf_counter() - t0) / ITERS / K * 1e3
    results[name] = {'ms_per_forward': round(ms, 2),
                     'gb_accessed': round(
                         ca.get('bytes accessed', 0) / 1e9 / K, 2),
                     'gflop': round(ca.get('flops', 0) / 1e9 / K, 1),
                     **mix}
    print(f'{name:10s} {ms:6.2f} ms/fwd  '
          f'{results[name]["gb_accessed"]:5.2f} GB  '
          f'{results[name]["gflop"]:5.1f} GF  ' +
          ' '.join(f'{k}={v}' for k, v in mix.items()), flush=True)
    return compiled


def main():
    import json
    den, xb, tbb, eb, _ = build_forward()
    P, S = flagship_variables()
    results = {}

    measure('ship', den, xb, tbb, eb, results)

    # parity anchor: small-N f32 outputs of each variant vs ship
    xs = jax.random.normal(jax.random.key(9), (64, 2, 3, 17))
    ts = jnp.full((64,), 5, jnp.int32)
    es = jax.random.normal(jax.random.key(10), (64, 16)) * 0.5
    want = np.asarray(jax.jit(den)(xs, ts, es))

    pte = build_pte_denoiser(P, S, jnp.float32)
    got = np.asarray(jax.jit(pte)(xs, ts, es))
    assert np.allclose(got, want, atol=1e-4), 'pte parity'
    measure('pte-f32', pte, xb, tbb, eb, results)

    for p in (56, 64, 128):
        pd = build_padded_denoiser(P, S, p)
        got = np.asarray(jax.jit(pd)(xs, ts, es))
        assert np.allclose(got, want, atol=1e-4), f'pad{p} parity'
        measure(f'pad{p}', pd, xb, tbb, eb, results)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'results', 'dot_lowering_20260820.json')
    with open(out, 'w') as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print('saved', out, flush=True)
    print('DONE', flush=True)


if __name__ == '__main__':
    main()

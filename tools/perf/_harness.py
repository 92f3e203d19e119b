"""Shared harness for the tools/perf probe scripts.

All compiler-option / forward-time probes measure the same object: one
U-Net forward on the 51200-row eval fold (flagship inject/AE config,
bf16, the shipping ops/fast_unet.py path), dispatch-amortized inside a
9-step lax.scan (a single jit dispatch through the axon tunnel costs
~3.5-4.5 ms, so per-call timing of a ~2 ms program measures only
dispatch; see PERF_NOTES.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
import jax
import jax.numpy as jnp

from mocodad_tpu.models import MoCoDADModel
from mocodad_tpu.ops.fast_unet import build_fast_denoiser

N = 51200


def flagship_config(**kw):
    from mocodad_tpu.config import flagship_config as _flagship
    base = dict(n_generated_samples=50, batch_size=1024)
    base.update(kw)
    return _flagship(**base)


def build_forward(n=N):
    """(den, xb, tbb, eb, runf): the shipping fast-path denoiser, bf16
    inputs of n rows, and the 9-step scan wrapper used for timing."""
    cfg = flagship_config()
    model = MoCoDADModel(cfg)
    variables = jax.device_get(model.init_variables(jax.random.key(0)))
    P = variables['params']['model']
    S = variables['batch_stats']['model']
    den = build_fast_denoiser(P, S, c_in=2, n_frames=3, n_joints=17,
                              embedding_dim=16, inject_condition=True)
    dt = jnp.bfloat16
    xb = jax.random.normal(jax.random.key(5), (n, 2, 3, 17), dt)
    tbb = jnp.full((n,), 5, jnp.int32)
    eb = (jax.random.normal(jax.random.key(6), (n, 16)) * 0.5).astype(dt)

    def runf(x):
        def step(c, _):
            return den(c, tbb, eb), None
        y, _ = jax.lax.scan(step, x, None, length=9)
        return y

    return den, xb, tbb, eb, runf


def time_compiled(runf, xb, opts, iters=5, k=9):
    """Compile runf with the given compiler options and return
    (ms_per_forward, error_or_None)."""
    try:
        compiled = jax.jit(runf).lower(xb).compile(compiler_options=opts)
    except Exception as e:
        return None, f'compile failed: {str(e)[:140]}'
    o = compiled(xb)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [compiled(xb) for _ in range(iters)]
    jax.block_until_ready(outs)
    return round((time.perf_counter() - t0) / iters / k * 1e3, 2), None


def run_sweep(variants, base_opts=None, iters=5):
    """Time each (name, opts) variant; returns {name: ms_or_None}."""
    _, xb, _, _, runf = build_forward()
    results = {}
    for name, opts in variants:
        ms, err = time_compiled(runf, xb, {**(base_opts or {}), **opts},
                                iters=iters)
        results[name] = ms
        print(f'{name:26s}: {ms if ms is not None else err} ms', flush=True)
    return results

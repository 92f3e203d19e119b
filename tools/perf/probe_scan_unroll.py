"""Probe: does unrolling the 9-step reverse-DDPM scan buy anything?

Rationale: the layout probe (PERF_NOTES "activation layout") measured that
XLA overlaps fusion boundaries well *within* one program — a dot pair costs
the same as a single dot.  A `lax.scan` iteration boundary is a hard
barrier that prevents that overlap across denoise steps, and the shipping
forward runs ~23.7 ms against a ~19.7 ms pure-traffic bound, leaving a few
ms of potentially hideable boundary latency.  `unroll=k` (or a full Python
unroll — the step count is static) lets the scheduler overlap the epilogue
of step i with the prologue of step i+1.

Measures the full shipping chain shape per step: fast-path U-Net forward +
DDPM update + per-step gaussian draw, 51200-row fold, bf16, with the
shipping tuned compiler options.
"""
import time

import jax
import jax.numpy as jnp

from _harness import build_forward, N
from mocodad_tpu.diffusion import make_schedule
from mocodad_tpu.ops.xla_tuning import tuned_compiler_options

den, xb, tbb, eb, _ = build_forward()
sched = make_schedule(10)
ts_host = list(range(9, 0, -1))


def update(x, eps, t_concrete_or_traced, z, *, concrete_t=None):
    if concrete_t is not None:
        a = float(sched.alpha[concrete_t])
        ah = float(sched.alpha_hat[concrete_t])
        be = float(sched.beta[concrete_t])
        c1, c2, c3 = (1.0 / a ** 0.5, (1.0 - a) / (1.0 - ah) ** 0.5,
                      be ** 0.5)
        c1 = jnp.asarray(c1, x.dtype)
        c2 = jnp.asarray(c2, x.dtype)
        c3 = jnp.asarray(c3, x.dtype) if concrete_t > 1 else jnp.asarray(
            0.0, x.dtype)
        return c1 * (x - c2 * eps) + c3 * z
    t = t_concrete_or_traced
    a = jnp.asarray(sched.alpha)[t]
    ah = jnp.asarray(sched.alpha_hat)[t]
    be = jnp.asarray(sched.beta)[t]
    c1 = (1.0 / jnp.sqrt(a)).astype(x.dtype)
    c2 = ((1.0 - a) / jnp.sqrt(1.0 - ah)).astype(x.dtype)
    c3 = jnp.where(t > 1, jnp.sqrt(be), 0.0).astype(x.dtype)
    return c1 * (x - c2 * eps) + c3 * z


def chain_scan(unroll):
    ts = jnp.arange(9, 0, -1)

    def fn(x0, key):
        keys = jax.random.split(key, 9)

        def step(x, inp):
            t, k = inp
            tb = jnp.full((x.shape[0],), t, jnp.int32)
            eps = den(x, tb, eb)
            z = jax.random.normal(k, x.shape, x.dtype)
            return update(x, eps, t, z), None

        x, _ = jax.lax.scan(step, x0, (ts, keys), unroll=unroll)
        return x

    return fn


def chain_python():
    def fn(x0, key):
        keys = jax.random.split(key, 9)
        x = x0
        for i, t in enumerate(ts_host):
            tb = jnp.full((x.shape[0],), t, jnp.int32)
            eps = den(x, tb, eb)
            z = jax.random.normal(keys[i], x.shape, x.dtype)
            x = update(x, eps, None, z, concrete_t=t)
        return x

    return fn


def measure(name, fn, opts):
    try:
        compiled = jax.jit(fn).lower(xb, jax.random.key(0)).compile(
            compiler_options=opts)
    except Exception as e:
        print(f'{name:28s}: compile failed {str(e)[:120]}', flush=True)
        return None
    import numpy as np
    np.asarray(compiled(xb, jax.random.key(1)))
    t0 = time.perf_counter()
    last = None
    for i in range(5):
        last = compiled(xb, jax.random.key(2 + i))
    np.asarray(last)
    ms = (time.perf_counter() - t0) / 5 / 9 * 1e3
    print(f'{name:28s}: {ms:.2f} ms/forward', flush=True)
    return ms


if __name__ == '__main__':
    opts = tuned_compiler_options()
    print(f'rows={N}, bf16, tuned compiler options', flush=True)
    measure('scan unroll=1 (shipping)', chain_scan(1), opts)
    measure('scan unroll=3', chain_scan(3), opts)
    measure('scan unroll=9', chain_scan(9), opts)
    measure('python unroll (const t)', chain_python(), opts)

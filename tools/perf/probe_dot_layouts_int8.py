"""Layout/int8 probes, round 2: amortize dispatch by scanning the op k
times inside ONE jit program (carry-serialized so nothing is DCE'd)."""
import os
import sys
import time
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))
import jax, jax.numpy as jnp

N, TV, C = 51200, 102, 32
key = jax.random.key(0)
K_ITERS = 50


def scan_time(body, x, iters=3, k=K_ITERS):
    """ms per body application, measured inside one jit via lax.scan."""
    @jax.jit
    def run(x):
        def step(c, _):
            return body(c), None
        y, _ = jax.lax.scan(step, x, None, length=k)
        return y
    o = run(x); jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [run(x) for _ in range(iters)]
    jax.block_until_ready(outs)
    per_call = (time.perf_counter() - t0) / iters
    return round(per_call / k * 1e3, 3)


k_op = jax.random.normal(key, (TV, TV), jnp.bfloat16)
w = jax.random.normal(key, (C, C), jnp.bfloat16)

x1 = jax.random.normal(key, (TV, N, C), jnp.bfloat16)
print('graph dot (TV,N,C)   :',
      scan_time(lambda x: jnp.einsum('kx,xnc->knc', k_op, x), x1), 'ms')

x2 = jax.random.normal(key, (C, TV, N), jnp.bfloat16)
print('graph dot (C,TV,N)   :',
      scan_time(lambda x: jnp.einsum('kx,cxn->ckn', k_op, x), x2), 'ms')

x3 = jax.random.normal(key, (TV, N * C), jnp.bfloat16)
print('graph dot 2-D flat   :',
      scan_time(lambda x: k_op @ x, x3), 'ms')

print('chan dot  (TV,N,C)   :',
      scan_time(lambda x: jnp.einsum('knc,co->kno', x, w), x1), 'ms')
print('pair      (TV,N,C)   :',
      scan_time(lambda x: jnp.einsum(
          'knc,co->kno', jnp.einsum('kx,xnc->knc', k_op, x), w), x1), 'ms')
print('pair      (C,TV,N)   :',
      scan_time(lambda x: jnp.einsum(
          'co,ckn->okn', w, jnp.einsum('kx,cxn->ckn', k_op, x)), x2), 'ms')

# elementwise-only baseline: streaming bound reference
print('elementwise x*1.01   :',
      scan_time(lambda x: x * jnp.bfloat16(1.01), x1), 'ms')

# int8 dot (s32 out, requant to s8)
k8 = (k_op.astype(jnp.float32) * 10).astype(jnp.int8)
x8 = (jax.random.normal(key, (TV, N, C)) * 20).astype(jnp.int8)
print('int8 graph dot + rq  :',
      scan_time(lambda x: jnp.clip(jax.lax.dot_general(
          k8, x, (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.int32) // 16, -127, 127
          ).astype(jnp.int8), x8), 'ms')

"""Parameter initializers matching the distributions the reference model
trains from (PyTorch defaults + the custom adjacency init at
models/gcae/stsgcn.py:134-140).

Torch's Conv2d/Linear default is kaiming_uniform(a=sqrt(5)) which reduces
to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weights and biases.  Flax's
defaults (lecun_normal, zero bias) differ; we pin the torch-like
distributions so training dynamics are comparable to the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def uniform_symmetric(bound: float):
    """U(-bound, +bound)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_linear_weight(key, shape, dtype=jnp.float32):
    """Dense kernel of shape (fan_in, fan_out): U(+-1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_for_fan_in(fan_in: int):
    return uniform_symmetric(float(fan_in) ** -0.5)


def adjacency_init(normalizer_dim_index: int):
    """U(+-1/sqrt(shape[normalizer_dim_index])) — the reference initializes
    A (T,V,V) with stdv=1/sqrt(V) and T (V,T,T) with stdv=1/sqrt(T), both
    taken from `.size(1)` (models/gcae/stsgcn.py:134-140)."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / (shape[normalizer_dim_index] ** 0.5)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init

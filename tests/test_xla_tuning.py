"""The tuned compiler options must never leak onto non-TPU backends:
the CPU/GPU compilers reject unknown xla_tpu_* options, and the test
suite itself runs on CPU (conftest pins JAX_PLATFORMS=cpu)."""
import jax
import jax.numpy as jnp

from mocodad_tpu.ops.xla_tuning import (_TPU_EVAL_OPTIONS,
                                        tuned_compiler_options)


def test_off_tpu_returns_empty():
    assert jax.default_backend() == 'cpu'
    assert tuned_compiler_options() == {}


def test_option_set_is_stringly_typed():
    # compiler_options values must be strings (XLA parses them)
    for k, v in _TPU_EVAL_OPTIONS.items():
        assert k.startswith('xla_tpu_'), k
        assert isinstance(v, str), (k, v)


def test_eval_step_jit_accepts_empty_options():
    # the wiring path: jax.jit(..., compiler_options={}) must behave
    # exactly like a plain jit on CPU
    f = jax.jit(lambda x: x * 2 + 1, compiler_options={})
    out = f(jnp.arange(4.0))
    assert out.tolist() == [1.0, 3.0, 5.0, 7.0]

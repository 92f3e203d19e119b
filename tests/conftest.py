"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (the TPU-native analogue of
"test multi-node without a cluster"; see SURVEY.md section 4).

Must run before jax is imported anywhere in the test process.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    flags = (flags + ' --xla_force_host_platform_device_count=8').strip()
# 8 virtual devices on 1 host core: collective rendezvous can starve
# past the default 30/40s hard-kill window under compile load.  Guard
# each flag on its own presence — never duplicate/override a user value.
for _f in ('xla_cpu_collective_timeout_seconds',
           'xla_cpu_collective_call_terminate_timeout_seconds'):
    if _f not in flags:
        flags += f' --{_f}=600'
os.environ['XLA_FLAGS'] = flags

import jax  # noqa: E402

# The image's shell profile pins JAX_PLATFORMS to the TPU plugin; the env var
# alone is not reliably honored, so force the platform through jax.config too
# (must happen before any backend is initialized).
jax.config.update('jax_platforms', 'cpu')

# Persist compiled executables: jit compiles dominate suite wall-time on
# this 1-core host, and many tests re-trace identical programs (e.g. the
# resume test builds three Trainers). Re-runs of the suite then load from
# disk instead of recompiling.
jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.cache/jax_comp_tests'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == 'cpu', 'tests must run on the CPU backend'
assert jax.device_count() == 8, 'tests expect an 8-device virtual CPU mesh'


@pytest.fixture
def rng():
    return np.random.default_rng(0)

"""Process-level runtime setup (utils/runtime.py): the persistent
compilation cache the CLIs enable so repeat runs skip XLA compiles."""

import jax
import pytest

from mocodad_tpu.utils.runtime import enable_compilation_cache


@pytest.fixture(autouse=True)
def _restore_cache_config():
    """conftest points this process at the shared test cache; put it back
    so later tests keep hitting it."""
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_on = jax.config.jax_enable_compilation_cache
    yield
    jax.config.update('jax_compilation_cache_dir', prev_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', prev_min)
    jax.config.update('jax_enable_compilation_cache', prev_on)


def test_enable_compilation_cache_sets_config(tmp_path, monkeypatch):
    monkeypatch.delenv('MOCODAD_COMPILATION_CACHE_DIR', raising=False)
    d = str(tmp_path / 'comp')
    got = enable_compilation_cache(d)
    assert got == d
    assert jax.config.jax_compilation_cache_dir == d
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 10


def test_enable_compilation_cache_env_and_disable(tmp_path, monkeypatch):
    d = str(tmp_path / 'env_comp')
    monkeypatch.setenv('MOCODAD_COMPILATION_CACHE_DIR', d)
    assert enable_compilation_cache() == d
    monkeypatch.setenv('MOCODAD_COMPILATION_CACHE_DIR', '0')
    assert enable_compilation_cache() is None
    # must actively disable: JAX natively honors an exported
    # JAX_COMPILATION_CACHE_DIR, so a bare early-return would not
    assert jax.config.jax_enable_compilation_cache is False


def test_user_min_compile_time_not_clobbered(tmp_path, monkeypatch):
    monkeypatch.delenv('MOCODAD_COMPILATION_CACHE_DIR', raising=False)
    monkeypatch.setenv('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0')
    before = jax.config.jax_persistent_cache_min_compile_time_secs
    enable_compilation_cache(str(tmp_path / 'c'))
    assert jax.config.jax_persistent_cache_min_compile_time_secs == before

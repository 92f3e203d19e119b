"""Process-level JAX runtime setup shared by the CLIs.

The reference has no equivalent (torch caches kernels in-process only);
under XLA a cold process re-compiles every jitted program, and the tuned
eval sampling chain takes minutes to compile at production dataset sizes.
The persistent compilation cache turns every run after the first into a
cache hit, so repeated evals/predicts cost data + compute only.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = '~/.cache/jax_comp'


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache (idempotent).

    Resolution order: explicit argument, `MOCODAD_COMPILATION_CACHE_DIR`
    env var, `JAX_COMPILATION_CACHE_DIR` env var, `~/.cache/jax_comp`
    (shared with bench.py so CLI and bench runs seed each other).  Set
    `MOCODAD_COMPILATION_CACHE_DIR=0` to disable.  Returns the directory
    in use, or None when disabled.
    """
    cache_dir = (cache_dir
                 or os.environ.get('MOCODAD_COMPILATION_CACHE_DIR')
                 or os.environ.get('JAX_COMPILATION_CACHE_DIR')
                 or _DEFAULT_CACHE_DIR)
    import jax
    if str(cache_dir).strip().lower() in ('0', 'off', 'false', 'none', ''):
        # actively disable: JAX natively honors an exported
        # JAX_COMPILATION_CACHE_DIR, so returning early would leave the
        # cache on despite the documented =0 disable
        jax.config.update('jax_enable_compilation_cache', False)
        return None
    cache_dir = os.path.expanduser(cache_dir)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    # skip trivially-fast programs (writing them costs more than
    # re-tracing) — unless the user pinned their own threshold
    if 'JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS' not in os.environ:
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    return cache_dir

"""Measured XLA-TPU compiler options for the eval hot path.

The compiled U-Net forward is HBM-bound on fusion-boundary traffic
(PERF_NOTES.md "Roofline": 17.1 GB moved vs a 3.4 GB minimum).  A
compiler-option sweep (tools/perf/probe_xla_flags.py, probe_xla_flags2.py)
over libtpu 0.0.34's fusion/VMEM/scheduler knobs found one combination
that actually moves the needle on the 51200-row forward:

  multi-level input+output dot-dot fusion + 96 MiB scoped VMEM
  + scavenge-VMEM-for-fusions
      -> 23.65 ms vs 25.74 ms baseline (-8.1%)

(multilevel dot-dot alone -4%, +scoped-VMEM-96M -6.4%, +scavenge -8.1%;
64M/80M/112M scoped VMEM all worse than 96M.)  Everything else measured
neutral (rwb/copy/nested-loop fusion, layout negotiation, experimental
scheduler/cost model, autotune flags, multi-output-fusion limit,
nested-dot VMEM fraction) or crashes the remote tpu_compile_helper
(dot_dot_fusion, exec-time-effort, opt-level overrides).

These flags are TPU-only: `tuned_compiler_options()` returns {} on other
backends (the CPU test suite would reject unknown options).
"""
from typing import Dict

_TPU_EVAL_OPTIONS = {
    'xla_tpu_enable_multi_level_input_dot_dot_fusion': 'true',
    'xla_tpu_enable_multi_level_output_dot_dot_fusion': 'true',
    'xla_tpu_scoped_vmem_limit_kib': '98304',
    'xla_tpu_scavenge_vmem_for_fusions': 'true',
}


def tuned_compiler_options() -> Dict[str, str]:
    """Compiler options for jit-compiling the eval/sampling path; empty
    off-TPU."""
    import jax
    try:
        backend = jax.default_backend()
    except Exception:
        return {}
    if backend in ('tpu', 'axon'):
        return dict(_TPU_EVAL_OPTIONS)
    return {}

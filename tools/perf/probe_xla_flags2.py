"""Probe round 2: optimization-effort knobs + combos on top of the
winners from probe_xla_flags.py (multilevel dot-dot fusion -3.5%,
scoped VMEM 96M -2.3%, combo 25.1 ms vs 26.0 baseline)."""
from _harness import run_sweep

WIN = {'xla_tpu_enable_multi_level_input_dot_dot_fusion': 'true',
       'xla_tpu_enable_multi_level_output_dot_dot_fusion': 'true',
       'xla_tpu_scoped_vmem_limit_kib': '98304'}

VARIANTS = [
    ('baseline', {}),
    ('combo_prev', dict(WIN)),
    ('exec_effort_1', {'xla_experimental_exec_time_optimization_effort':
                       '1.0'}),
    ('opt_level_3', {'xla_optimization_level': '3'}),
    ('combo+effort', {**WIN,
                      'xla_experimental_exec_time_optimization_effort':
                      '1.0'}),
    ('vmem_112m', {'xla_tpu_scoped_vmem_limit_kib': '114688'}),
    ('combo_vmem112', {**WIN, 'xla_tpu_scoped_vmem_limit_kib': '114688'}),
    ('autotune_dots', {'xla_tpu_autotune_dots': 'true',
                       'xla_tpu_autotune_fusions': 'true'}),
    ('ml_dotdot_only',
     {'xla_tpu_enable_multi_level_input_dot_dot_fusion': 'true',
      'xla_tpu_enable_multi_level_output_dot_dot_fusion': 'true'}),
]

run_sweep(VARIANTS)

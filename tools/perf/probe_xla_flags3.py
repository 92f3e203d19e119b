"""Probe round 3: refine around the winner (multilevel dot-dot fusion +
scoped VMEM 96M = 24.1 ms vs 25.74 baseline)."""
from _harness import run_sweep

ML = {'xla_tpu_enable_multi_level_input_dot_dot_fusion': 'true',
      'xla_tpu_enable_multi_level_output_dot_dot_fusion': 'true'}

VARIANTS = [
    ('winner(ml+96m)', {**ML, 'xla_tpu_scoped_vmem_limit_kib': '98304'}),
    ('ml+64m', {**ML, 'xla_tpu_scoped_vmem_limit_kib': '65536'}),
    ('ml+80m', {**ML, 'xla_tpu_scoped_vmem_limit_kib': '81920'}),
    ('winner+scavenge', {**ML, 'xla_tpu_scoped_vmem_limit_kib': '98304',
                         'xla_tpu_scavenge_vmem_for_fusions': 'true'}),
    ('winner+mof_limit', {**ML, 'xla_tpu_scoped_vmem_limit_kib': '98304',
                          'xla_tpu_multi_output_fusion_limit': '64'}),
    ('winner+nested_vmem_frac',
     {**ML, 'xla_tpu_scoped_vmem_limit_kib': '98304',
      'xla_tpu_nested_dot_fusion_vmem_fraction': '0.9'}),
]

run_sweep(VARIANTS)

"""Re-sweep the winning compiler knobs on the ASSOC-form forward (the
association rewrite changed the dot DAG, so the scoped-VMEM optimum and
fusion toggles may have shifted).  Uses the dispatch-amortized harness."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.expanduser('~/.cache/jax_comp'))

from _harness import run_sweep

BASE = {
    'xla_tpu_enable_multi_level_input_dot_dot_fusion': 'true',
    'xla_tpu_enable_multi_level_output_dot_dot_fusion': 'true',
    'xla_tpu_scoped_vmem_limit_kib': '98304',
    'xla_tpu_scavenge_vmem_for_fusions': 'true',
}

variants = [
    ('tuned (shipping)', {}),
    ('vmem 80M', {'xla_tpu_scoped_vmem_limit_kib': '81920'}),
    ('vmem 112M', {'xla_tpu_scoped_vmem_limit_kib': '114688'}),
    ('vmem 128M', {'xla_tpu_scoped_vmem_limit_kib': '131072'}),
    ('no scavenge', {'xla_tpu_scavenge_vmem_for_fusions': 'false'}),
    ('no input dotdot',
     {'xla_tpu_enable_multi_level_input_dot_dot_fusion': 'false'}),
    ('no output dotdot',
     {'xla_tpu_enable_multi_level_output_dot_dot_fusion': 'false'}),
]

if __name__ == '__main__':
    run_sweep(variants, base_opts=BASE)

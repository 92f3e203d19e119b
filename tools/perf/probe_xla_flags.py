"""Probe: XLA TPU compiler-option sweep over the shipping fast path.

The compiled forward is HBM-bound on fusion-boundary traffic (17.1 GB vs
a 3.4 GB minimum; PERF_NOTES.md "Roofline").  libtpu exposes fusion /
scoped-VMEM / scheduler knobs that the default pipeline keeps
conservative; this sweep times the 51200-row forward under each
candidate set via `Lowered.compile(compiler_options=...)`, which reaches
the compiler even through the axon tunnel.

Flag names enumerated from `strings libtpu.so` (libtpu 0.0.34).
Measured results in PERF_NOTES.md "Round-3 lever results".
"""
from _harness import run_sweep, time_compiled, build_forward

VARIANTS = [
    ('baseline', {}),
    ('scoped_vmem_64m', {'xla_tpu_scoped_vmem_limit_kib': '65536'}),
    ('scoped_vmem_96m', {'xla_tpu_scoped_vmem_limit_kib': '98304'}),
    ('scavenge_vmem', {'xla_tpu_scavenge_vmem_for_fusions': 'true',
                       'xla_tpu_override_scavenge_vmem_for_fusions': 'true'}),
    ('dot_dot_fusion', {'xla_tpu_dot_dot_fusion': 'true',
                        'xla_tpu_enable_dot_dot_fusion_duplicated': 'true'}),
    ('multilevel_dot_dot',
     {'xla_tpu_enable_multi_level_input_dot_dot_fusion': 'true',
      'xla_tpu_enable_multi_level_output_dot_dot_fusion': 'true'}),
    ('nested_loop_fusion',
     {'xla_tpu_enable_multi_level_nested_loop_fusion': 'true'}),
    ('fusion_cost_model',
     {'xla_tpu_enable_experimental_fusion_cost_model': 'true'}),
    ('aggressive_loop_layout',
     {'xla_tpu_enable_aggressive_loop_fusion_layout_opt': 'true'}),
    ('rwb_fusion', {'xla_tpu_rwb_fusion': 'true'}),
    ('sched_experimental',
     {'xla_tpu_enable_all_experimental_scheduler_features': 'true'}),
    ('layout_negotiation', {'xla_tpu_allow_layout_negotiation': 'true'}),
    ('copy_fusion', {'xla_tpu_enable_copy_fusion': 'true',
                     'xla_tpu_copy_fusion_allow_split': 'true'}),
    ('exec_time_effort_1',
     {'xla_experimental_exec_time_optimization_effort': '1.0'}),
    ('opt_level_3', {'xla_optimization_level': '3'}),
]

results = run_sweep(VARIANTS)
base = results.get('baseline')
if base:
    winners = {n for n, m in results.items()
               if m is not None and m < base * 0.97 and n != 'baseline'}
    if winners:
        combo = {}
        for name, opts in VARIANTS:
            if name in winners:
                combo.update(opts)
        _, xb, _, _, runf = build_forward()
        ms, err = time_compiled(runf, xb, combo)
        print(f'{"combo(winners)":26s}: {ms if ms is not None else err} ms',
              flush=True)
    else:
        print('no variant beat baseline by >3%', flush=True)

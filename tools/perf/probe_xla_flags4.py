"""Probe round 4: additive sweep on top of the shipped winner set
(ops/xla_tuning.py = multilevel dot-dot fusion + 96M scoped VMEM +
scavenge, 23.65 ms).  Candidates target the post-dot adds
(join_mxu_result_add), bf16 vector packing, schedulers, and DMA paths.
Result: every variant within +-0.2%; two crash the remote compiler."""
from _harness import run_sweep

from mocodad_tpu.ops.xla_tuning import _TPU_EVAL_OPTIONS as TUNED

VARIANTS = [
    ('tuned(shipping)', {}),
    ('join_mxu_result_add', {'xla_tpu_join_mxu_result_add': 'true'}),
    ('latency_hiding_sched', {'xla_tpu_enable_latency_hiding_scheduler':
                              'true'}),
    ('ilp_lh_sched', {'xla_tpu_enable_ilp_latency_hiding_scheduler':
                      'true'}),
    ('layer_sched+overlap',
     {'xla_tpu_enable_latency_hiding_layer_scheduler': 'true',
      'xla_tpu_enable_multi_compute_overlap_in_layer_scheduler': 'true'}),
    ('bf16_slp_vectorizer', {'xla_tpu_enable_bf16_slp_vectorizer': 'true'}),
    ('packed_bf16_math', {'xla_tpu_impure_enable_packed_bf16_math_ops':
                          'true'}),
    ('pack_loads', {'xla_tpu_pack_vloads': 'true',
                    'xla_tpu_pack_cloads': 'true'}),
    ('vmem_to_vmem_dmas', {'xla_tpu_enable_vmem_to_vmem_dmas': 'true'}),
    ('rm_bf16_bitcasts', {'xla_tpu_remove_bf16_bitcast_converts_for_all':
                          'true'}),
    ('input_conv_multi_users', {'xla_tpu_input_conv_multi_users': 'true'}),
    ('pipelined_loop_unroll', {'xla_tpu_enable_pipelined_loop_unrolling':
                               'true'}),
    ('depth_mem_pressure',
     {'xla_tpu_enable_depth_memory_pressure_reduction': 'true'}),
    ('x8_producers_into_conv',
     {'xla_tpu_fuse_non_trivial_x8_producers_into_conv_like': 'true'}),
]

run_sweep(VARIANTS, base_opts=dict(TUNED))

"""Re-measure compiled HBM traffic of the 51200-row forward with the
shipped compiler-option set vs untuned (updates the 17.1 GB figure in
PERF_NOTES "Roofline")."""
import re

import jax

from _harness import build_forward
from mocodad_tpu.ops.xla_tuning import _TPU_EVAL_OPTIONS as TUNED

den, xb, tbb, eb, _ = build_forward()

for name, opts in [('untuned', {}), ('tuned', dict(TUNED))]:
    compiled = jax.jit(lambda x: den(x, tbb, eb)).lower(xb).compile(
        compiler_options=opts)
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    gb = ca.get('bytes accessed', 0) / 1e9
    gf = ca.get('flops', 0) / 1e9
    print(f'{name}: {gb:.2f} GB accessed, {gf:.1f} GFLOP', flush=True)
    hlo = compiled.as_text()
    for op in ('convolution', 'fusion', 'copy'):
        n_op = len(re.findall(rf'=\s+\S+\s+{op}\(', hlo))
        print(f'  {op} ops: {n_op}', flush=True)

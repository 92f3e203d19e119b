from mocodad_tpu.parallel.distributed import (  # noqa: F401
    is_main_process, make_global_batch, maybe_initialize)
from mocodad_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, make_mesh, replicated_sharding, shard_batch)

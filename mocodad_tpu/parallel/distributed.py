"""Multi-host (multi-process) initialization: the DCN story.

The reference's distribution story ends at single-host DDP
(train_MoCoDAD.py:70-72, NCCL via Lightning).  On TPU, scaling past one
host means one JAX process per host, `jax.distributed.initialize` to form
the global runtime, and a mesh over `jax.devices()` (which then spans all
processes); XLA routes data-parallel collectives over ICI within a slice
and DCN across slices — no NCCL-style code.

`maybe_initialize` is a no-op unless a coordinator is configured, so every
single-process entry point can call it unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize the multi-process JAX runtime when configured.

    Configuration sources, in precedence order:
      1. explicit arguments;
      2. MOCODAD_COORDINATOR / MOCODAD_NUM_PROCESSES / MOCODAD_PROCESS_ID
         env vars (generic, used by the 2-process CPU test);
      3. TPU pod metadata (JAX discovers it natively) when
         JAX_COORDINATOR_ADDRESS is set by the launcher.

    Must run before any JAX backend initialization.  Returns True when the
    distributed runtime was initialized by this call.
    """
    coordinator_address = (coordinator_address
                           or os.environ.get('MOCODAD_COORDINATOR')
                           or os.environ.get('JAX_COORDINATOR_ADDRESS'))
    if coordinator_address is None:
        return False
    if num_processes is None:
        num_processes = int(os.environ.get('MOCODAD_NUM_PROCESSES', '0')) \
            or None
    if process_id is None:
        pid = os.environ.get('MOCODAD_PROCESS_ID')
        process_id = int(pid) if pid is not None else None
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0


def make_global_batch(batch: dict, sharding) -> dict:
    """Assemble a globally-sharded batch from per-process local shards.

    Each process passes its LOCAL slice of the batch (local_batch_size =
    global // process_count); the result is a jax.Array spanning the global
    mesh, with each device holding its own shard — the multi-host analogue
    of `shard_batch`.
    """
    return {k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()}

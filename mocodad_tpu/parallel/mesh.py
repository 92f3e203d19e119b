"""Device-mesh construction and sharding helpers.

Replaces the reference's Lightning DDPStrategy + NCCL allreduce
(train_MoCoDAD.py:70-72) with jax.sharding: a 1-D 'data' mesh over the
chips, batches sharded along it, parameters/optimizer state replicated.
Gradient reduction is inserted by XLA (psum over ICI) when the jitted
train step consumes a sharded batch and produces replicated updates — no
explicit collectives needed at this model scale.

The same code paths drive a single chip (mesh of 1), a real multi-chip
slice, or the 8-device virtual CPU mesh used in tests
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = 'data') -> Mesh:
    """1-D data-parallel mesh over the first n available devices."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if n_devices > len(devices):
                raise ValueError(
                    f'requested {n_devices} devices, have {len(devices)}')
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = 'data') -> NamedSharding:
    """Shard along the leading (batch) axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_grouped_batch(batch: dict, mesh: Mesh,
                        axis_name: str = 'data') -> dict:
    """Place (K, B, ...) stacked index-batches (the multi-step-per-dispatch
    train path) with the SECOND axis — the batch axis — sharded over the
    mesh; the scan axis K is replicated.  Single-process only (the grouped
    path is disabled on multi-host meshes, training/loop.py)."""
    assert jax.process_count() == 1, \
        'grouped batches are single-process only'
    sh = NamedSharding(mesh, P(None, axis_name))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = 'data') -> dict:
    """Place every array in the batch with its leading axis sharded over
    the mesh.  Single-process: a plain sharded device_put.  Multi-process
    (multi-host DCN): each process contributes its local rows and the
    result is a global jax.Array (see parallel/distributed.py)."""
    sh = batch_sharding(mesh, axis_name)
    n_dev = mesh.shape[axis_name]
    rows = next(iter(batch.values())).shape[0]
    if rows % n_dev:
        raise ValueError(
            f'batch rows ({rows}) must be divisible by the mesh '
            f"'{axis_name}' axis ({n_dev} devices) — set batch_size to a "
            f'multiple of the device count (loaders pad every batch to '
            f'batch_size, so configuring that suffices)')
    if jax.process_count() > 1:
        # Every process's loader yields the same (seeded) global batch and
        # contributes its own contiguous row range.  Host cost note: each
        # host therefore materializes the FULL global batch in RAM before
        # slicing — fine at the few-host scale this model needs, O(hosts)
        # waste at pod scale, where the loader should shard files per
        # process instead (build_dataset consumes a directory tree, so a
        # per-process subset of clips is the natural unit).
        from mocodad_tpu.parallel.distributed import make_global_batch
        n_proc, pid = jax.process_count(), jax.process_index()
        if n_proc > 8 and not getattr(shard_batch, '_warned_pod_scale',
                                      False):
            import sys
            print(f'WARNING: {n_proc} processes each load the full global '
                  'batch host-side; shard the data tree per process at '
                  'this scale', file=sys.stderr)
            shard_batch._warned_pod_scale = True
        local = {}
        for k, v in batch.items():
            rows = v.shape[0]
            assert rows % n_proc == 0, (
                f'global batch {rows} not divisible by {n_proc} processes')
            rpp = rows // n_proc
            local[k] = v[pid * rpp:(pid + 1) * rpp]
        return make_global_batch(local, sh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}

"""Multi-host runtime helpers.

The reference is strictly single-process / single-GPU (SURVEY.md §2.2).  On
TPU pods this framework scales with:

- :func:`initialize` — ``jax.distributed.initialize`` wrapper (no-op when
  single-process) so every host joins the same runtime,
- :func:`host_shard` — slice a global host batch to this process's rows before
  ``device_put`` (input data rides DCN host-locally; gradients psum over ICI
  via the pjit mesh in :mod:`.mesh`),
- :func:`make_global_batch_sharding` — ``NamedSharding`` for
  ``jax.make_array_from_process_local_data`` style global batches.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the distributed runtime; safe no-op for single-process runs."""
    if num_processes in (None, 1) and jax.process_count() == 1 \
            and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard(batch, *, process_index: int | None = None,
               process_count: int | None = None):
    """Slice the global batch to this host's contiguous rows."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count

    def slc(x):
        x = np.asarray(x)
        per = x.shape[0] // pc
        return x[pi * per : (pi + 1) * per]

    return jax.tree_util.tree_map(slc, batch)


def make_global_batch_sharding(mesh: Mesh, data_axis: str = "data"):
    return NamedSharding(mesh, P(data_axis))


def replicate_global(mesh: Mesh, x):
    """Fully-replicated global array from identical per-process host data.

    Multi-host ``device_put`` can't target non-addressable devices; the
    replicated layout is assembled per-process instead (every host must hold
    the same values — the every-host-reads-everything input model used by the
    epoch loops).  Single-process this is a plain replicated device_put."""
    sharding = NamedSharding(mesh, P())

    def build(a):
        a = np.asarray(a)
        if jax.process_count() == 1:
            return jax.device_put(a, sharding)
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx: a[idx])

    return jax.tree_util.tree_map(build, x)


def global_batch_from_local(mesh: Mesh, local_batch, data_axis: str = "data"):
    """Assemble a global sharded array from per-process local data
    (multi-host input pipeline; single-process this is just device_put)."""
    sharding = make_global_batch_sharding(mesh, data_axis)

    def build(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(build, local_batch)

"""Multi-host helpers (parallel/distributed.py) — single-process semantics
plus simulated multi-process slicing."""

import jax
import jax.numpy as jnp
import numpy as np

from lrp_imagecaptioning_tpu.config import MeshConfig
from lrp_imagecaptioning_tpu.parallel import build_mesh
from lrp_imagecaptioning_tpu.parallel.distributed import (
    global_batch_from_local,
    host_shard,
    initialize,
)


def test_initialize_single_process_noop():
    initialize()  # must not raise / must not try to contact a coordinator
    assert jax.process_count() == 1


def test_host_shard_slices_contiguous_rows():
    batch = {"x": np.arange(24).reshape(8, 3), "y": np.arange(8)}
    shards = [host_shard(batch, process_index=i, process_count=4)
              for i in range(4)]
    for i, s in enumerate(shards):
        np.testing.assert_array_equal(s["y"], np.arange(8)[i * 2:(i + 1) * 2])
    # concatenating all host shards reconstructs the global batch
    np.testing.assert_array_equal(
        np.concatenate([s["x"] for s in shards]), batch["x"])


def test_global_batch_from_local_single_process(eight_devices):
    mesh = build_mesh(MeshConfig(data_parallel=8, model_parallel=1),
                      eight_devices)
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    arr = global_batch_from_local(mesh, x)
    assert arr.shape == (16, 4)
    np.testing.assert_array_equal(np.asarray(arr), x)
    # sharded over the data axis: each device holds 2 rows
    assert len(arr.sharding.device_set) == 8
    shard = arr.addressable_shards[0]
    assert shard.data.shape == (2, 4)


def test_host_shard_then_global_matches_direct(eight_devices):
    """The multi-host input recipe (host_shard -> global_batch_from_local)
    reproduces the single-host device_put result for process_count=1."""
    mesh = build_mesh(MeshConfig(data_parallel=8, model_parallel=1),
                      eight_devices)
    batch = np.random.default_rng(0).normal(size=(8, 5)).astype(np.float32)
    local = host_shard(batch)  # single process: identity
    arr = global_batch_from_local(mesh, local)
    np.testing.assert_array_equal(np.asarray(arr), batch)
    direct = jax.device_put(
        jnp.asarray(batch),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
    np.testing.assert_array_equal(np.asarray(arr), np.asarray(direct))

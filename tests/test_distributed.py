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


def test_two_real_processes_match_single_process(tmp_path):
    """THE multi-host proof: two actual OS processes join one JAX runtime
    (local coordinator, gloo CPU collectives, 4 virtual devices each), feed
    per-process host rows through host_shard + global_batch_from_local
    (executing its process_count>1 / make_array_from_process_local_data
    branch), run one psum XE step over the global dp8 mesh, and agree with
    the single-process 8-device result bit-for-bit at f32 tolerance."""
    import json
    import os
    import subprocess
    import sys

    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.config import (
        ExperimentConfig, MeshConfig, ModelConfig, TrainConfig,
    )
    from lrp_imagecaptioning_tpu.data import toy_dataset
    from lrp_imagecaptioning_tpu.engine.train import Trainer
    from lrp_imagecaptioning_tpu.parallel import batch_sharding

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")
    port = str(15000 + os.getpid() % 10000)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device split
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(pid), "2", port, str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=repo))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]

    results = [json.loads(o.read_text()) for o in outs]
    assert all(r["process_count"] == 2 for r in results)
    # both processes read identical replicated outputs
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["fc_sum"] == results[1]["fc_sum"]

    # single-process reference on THIS process's 8 in-process devices:
    # identical config/seed/batch
    train_ds, _, wm = toy_dataset(
        num_images=8, captions_per_image=2, max_len=10,
        from_features=True, num_regions=8, feat_dim=12, seed=3,
    )
    model = ModelConfig(
        model_type="gridtd", encoder="bu", embed_dim=16, hidden_dim=24,
        num_pixels=8, bu_feat_dim=12, vocab_size=len(wm),
        vocab_pad_multiple=8,
    )
    mesh_cfg = MeshConfig(data_parallel=8, model_parallel=1)
    exp = ExperimentConfig(model=model, train=TrainConfig(batch_size=8),
                           mesh=mesh_cfg)
    trainer = Trainer(exp, wm)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = next(train_ds.train_batches(8, shuffle=False))
    bs = batch_sharding(trainer.mesh, mesh_cfg)
    state, loss, acc = trainer.compiled_xe_step()(
        state, jax.device_put(jnp.asarray(batch.images), bs),
        jax.device_put(jnp.asarray(batch.captions), bs),
        jax.random.PRNGKey(7))
    fc = np.asarray(state.params.decoder.fc.weight)

    np.testing.assert_allclose(results[0]["loss"], float(loss), rtol=1e-6)
    np.testing.assert_allclose(results[0]["acc"], float(acc), rtol=1e-6)
    np.testing.assert_allclose(results[0]["fc_sum"], float(fc.sum()),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(results[0]["fc_abs_sum"],
                               float(np.abs(fc).sum()), rtol=1e-5)

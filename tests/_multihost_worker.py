"""Subprocess worker for the REAL multi-process multi-host test.

Launched by tests/test_distributed.py with two processes (gloo CPU
collectives, local coordinator).  Each process owns 4 virtual CPU devices of
a global 8-device dp mesh and runs THREE phases, writing results to a JSON
file for the parent to compare against single-process runs:

1. **one psum XE step** — per-process host rows through ``host_shard`` +
   ``global_batch_from_local`` (the ``process_count > 1`` branch —
   ``jax.make_array_from_process_local_data``),
2. **a real two-epoch ``Trainer.fit``** — epoch loop + beam validate +
   per-epoch Orbax checkpoint save, all under 2 processes (the epoch loop's
   every-host-reads-everything input model: identical seeded dataset order,
   each process uploads only its host_shard rows),
3. **one SCST batch** — exercising the global-corpus reward path: rollout
   tokens come back fully replicated so every process computes the reward
   over the global 2B-item corpus (reference per-batch idf semantics,
   modelutils.py:216-223); pinned equal to the single-process reward.

Not a test module (leading underscore): pytest does not collect it.
"""

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]
    share_dir = sys.argv[5]  # parent tmp_path: checkpoint root (shared fs)

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from lrp_imagecaptioning_tpu.parallel.distributed import initialize

    initialize(f"localhost:{port}", num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nprocs

    import jax.numpy as jnp
    import numpy as np

    from lrp_imagecaptioning_tpu.config import (
        ExperimentConfig, MeshConfig, ModelConfig, TrainConfig,
    )
    from lrp_imagecaptioning_tpu.data import toy_dataset
    from lrp_imagecaptioning_tpu.engine.train import Trainer
    from lrp_imagecaptioning_tpu.parallel import build_mesh
    from lrp_imagecaptioning_tpu.parallel.distributed import (
        global_batch_from_local,
        host_shard,
    )

    # identical deterministic config on every process (tests/test_train.py's
    # make_exp shape)
    train_ds, val_ds, wm = toy_dataset(
        num_images=8, captions_per_image=2, max_len=10,
        from_features=True, num_regions=8, feat_dim=12, seed=3,
    )
    model = ModelConfig(
        model_type="gridtd", encoder="bu", embed_dim=16, hidden_dim=24,
        num_pixels=8, bu_feat_dim=12, vocab_size=len(wm),
        vocab_pad_multiple=8,
    )
    mesh_cfg = MeshConfig(data_parallel=4 * nprocs, model_parallel=1)
    exp = ExperimentConfig(model=model, train=TrainConfig(batch_size=8),
                           mesh=mesh_cfg)
    mesh = build_mesh(mesh_cfg, jax.devices())
    trainer = Trainer(exp, wm, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))

    batch = next(train_ds.train_batches(8, shuffle=False))
    # THE multi-host input recipe: slice my host's rows, assemble globally
    local = host_shard({"images": batch.images, "captions": batch.captions})
    global_batch = global_batch_from_local(trainer.mesh, local)
    assert not global_batch["images"].sharding.is_fully_addressable

    step = trainer.compiled_xe_step()
    state, loss, acc = step(state, global_batch["images"],
                            global_batch["captions"], jax.random.PRNGKey(7))

    # fully-replicated outputs are host-readable on every process
    fc = np.asarray(state.params.decoder.fc.weight)
    result = {
        "process_id": pid,
        "process_count": jax.process_count(),
        "loss": float(loss),
        "acc": float(acc),
        "fc_sum": float(fc.sum()),
        "fc_abs_sum": float(np.abs(fc).sum()),
    }

    # ---- phase 2: real two-epoch fit + beam validate + Orbax save --------
    fit_exp = ExperimentConfig(
        model=model,
        train=TrainConfig(batch_size=8, epochs=2, print_freq=1000),
        mesh=mesh_cfg, save_path=os.path.join(share_dir, "ckpts"),
    )
    fit_trainer = Trainer(fit_exp, wm, mesh=mesh)
    fit_state, history = fit_trainer.fit(train_ds, val_ds,
                                         save_checkpoints=True)
    fit_fc = np.asarray(fit_state.params.decoder.fc.weight)
    result["fit_history"] = [
        {"loss": h["loss"], "bleu4": h["bleu4"], "cider": h["cider"]}
        for h in history
    ]
    result["fit_fc_sum"] = float(fit_fc.sum())
    result["fit_fc_abs_sum"] = float(np.abs(fit_fc).sum())

    # ---- phase 3: one SCST batch with the global-corpus reward -----------
    scst_exp = ExperimentConfig(
        model=model,
        train=TrainConfig(batch_size=8, cider_tune=True, max_caption_len=10),
        mesh=mesh_cfg,
    )
    scst_trainer = Trainer(scst_exp, wm, mesh=mesh)
    scst_state = scst_trainer.init_state(jax.random.PRNGKey(0))
    scst_batch = next(train_ds.train_batches(8, shuffle=False))
    scst_state, scst_loss, scst_rew = scst_trainer.scst_batch(
        scst_state, scst_batch, jax.random.PRNGKey(11), 9)
    scst_fc = np.asarray(scst_state.params.decoder.fc.weight)
    result["scst_loss"] = float(scst_loss)
    result["scst_reward"] = float(scst_rew)
    result["scst_fc_sum"] = float(scst_fc.sum())

    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"[worker {pid}] ok: {result}", flush=True)


if __name__ == "__main__":
    main()

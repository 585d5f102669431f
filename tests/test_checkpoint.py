"""Orbax checkpoint round-trip with the reference naming/bookkeeping, and
sharded-mesh round trips (save under one mesh layout, restore under another —
the classic Orbax silent-failure surface for multi-chip deployment)."""

import jax
import jax.numpy as jnp
import numpy as np

from lrp_imagecaptioning_tpu.config import (
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)
from lrp_imagecaptioning_tpu.data import toy_dataset
from lrp_imagecaptioning_tpu.engine.checkpoint import (
    find_best_checkpoint,
    load_for_eval,
    restore_checkpoint,
    save_checkpoint,
)
from lrp_imagecaptioning_tpu.engine.train import Trainer
from lrp_imagecaptioning_tpu.parallel import batch_sharding, build_mesh


def test_checkpoint_roundtrip(tmp_path):
    _, _, wm = toy_dataset(num_images=4, captions_per_image=1, max_len=6,
                           from_features=True, num_regions=4, feat_dim=8)
    model = ModelConfig(model_type="gridtd", encoder="bu", embed_dim=8,
                        hidden_dim=12, num_pixels=4, bu_feat_dim=8,
                        vocab_size=len(wm))
    trainer = Trainer(
        ExperimentConfig(model=model, train=TrainConfig(batch_size=8)), wm
    )
    state = trainer.init_state(jax.random.PRNGKey(0))

    p1 = save_checkpoint("toy", 0, 0, state, 0.1, 0.25, str(tmp_path), "bu")
    p2 = save_checkpoint("toy", 1, 1, state, 0.2, 0.75, str(tmp_path), "bu")
    assert "cider_0.7500" in p2

    best = find_best_checkpoint(str(tmp_path), "bu", "toy")
    assert best == p2

    state2 = trainer.init_state(jax.random.PRNGKey(1))
    restored, meta = restore_checkpoint(p2, state2)
    np.testing.assert_allclose(
        np.asarray(restored.params.decoder.fc.weight),
        np.asarray(state.params.decoder.fc.weight),
    )
    assert meta["epoch"] == 1 and abs(meta["cider"] - 0.75) < 1e-6

    params = load_for_eval(p1, state2)
    np.testing.assert_allclose(
        np.asarray(params.decoder.embedding),
        np.asarray(state.params.decoder.embedding),
    )

def _leaves_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for la, lb in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def _mesh_trainer(wm, mesh_cfg, devices):
    model = ModelConfig(model_type="gridtd", encoder="bu", embed_dim=16,
                        hidden_dim=24, num_pixels=8, bu_feat_dim=12,
                        vocab_size=len(wm), vocab_pad_multiple=8)
    exp = ExperimentConfig(model=model, train=TrainConfig(batch_size=8),
                           mesh=mesh_cfg)
    n = mesh_cfg.data_parallel * mesh_cfg.model_parallel
    return Trainer(exp, wm, mesh=build_mesh(mesh_cfg, devices[:n]))


def test_sharded_checkpoint_roundtrip_across_meshes(tmp_path, eight_devices):
    """Save a dp8-sharded TrainState; restore onto dp8, dp4xmp2 (vocab-dim
    model-parallel resharding), and a single device — bitwise-equal params
    and opt_state everywhere, and the dp4xmp2 restore continues training
    (one finite XE step from the restored state)."""
    train_ds, _, wm = toy_dataset(
        num_images=8, captions_per_image=2, max_len=10,
        from_features=True, num_regions=8, feat_dim=12, seed=3,
    )
    t8 = _mesh_trainer(wm, MeshConfig(data_parallel=8, model_parallel=1),
                       eight_devices)
    state = t8.init_state(jax.random.PRNGKey(0))
    # advance one real step so opt_state carries non-init moments
    batch = next(train_ds.train_batches(8, shuffle=False))
    bs = batch_sharding(t8.mesh, t8.exp.mesh)
    state, loss, _ = t8.compiled_xe_step()(
        state, jax.device_put(jnp.asarray(batch.images), bs),
        jax.device_put(jnp.asarray(batch.captions), bs),
        jax.random.PRNGKey(7))
    assert np.isfinite(float(loss))
    want_params = jax.tree_util.tree_map(np.asarray, state.params)
    want_opt = jax.tree_util.tree_map(np.asarray, state.opt_state)

    path = save_checkpoint("toy", 3, 1, state, 0.3, 0.5, str(tmp_path), "bu")

    for name, mesh_cfg in [
        ("dp8", MeshConfig(data_parallel=8, model_parallel=1)),
        ("dp4mp2", MeshConfig(data_parallel=4, model_parallel=2)),
        ("single", MeshConfig(data_parallel=1, model_parallel=1)),
    ]:
        tr = _mesh_trainer(wm, mesh_cfg, eight_devices)
        template = tr.init_state(jax.random.PRNGKey(9))
        restored, meta = restore_checkpoint(path, template)
        assert meta["epoch"] == 3 and abs(meta["cider"] - 0.5) < 1e-6, name
        _leaves_equal(restored.params, want_params)
        _leaves_equal(restored.opt_state, want_opt)
        # restored leaves carry the TEMPLATE mesh's shardings
        fc = restored.params.decoder.fc.weight
        assert fc.sharding.mesh.shape == tr.mesh.shape, name
        if mesh_cfg.model_parallel > 1:
            assert "model" in jax.tree_util.tree_leaves(
                [fc.sharding.spec])[0:1][0] or fc.sharding.spec[0] == "model", name

    # the cross-layout restore continues training
    tr = _mesh_trainer(wm, MeshConfig(data_parallel=4, model_parallel=2),
                       eight_devices)
    restored, _ = restore_checkpoint(
        path, tr.init_state(jax.random.PRNGKey(11)))
    bs = batch_sharding(tr.mesh, tr.exp.mesh)
    state2, loss2, _ = tr.compiled_xe_step()(
        restored, jax.device_put(jnp.asarray(batch.images), bs),
        jax.device_put(jnp.asarray(batch.captions), bs),
        jax.random.PRNGKey(8))
    assert np.isfinite(float(loss2)), float(loss2)

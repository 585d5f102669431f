"""Training engine: XE learns on toy data over the 8-device mesh; sharded vs
single-device numerical equality; SCST step runs end-to-end; LR plateau decay."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.config import ExperimentConfig, MeshConfig, ModelConfig, TrainConfig
from lrp_imagecaptioning_tpu.data import toy_dataset
from lrp_imagecaptioning_tpu.engine.train import Trainer
from lrp_imagecaptioning_tpu.parallel import build_mesh


def make_exp(word_map, **train_kw):
    model = ModelConfig(
        model_type="gridtd", encoder="bu", embed_dim=16, hidden_dim=24,
        num_pixels=8, bu_feat_dim=12, vocab_size=len(word_map),
        vocab_pad_multiple=8,  # model-parallel divisibility + MXU tiling
    )
    train = TrainConfig(batch_size=8, ss_prob=None, **train_kw)
    return ExperimentConfig(model=model, train=train)


@pytest.fixture(scope="module")
def toy():
    return toy_dataset(
        num_images=8, captions_per_image=2, max_len=10,
        from_features=True, num_regions=8, feat_dim=12, seed=3,
    )


def test_xe_loss_decreases(toy, eight_devices):
    train_ds, val_ds, wm = toy
    # random-token toy captions learn slowly under the reference's tight
    # elementwise clip; loosen for the smoke test
    exp = make_exp(wm, grad_clip=5.0, decoder_lr=2e-3)
    trainer = Trainer(exp, wm)
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng)
    losses = []
    for epoch in range(12):
        state, loss, rng = trainer.train_epoch_xe(state, train_ds, epoch, rng)
        losses.append(loss)
    assert losses[-1] < losses[0] - 0.1, losses


def test_sharded_matches_single_device(toy, eight_devices):
    train_ds, _, wm = toy
    batch = next(train_ds.train_batches(8, shuffle=False))
    rng = jax.random.PRNGKey(1)

    results = {}
    for name, mesh_cfg in [
        ("single", MeshConfig(data_parallel=1, model_parallel=1)),
        ("dp8", MeshConfig(data_parallel=8, model_parallel=1)),
        ("dp4mp2", MeshConfig(data_parallel=4, model_parallel=2)),
    ]:
        devices = eight_devices[: mesh_cfg.data_parallel * mesh_cfg.model_parallel]
        exp = make_exp(wm).replace(mesh=mesh_cfg)
        trainer = Trainer(exp, wm, mesh=build_mesh(mesh_cfg, devices))
        state = trainer.init_state(rng)
        step = trainer.compiled_xe_step()
        from lrp_imagecaptioning_tpu.parallel import batch_sharding

        bs = batch_sharding(trainer.mesh, mesh_cfg)
        state, loss, acc = step(
            state,
            jax.device_put(jnp.asarray(batch.images), bs),
            jax.device_put(jnp.asarray(batch.captions), bs),
            jax.random.PRNGKey(7),
        )
        results[name] = (float(loss), np.asarray(state.params.decoder.fc.weight))

    for name in ("dp8", "dp4mp2"):
        np.testing.assert_allclose(
            results[name][0], results["single"][0], rtol=1e-5,
            err_msg=f"{name} loss mismatch",
        )
        np.testing.assert_allclose(
            results[name][1], results["single"][1], rtol=1e-4, atol=1e-6,
            err_msg=f"{name} params mismatch",
        )


def test_scst_sharded_matches_single_device(toy, eight_devices):
    """The SCST step splits rows over the mesh's data axis (committed batch
    shardings drive GSPMD — without them the batch stays replicated) and its
    numerics match single-device, like the XE step."""
    train_ds, _, wm = toy
    batch = next(train_ds.train_batches(8, shuffle=False))
    from lrp_imagecaptioning_tpu.parallel import batch_sharding

    results = {}
    for name, mesh_cfg in [
        ("single", MeshConfig(data_parallel=1, model_parallel=1)),
        ("dp8", MeshConfig(data_parallel=8, model_parallel=1)),
        ("dp4mp2", MeshConfig(data_parallel=4, model_parallel=2)),
    ]:
        devices = eight_devices[: mesh_cfg.data_parallel * mesh_cfg.model_parallel]
        exp = make_exp(wm, cider_tune=True).replace(mesh=mesh_cfg)
        trainer = Trainer(exp, wm, mesh=build_mesh(mesh_cfg, devices))
        state = trainer.init_state(jax.random.PRNGKey(0))
        state2, loss, _ = trainer.scst_batch(
            state, batch, jax.random.PRNGKey(5), num_steps=9
        )
        results[name] = (float(loss), np.asarray(state2.params.decoder.fc.weight))
        # the fused rollout's encoded features must actually shard over 'data'
        bs = batch_sharding(trainer.mesh, mesh_cfg)
        img = jax.device_put(jnp.asarray(batch.images), bs)
        ro = trainer._jit("scst_encode_rollout", trainer.scst_encode_rollout,
                          static_argnums=(2,))
        raw, *_ = ro(state, img, 9, jax.random.PRNGKey(5))
        if mesh_cfg.data_parallel > 1:
            assert raw.sharding.spec[0] == "data", raw.sharding

    for name in ("dp8", "dp4mp2"):
        np.testing.assert_allclose(results[name][0], results["single"][0],
                                   rtol=1e-5, err_msg=f"{name} loss mismatch")
        np.testing.assert_allclose(results[name][1], results["single"][1],
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"{name} params mismatch")


def test_lrp_modes_sharded_match_single_device(toy, eight_devices):
    """The LRP-weighted modes (lrp_tune step, lrp_cider batch) also split
    rows over the mesh data axis and match single-device numerics —
    completing the 4-mode x mesh matrix (XE and SCST pinned above)."""
    train_ds, _, wm = toy
    batch = next(train_ds.train_batches(8, shuffle=False))
    meshes = [
        ("single", MeshConfig(data_parallel=1, model_parallel=1)),
        ("dp4mp2", MeshConfig(data_parallel=4, model_parallel=2)),
    ]

    for mode_kw, run in [
        ({"lrp_tune": True}, "lrp_xe"),
        ({"lrp_cider_tune": True}, "lrp_scst"),
    ]:
        results = {}
        for name, mesh_cfg in meshes:
            devices = eight_devices[: mesh_cfg.data_parallel
                                    * mesh_cfg.model_parallel]
            exp = make_exp(wm, **mode_kw).replace(mesh=mesh_cfg)
            trainer = Trainer(exp, wm, mesh=build_mesh(mesh_cfg, devices))
            state = trainer.init_state(jax.random.PRNGKey(0))
            if run == "lrp_xe":
                from lrp_imagecaptioning_tpu.parallel import (
                    batch_sharding, replicated,
                )
                bs = batch_sharding(trainer.mesh, mesh_cfg)
                step = trainer._jit(
                    "lrp_xe", trainer.lrp_xe_step,
                    in_shardings=(None, bs, bs, replicated(trainer.mesh)),
                )
                img = jax.device_put(jnp.asarray(batch.images), bs)
                caps = jax.device_put(jnp.asarray(batch.captions), bs)
                state2, loss, _ = step(state, img, caps, jax.random.PRNGKey(7))
            else:
                state2, loss, _ = trainer.lrp_scst_batch(
                    state, batch, jax.random.PRNGKey(7), num_steps=9)
            results[name] = (
                float(loss), np.asarray(state2.params.decoder.fc.weight))

        np.testing.assert_allclose(
            results["dp4mp2"][0], results["single"][0], rtol=1e-5,
            err_msg=f"{run} loss mismatch")
        np.testing.assert_allclose(
            results["dp4mp2"][1], results["single"][1], rtol=1e-4, atol=1e-6,
            err_msg=f"{run} params mismatch")


def test_scst_step_runs(toy, eight_devices):
    train_ds, _, wm = toy
    exp = make_exp(wm, cider_tune=True)
    trainer = Trainer(exp, wm)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = next(train_ds.train_batches(8, shuffle=False))
    state2, loss, reward = trainer.scst_batch(
        state, batch, jax.random.PRNGKey(5), num_steps=9
    )
    assert np.isfinite(loss)
    # params changed
    assert not np.allclose(
        np.asarray(state.params.decoder.fc.weight),
        np.asarray(state2.params.decoder.fc.weight),
    )


def test_scst_ce_anchor(toy):
    """Beyond-reference: scst_ce_weight mixes a teacher-forced CE term into
    the SCST loss (collapse guard, docs/QUALITY.md). Weight 0 must reproduce
    the reference loss exactly."""
    train_ds, _, wm = toy
    batch = next(train_ds.train_batches(8, shuffle=False))
    losses = {}
    for w in (0.0, 1.0):
        exp = make_exp(wm, cider_tune=True, scst_ce_weight=w)
        trainer = Trainer(exp, wm)
        state = trainer.init_state(jax.random.PRNGKey(0))
        _, loss, _ = trainer.scst_batch(
            state, batch, jax.random.PRNGKey(5), num_steps=9
        )
        losses[w] = loss
    assert np.isfinite(losses[0.0]) and np.isfinite(losses[1.0])
    # the CE anchor is positive at init, so the mixed loss is strictly larger
    assert losses[1.0] > losses[0.0]


def test_lr_plateau_decay(toy):
    _, _, wm = toy
    trainer = Trainer(make_exp(wm), wm)
    state = trainer.init_state(jax.random.PRNGKey(0))
    lr0 = trainer.current_lr(state)
    state = trainer.decay_lr(state)
    assert abs(trainer.current_lr(state) - lr0 * 0.8) < 1e-9
    # floor: decay below 2e-5 is a no-op
    for _ in range(40):
        state = trainer.decay_lr(state)
    assert trainer.current_lr(state) >= 2e-5 * 0.8 - 1e-12


def test_validate_produces_scores(toy):
    train_ds, val_ds, wm = toy
    trainer = Trainer(make_exp(wm), wm)
    state = trainer.init_state(jax.random.PRNGKey(0))
    bleu, cider = trainer.validate(state, val_ds, beam_size=2, eval_batch=4,
                                   max_cap_length=8)
    assert 0.0 <= bleu <= 1.0
    assert cider >= 0.0


def test_lrp_scst_ce_anchor_mixes_in(toy, eight_devices):
    """The LRP-SCST step supports the same scst_ce_weight teacher-forced CE
    anchor as plain SCST (collapse guard, docs/QUALITY.md): with the anchor
    on, the loss includes the CE term and the update differs from the
    unanchored step under identical RNG."""
    train_ds, _, wm = toy
    batch = next(train_ds.train_batches(8, shuffle=False))
    losses, fcs = {}, {}
    for w in (0.0, 1.0):
        exp = make_exp(wm, lrp_cider_tune=True, scst_ce_weight=w)
        trainer = Trainer(exp, wm)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state2, loss, _ = trainer.lrp_scst_batch(
            state, batch, jax.random.PRNGKey(5), num_steps=9)
        losses[w] = float(loss)
        fcs[w] = np.asarray(state2.params.decoder.fc.weight)
    assert np.isfinite(losses[0.0]) and np.isfinite(losses[1.0])
    # CE term is positive at init: anchored loss strictly larger
    assert losses[1.0] > losses[0.0] + 0.1, losses
    assert not np.allclose(fcs[0.0], fcs[1.0])

"""LRP-inference fine-tuning: weight properties, oracle parity for the weight
split, and the lrp / lrp_cider trainer modes end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lrp_imagecaptioning_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
from lrp_imagecaptioning_tpu.data import toy_dataset
from lrp_imagecaptioning_tpu.engine.train import Trainer
from lrp_imagecaptioning_tpu.models import gridtd
from lrp_imagecaptioning_tpu.models.lrp_tuning import (
    forward_lrp_context,
    lrp_weight_step,
    sample_lrp,
    stop_word_mask,
)
from lrp_imagecaptioning_tpu.ops.relevance import stabilize


def make_model(V=20, H=12, E=8, P=4, seed=0):
    cfg = ModelConfig(embed_dim=E, hidden_dim=H, vocab_size=V, num_pixels=P)
    params = gridtd.init_gridtd(jax.random.PRNGKey(seed), cfg, raw_dim=6)
    raw = jax.random.normal(jax.random.PRNGKey(seed + 1), (3, P, 6))
    feats = gridtd.encode_features(params, raw, raw.mean(1))
    return cfg, params, feats


def test_lrp_weight_step_properties_and_oracle():
    cfg, params, feats = make_model()
    B, H, V = 3, 12, 20
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(B, V)).astype(np.float32)) * 3
    h2 = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(B, H)).astype(np.float32))
    # stop-mask: make item 1's argmax a stop word
    labels = np.asarray(jnp.argmax(logits, -1))
    stop = np.zeros(V, bool)
    stop[labels[1]] = True
    w_ctx, w_h2 = lrp_weight_step(params, logits, h2, ctx, jnp.asarray(stop))
    w_ctx, w_h2 = np.asarray(w_ctx), np.asarray(w_h2)
    assert (w_ctx >= 0).all() and (w_ctx <= 2).all()
    # stop-word rows normalize to all-ones (utils.py:58-64 zero->1)
    np.testing.assert_allclose(w_ctx[1], 1.0)
    np.testing.assert_allclose(w_h2[1], 1.0)

    # oracle for item 0 (reference formulas, gridTDmodel.py:560-575)
    b = 0
    eps = 0.01
    fc_w = np.asarray(params.fc.weight, np.float64)
    lg = np.asarray(logits[b], np.float64)
    tgt = labels[b]
    word_rel = np.zeros(V)
    word_rel[tgt] = lg[tgt]
    mix = np.asarray(h2[b] + ctx[b], np.float64)
    z = np.asarray(stabilize(jnp.asarray(lg)), np.float64)
    r_mix = mix * ((word_rel / z) @ fc_w)
    zmix = np.asarray(stabilize(jnp.asarray(mix)), np.float64)
    r_ctx = np.asarray(ctx[b], np.float64) / zmix * r_mix
    m = np.abs(r_ctx).max()
    want = r_ctx / (m if m > 0 else 1.0) + 1.0
    np.testing.assert_allclose(w_ctx[0], want, rtol=1e-4, atol=1e-5)


def test_forward_lrp_context_shapes_and_diff():
    cfg, params, feats = make_model()
    wm_stop = jnp.zeros(20, bool)
    caps = jnp.array([[18, 1, 2, 3, 19, 0]] * 3, jnp.int32)
    logits, weighted = jax.jit(
        lambda: forward_lrp_context(params, feats, caps, wm_stop, num_steps=5)
    )()
    assert logits.shape == (3, 5, 20) and weighted.shape == (3, 5, 20)
    assert not np.allclose(np.asarray(logits), np.asarray(weighted))
    # standard logits must equal the plain forward (no dropout)
    plain, _, _ = gridtd.forward(params, feats, caps, num_steps=5, train=False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(plain),
                               rtol=2e-5, atol=1e-5)


def test_sample_lrp_runs():
    cfg, params, feats = make_model()
    toks, lps = jax.jit(
        lambda r: sample_lrp(
            params, feats, jnp.zeros(20, bool), r,
            start_token=18, end_token=19, num_steps=6,
        )
    )(jax.random.PRNGKey(0))
    assert toks.shape == (3, 6)
    assert np.isfinite(np.asarray(lps)).all()


@pytest.fixture(scope="module")
def toy():
    return toy_dataset(
        num_images=8, captions_per_image=2, max_len=10,
        from_features=True, num_regions=8, feat_dim=12, seed=3,
    )


def _trainer(wm, **train_kw):
    model = ModelConfig(
        model_type="gridtd", encoder="bu", embed_dim=16, hidden_dim=24,
        num_pixels=8, bu_feat_dim=12, vocab_size=len(wm), vocab_pad_multiple=8,
    )
    return Trainer(
        ExperimentConfig(model=model, train=TrainConfig(batch_size=8, **train_kw)),
        wm,
    )


def test_trainer_lrp_mode(toy):
    train_ds, _, wm = toy
    trainer = _trainer(wm, lrp_tune=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    fc_before = np.asarray(state.params.decoder.fc.weight).copy()
    state2, loss, _ = trainer.train_epoch_lrp(
        state, train_ds, 0, jax.random.PRNGKey(1)
    )
    assert np.isfinite(loss)
    assert not np.allclose(fc_before, np.asarray(state2.params.decoder.fc.weight))


def test_trainer_lrp_cider_mode(toy):
    train_ds, _, wm = toy
    trainer = _trainer(wm, lrp_cider_tune=True)
    state = trainer.init_state(jax.random.PRNGKey(0))
    batch = next(train_ds.train_batches(8, shuffle=False))
    state2, loss, reward = trainer.lrp_scst_batch(
        state, batch, jax.random.PRNGKey(2), num_steps=9
    )
    assert np.isfinite(loss)

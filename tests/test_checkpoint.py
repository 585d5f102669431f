"""Orbax checkpoint round-trip with the reference naming/bookkeeping."""

import jax
import numpy as np

from lrp_imagecaptioning_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
from lrp_imagecaptioning_tpu.data import toy_dataset
from lrp_imagecaptioning_tpu.engine.checkpoint import (
    find_best_checkpoint,
    load_for_eval,
    restore_checkpoint,
    save_checkpoint,
)
from lrp_imagecaptioning_tpu.engine.train import Trainer


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

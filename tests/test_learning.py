"""End-to-end learning smoke signal: on the learnable toy dataset the full
pipeline (encode -> scan forward -> CE -> pjit update -> beam validate ->
CIDEr) must drive CIDEr well above zero.  Catches silent target-misalignment
bugs no unit test sees."""

import contextlib
import io

import jax
import pytest

from lrp_imagecaptioning_tpu.config import ExperimentConfig, ModelConfig, TrainConfig
from lrp_imagecaptioning_tpu.data import toy_dataset
from lrp_imagecaptioning_tpu.engine.train import Trainer


@pytest.mark.slow
def test_xe_training_learns_toy_mapping():
    train_ds, val_ds, wm = toy_dataset(
        num_images=8, captions_per_image=2, max_len=8,
        from_features=True, num_regions=8, feat_dim=12, seed=3,
        learnable=True,
    )
    model = ModelConfig(
        model_type="gridtd", encoder="bu", embed_dim=16, hidden_dim=24,
        num_pixels=8, bu_feat_dim=12, vocab_size=len(wm), vocab_pad_multiple=8,
    )
    exp = ExperimentConfig(
        model=model,
        train=TrainConfig(batch_size=8, grad_clip=5.0, decoder_lr=3e-3),
    )
    tr = Trainer(exp, wm)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    for epoch in range(30):
        with contextlib.redirect_stdout(io.StringIO()):
            state, loss, rng = tr.train_epoch_xe(state, train_ds, epoch, rng)
    bleu, cider = tr.validate(state, val_ds, beam_size=2, eval_batch=8,
                              max_cap_length=6)
    assert cider > 1.0, (loss, bleu, cider)

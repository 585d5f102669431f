"""Trainable ResNet BatchNorm for ``finetune_encoder`` (train.py:95-109).

The reference fine-tunes the whole encoder with BN layers in train mode
(batch statistics + running-stat updates).  Our inference/LRP path keeps the
folded scale/shift form; these tests pin the train-mode path to torch's
``BatchNorm2d`` semantics and check the fold stays consistent after updates.
"""

import numpy as np
import pytest
import torch

from test_reference_parity import _install_stubs


@pytest.fixture(scope="module")
def ref_resnet():
    import sys

    _install_stubs()
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models.resnet as mod

    return mod


def test_train_mode_forward_matches_torch(ref_resnet):
    """Whole-net train-mode forward + running-stat update vs the reference
    ResNet-50 in .train() mode."""
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.models.resnet import (
        load_torch_resnet_state,
        resnet_forward_train,
    )

    torch.manual_seed(11)
    model = ref_resnet.resnet50(pretrained=False)
    # randomize running stats so the update is visible
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = load_torch_resnet_state(sd, "resnet50")

    rng = np.random.default_rng(11)
    img = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)

    model.train()
    want = model(torch.tensor(img)).detach().numpy().transpose(0, 2, 3, 1)
    got, new_params = resnet_forward_train(
        params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    # a single BN layer matches torch to <1e-6 (test below); through 53
    # batch-stat normalizations the fp32 conv-order drift compounds to ~2e-4
    # mean (each layer divides by a batch std computed from as few as 8
    # samples).  Bound the accumulated drift, not the semantics.
    got = np.asarray(got)
    assert np.abs(got - want).mean() <= 1e-3, np.abs(got - want).mean()
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=2e-2)

    # running-stat update parity (torch updated its buffers in-place above)
    sd_after = model.state_dict()
    np.testing.assert_allclose(
        np.asarray(new_params.stem.mean), sd_after["bn1.running_mean"].numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_params.stem.var), sd_after["bn1.running_var"].numpy(),
        rtol=1e-4, atol=1e-5)
    last = new_params.layers[-1][-1].conv3
    np.testing.assert_allclose(
        np.asarray(last.mean), sd_after["layer4.2.bn3.running_mean"].numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(last.var), sd_after["layer4.2.bn3.running_var"].numpy(),
        rtol=1e-4, atol=1e-5)


def test_single_bn_layer_matches_torch_exactly():
    """One BatchNorm2d in train mode: output, running-mean and (unbiased)
    running-var updates match torch to float32 exactness."""
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.models.resnet import ConvBN, bn_train

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    C = 8
    x = rng.normal(size=(2, C, 16, 16)).astype(np.float32) * 3
    tbn = torch.nn.BatchNorm2d(C)
    with torch.no_grad():
        tbn.weight.normal_()
        tbn.bias.normal_()
        tbn.running_mean.normal_()
        tbn.running_var.uniform_(0.5, 1.5)
    # .copy(): tensor.numpy() aliases the live buffers torch's forward mutates
    p = ConvBN(
        jnp.zeros((1, 1, C, C)), jnp.ones(C), jnp.zeros(C), 1,
        gamma=jnp.asarray(tbn.weight.detach().numpy().copy()),
        beta=jnp.asarray(tbn.bias.detach().numpy().copy()),
        mean=jnp.asarray(tbn.running_mean.numpy().copy()),
        var=jnp.asarray(tbn.running_var.numpy().copy()),
    )
    tbn.train()
    want = tbn(torch.tensor(x)).detach().numpy()
    y, p2 = bn_train(p, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), want, atol=2e-6)
    np.testing.assert_allclose(np.asarray(p2.mean),
                               tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2.var),
                               tbn.running_var.numpy(), atol=1e-6)


def test_finetune_encoder_trains_resnet_bn():
    """One XE step with finetune_encoder=True on a resnet encoder: conv
    kernels AND BN gamma/beta move, running stats refresh, and the folded
    scale/shift stays consistent with the raw form (so eval/LRP see the tuned
    BN)."""
    import jax
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.config import (
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.engine.train import Trainer
    from lrp_imagecaptioning_tpu.models.resnet import BN_EPS

    wm = build_word_map([[f"w{i}"] for i in range(10)], min_word_freq=1)
    cfg = ModelConfig(model_type="gridtd", encoder="resnet50", embed_dim=8,
                      hidden_dim=12, vocab_size=len(wm), num_pixels=4)
    exp = ExperimentConfig(
        model=cfg,
        train=TrainConfig(batch_size=8, finetune_encoder=True),
    )
    tr = Trainer(exp, wm)
    state = tr.init_state(jax.random.PRNGKey(0))
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 64, 64, 3))
    caps = jnp.tile(jnp.asarray(
        [[wm.start, 1, 2, 3, wm.end, 0]], jnp.int32), (8, 1))

    # numpy snapshots — the jitted step donates `state`
    before = jax.tree_util.tree_map(np.asarray, state.params.encoder.stem)
    step = tr.compiled_xe_step()
    state2, loss, _ = step(state, images, caps, jax.random.PRNGKey(2))
    assert bool(jnp.isfinite(loss))
    after = state2.params.encoder.stem

    # weights and BN params moved; running stats refreshed
    assert float(jnp.abs(after.weight - before.weight).max()) > 0
    assert float(jnp.abs(after.gamma - before.gamma).max()) > 0
    assert float(jnp.abs(after.beta - before.beta).max()) > 0
    assert float(jnp.abs(after.mean - before.mean).max()) > 0
    assert float(jnp.abs(after.var - before.var).max()) > 0

    # fold consistency: bn_scale/bn_shift reflect the updated raw BN
    np.testing.assert_allclose(
        np.asarray(after.bn_scale),
        np.asarray(after.gamma / jnp.sqrt(after.var + BN_EPS)),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(after.bn_shift),
        np.asarray(after.beta - after.mean * after.bn_scale),
        rtol=1e-5, atol=1e-6)

    # frozen-encoder control: same step with finetune off must not touch it
    exp_frozen = ExperimentConfig(
        model=cfg, train=TrainConfig(batch_size=8, finetune_encoder=False))
    trf = Trainer(exp_frozen, wm)
    statef = trf.init_state(jax.random.PRNGKey(0))
    stem_before = np.asarray(statef.params.encoder.stem.weight)
    statef2, *_ = trf.compiled_xe_step()(
        statef, images, caps, jax.random.PRNGKey(2))
    assert float(jnp.abs(
        statef2.params.encoder.stem.weight - stem_before).max()) == 0

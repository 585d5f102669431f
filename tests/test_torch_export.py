"""JAX -> torch checkpoint export validated by the LIVING reference
(round-2 verdict #6).

The strongest interop evidence: params from THIS framework are exported to
the reference's ``state_dict`` schema, strict-loaded into the actual
reference model on CPU, and the reference then produces token-identical
captions and <=1e-4 logits — i.e. the reference itself validates a
TPU-trained model (writer schema modelutils.py:115-144, loader
test.py:44-50).
"""

import sys
import types

import numpy as np
import pytest
import torch

from test_reference_parity import _install_stubs

E, H, NH = 10, 12, 2
VOCAB_WORDS = 20
IMG = 224


@pytest.fixture(scope="module")
def reference():
    _install_stubs()
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import models.adaptiveattention as ref_ada
    import models.aoamodel as ref_aoa
    import models.gridTDmodel as ref_gridtd
    import models.resnet as ref_resnet
    import models.vgg as ref_vgg

    return types.SimpleNamespace(gridtd=ref_gridtd, aoa=ref_aoa, ada=ref_ada,
                                 vgg=ref_vgg, resnet=ref_resnet)


def _word_map():
    wm = {f"w{i}": i + 1 for i in range(VOCAB_WORDS)}
    wm["<unk>"] = len(wm) + 1
    wm["<start>"] = len(wm) + 1
    wm["<end>"] = len(wm) + 1
    wm["<pad>"] = 0
    return wm


def _build_ref_model(reference, family, seed, encoder="vgg16"):
    torch.manual_seed(seed)
    wm = _word_map()
    vocab = len(wm)
    orig_vgg = reference.vgg.vgg16
    orig_r101 = reference.resnet.resnet101
    reference.vgg.vgg16 = lambda pretrained=True, **kw: orig_vgg(
        pretrained=False, **kw)
    reference.resnet.resnet101 = lambda pretrained=True, **kw: orig_r101(
        pretrained=False, **kw)
    try:
        if family == "gridtd":
            model = reference.gridtd.GridTDModel(E, H, vocab, encoder)
        elif family == "aoa":
            model = reference.aoa.AOAModel(E, H, NH, vocab, encoder)
        elif family == "adaptive":
            model = reference.ada.AdaptiveAttentionCaptioningModel(
                E, H, vocab, encoder)
        elif family == "gridtd_bu":
            model = reference.gridtd.GridTDModelBU(E, H, vocab, "bu")
        elif family == "aoa_bu":
            model = reference.aoa.AOAModelBU(E, H, NH, vocab, "bu")
    finally:
        reference.vgg.vgg16 = orig_vgg
        reference.resnet.resnet101 = orig_r101
    model.eval()
    return model, wm


def _our_model(family, vocab, encoder="vgg16", pad_multiple=8):
    import jax

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.models.captioner import Captioner

    cfg = ModelConfig(
        model_type=family.replace("_bu", ""),
        encoder="bu" if family.endswith("_bu") else encoder,
        embed_dim=E, hidden_dim=H, num_head=NH, vocab_size=vocab,
        vocab_pad_multiple=pad_multiple,
    )
    cap = Captioner(cfg)
    params = cap.init(jax.random.PRNGKey(3))
    return cap, cfg, params


@pytest.mark.slow
@pytest.mark.parametrize("family", ["gridtd", "aoa", "adaptive"])
def test_export_strict_load_and_reference_validates(reference, family):
    """Export OUR random-init params (vocab padded x8 to exercise
    unpadding), strict-load into the real reference model, and require the
    reference's forward/greedy to match ours token-exactly."""
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.data.vocab import WordMap
    from lrp_imagecaptioning_tpu.models.torch_export import export_state_dict

    wm = _word_map()
    cap, cfg, params = _our_model(family, len(wm))
    sd = export_state_dict(params, cfg)

    model, _ = _build_ref_model(reference, family, seed=0)
    missing, unexpected = model.load_state_dict(sd, strict=True), None
    assert not missing.missing_keys and not missing.unexpected_keys
    model.eval()

    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 3, IMG, IMG)).astype(np.float32)
    caps_np = np.zeros((2, 7), np.int64)
    caps_np[:, 0] = wm["<start>"]
    caps_np[:, 1:5] = rng.integers(1, VOCAB_WORDS + 1, size=(2, 4))
    caps_np[:, 5] = wm["<end>"]
    with torch.no_grad():
        ref_logits = model(torch.tensor(img), torch.tensor(caps_np),
                           [6, 6], None)[0].numpy()

    feats = cap.encode(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    logits, *_ = cap.forward(params, feats, jnp.asarray(caps_np, jnp.int32),
                             num_steps=6 - 1, train=False)
    # ours is padded on the vocab dim; compare the real columns
    mae = np.abs(np.asarray(logits)[..., : len(wm)] - ref_logits).mean()
    assert mae <= 1e-4, f"{family}: exported-model logits MAE {mae}"

    with torch.no_grad():
        _, ref_seqs = model.greedy_search(torch.tensor(img), wm,
                                          max_cap_length=12)
    res = cap.greedy(params, feats, WordMap(wm), max_cap_length=12)
    got = np.asarray(res.tokens)
    if family == "aoa":  # AoA greedy returns only the last item's ids
        specials = {wm[s] for s in ("<start>", "<end>", "<unk>", "<pad>")}
        stripped = [int(t) for t in got[1] if int(t) not in specials]
        assert stripped == [int(i) for i in ref_seqs]
    else:
        for b in range(2):
            want = list(ref_seqs[b][1:])
            assert [int(t) for t in got[b]] == want, f"{family} b={b}"


@pytest.mark.parametrize("family", ["gridtd_bu", "aoa_bu"])
def test_export_bu_strict_load(reference, family):
    from lrp_imagecaptioning_tpu.models.torch_export import export_state_dict

    wm = _word_map()
    cap, cfg, params = _our_model(family, len(wm))
    sd = export_state_dict(params, cfg)
    model, _ = _build_ref_model(reference, family, seed=0)
    res = model.load_state_dict(sd, strict=True)
    assert not res.missing_keys and not res.unexpected_keys


@pytest.mark.slow
def test_roundtrip_reference_to_jax_to_reference(reference):
    """reference sd -> convert (torch_weights) -> export (torch_export) must
    reproduce every tensor bit-exactly (vgg16 gridTD)."""
    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.models.captioner import CaptionerParams
    from lrp_imagecaptioning_tpu.models.torch_export import export_state_dict
    from lrp_imagecaptioning_tpu.models.torch_weights import (
        convert_encoder,
        convert_gridtd,
    )

    model, wm = _build_ref_model(reference, "gridtd", seed=4)
    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=E,
                      hidden_dim=H, vocab_size=len(wm))
    sd = model.state_dict()
    params = CaptionerParams(convert_encoder(sd, cfg),
                             convert_gridtd(sd, cfg))
    back = export_state_dict(params, cfg)
    assert set(back) == set(sd.keys())
    for k in sd:
        np.testing.assert_array_equal(
            back[k].numpy(), sd[k].numpy(), err_msg=k)


@pytest.mark.slow
def test_roundtrip_resnet_encoder(reference):
    """resnet101 gridTD round-trip: every tensor equal except the unused
    classifier head (exported as zeros) and num_batches_tracked."""
    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.models.captioner import CaptionerParams
    from lrp_imagecaptioning_tpu.models.torch_export import export_state_dict
    from lrp_imagecaptioning_tpu.models.torch_weights import (
        convert_encoder,
        convert_gridtd,
    )

    model, wm = _build_ref_model(reference, "gridtd", seed=5,
                                 encoder="resnet101")
    cfg = ModelConfig(model_type="gridtd", encoder="resnet101", embed_dim=E,
                      hidden_dim=H, vocab_size=len(wm))
    sd = model.state_dict()
    params = CaptionerParams(convert_encoder(sd, cfg),
                             convert_gridtd(sd, cfg))
    back = export_state_dict(params, cfg)
    assert set(back) == set(sd.keys())
    skip = ("img_encoder.encoder.fc.",)
    for k in sd:
        if any(k.startswith(s) for s in skip):
            continue
        np.testing.assert_allclose(
            back[k].numpy() if back[k].dtype.is_floating_point
            else back[k].numpy(),
            sd[k].numpy(), rtol=0, atol=1e-6, err_msg=k)
    # and the reference loads it strict
    res = model.load_state_dict(back, strict=True)
    assert not res.missing_keys and not res.unexpected_keys


def test_export_torch_cli_roundtrip(reference, tmp_path, eight_devices):
    """Orbax checkpoint -> export_torch.py CLI -> reference strict load."""
    import json

    import jax

    sys.path.insert(0, ".")
    import export_torch as cli

    from lrp_imagecaptioning_tpu.config import ExperimentConfig, ModelConfig
    from lrp_imagecaptioning_tpu.data.vocab import WordMap
    from lrp_imagecaptioning_tpu.engine.checkpoint import save_checkpoint
    from lrp_imagecaptioning_tpu.engine.train import Trainer

    wm_dict = _word_map()
    wm_path = tmp_path / "wm.json"
    wm_path.write_text(json.dumps(wm_dict))
    cfg = ModelConfig(model_type="gridtd", encoder="bu", embed_dim=E,
                      hidden_dim=H, vocab_size=len(wm_dict),
                      vocab_pad_multiple=128)
    trainer = Trainer(ExperimentConfig(model=cfg), WordMap(wm_dict))
    state = trainer.init_state(jax.random.PRNGKey(0))
    ckpt = save_checkpoint("toy", 2, 0, state, 0.1, 0.4,
                           str(tmp_path / "ck"), "bu")

    out = tmp_path / "exported.pth"
    cli.main(["--weight", ckpt, "--wordmap", str(wm_path),
              "--out", str(out), "--model-type", "gridtd",
              "--encoder", "bu", "--embed-dim", str(E),
              "--hidden-dim", str(H), "--epoch", "2", "--cider", "0.4"])
    loaded = torch.load(str(out), map_location="cpu", weights_only=False)
    assert loaded["epoch"] == 2 and loaded["cider"] == 0.4
    model, _ = _build_ref_model(reference, "gridtd_bu", seed=0)
    res = model.load_state_dict(loaded["state_dict"], strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    # exported embedding matches the checkpointed params (unpadded rows)
    np.testing.assert_allclose(
        loaded["state_dict"]["embedding.weight"].numpy(),
        np.asarray(state.params.decoder.embedding)[: len(wm_dict)],
        atol=0, rtol=0)


def test_export_reference_checkpoint_schema(reference, tmp_path):
    """The .pth wrapper matches modelutils.py:131-138 and test.py:44-50
    loads its state_dict."""
    from lrp_imagecaptioning_tpu.models.torch_export import (
        export_reference_checkpoint,
    )

    wm = _word_map()
    cap, cfg, params = _our_model("gridtd_bu", len(wm))
    path = str(tmp_path / "checkpoint_toy_epoch3_cider_0.5.pth")
    export_reference_checkpoint(path, params, cfg, epoch=3, cider=0.5)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert set(ckpt) == {"epoch", "epochs_since_improvement", "bleu-4",
                        "cider", "state_dict", "optimizer"}
    assert ckpt["epoch"] == 3 and ckpt["cider"] == 0.5
    model, _ = _build_ref_model(reference, "gridtd_bu", seed=0)
    res = model.load_state_dict(ckpt["state_dict"], strict=True)
    assert not res.missing_keys and not res.unexpected_keys

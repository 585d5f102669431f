"""THE parity test: run the actual reference implementation (CPU, stubbed
deps) and compare our LRP explanation against it end to end.

Builds the reference ``GridTDModel`` + ``ExplainGridTDAttention`` from
/root/reference with random weights, runs its stash forward + relevance walk +
hook-based CNN LRP on one image, then converts the same weights with
``torch_weights.convert_state_dict`` and runs our jitted pipeline.  Target:
relevance-map MAE <= 1e-4 (BASELINE.md).
"""

import sys
import types

import numpy as np
import pytest
import torch

# ---------------------------------------------------------------------------
# stub the reference's unavailable dependencies BEFORE importing it
# ---------------------------------------------------------------------------


def _install_stubs():
    if "torchvision" in sys.modules and not hasattr(
            sys.modules["torchvision"], "_is_stub"):
        return
    tv = types.ModuleType("torchvision")
    tv._is_stub = True
    tv_models = types.ModuleType("torchvision.models")
    tv_utils = types.ModuleType("torchvision.models.utils")

    def load_state_dict_from_url(url, progress=True):
        raise RuntimeError("no network in tests — use pretrained=False")

    tv_utils.load_state_dict_from_url = load_state_dict_from_url
    tv_transforms = types.ModuleType("torchvision.transforms")
    for name in ["Compose", "Resize", "ToTensor", "Normalize",
                 "ColorJitter", "RandomHorizontalFlip"]:
        setattr(tv_transforms, name, lambda *a, **k: (lambda x: x))
    tv.models = tv_models
    tv.transforms = tv_transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models
    sys.modules["torchvision.models.utils"] = tv_utils
    sys.modules["torchvision.transforms"] = tv_transforms

    if "skimage" not in sys.modules:
        sk = types.ModuleType("skimage")
        sk_t = types.ModuleType("skimage.transform")

        def _stub_pyramid_expand(x, upscale=2, sigma=None, **k):
            # a REAL expansion (the repo's native pyramid): the stub stays in
            # sys.modules for the whole pytest process, so an identity lambda
            # here silently broke later GuidedGradCam tests (r3 ordering bug)
            import numpy as _np

            from lrp_imagecaptioning_tpu.utils.viz import _pyramid_expand

            if sigma is None:
                sigma = 2 * upscale / 6.0
            return _pyramid_expand(_np.asarray(x, _np.float64),
                                   int(upscale), float(sigma))

        sk_t.pyramid_expand = _stub_pyramid_expand
        sk.transform = sk_t
        sys.modules["skimage"] = sk
        sys.modules["skimage.transform"] = sk_t

    try:
        from nltk.corpus import stopwords  # noqa: F401

        stopwords.words("english")
    except Exception:
        nltk = sys.modules.get("nltk") or types.ModuleType("nltk")
        corpus = types.ModuleType("nltk.corpus")

        class _SW:
            @staticmethod
            def words(lang):
                from lrp_imagecaptioning_tpu.models.lrp_tuning import (
                    NLTK_STOPWORDS,
                )

                return list(NLTK_STOPWORDS)

        corpus.stopwords = _SW()
        nltk.corpus = corpus
        sys.modules["nltk"] = nltk
        sys.modules["nltk.corpus"] = corpus


@pytest.fixture(scope="module")
def reference():
    _install_stubs()
    # .cuda() everywhere -> identity on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    sys.path.insert(0, "/root/reference")
    import models.gridTDmodel as ref_gridtd  # noqa: E402

    return ref_gridtd


E, H = 10, 12
VOCAB_WORDS = 20
# the reference AdaptiveAttention hard-codes its projection width to the pixel
# count (196 via `AdaptiveAttention(hidden, 196)`, gridTDmodel.py:127) and its
# forward only broadcasts when P == num_pixel — so parity requires the full
# 224x224 / 14x14 grid.
IMG = 224


def _word_map():
    wm = {f"w{i}": i + 1 for i in range(VOCAB_WORDS)}
    wm["<unk>"] = len(wm) + 1
    wm["<start>"] = len(wm) + 1
    wm["<end>"] = len(wm) + 1
    wm["<pad>"] = 0
    return wm


@pytest.mark.slow
def test_gridtd_lrp_parity_with_reference(reference):
    ref_gridtd = reference
    torch.manual_seed(0)
    wm_dict = _word_map()
    vocab = len(wm_dict)

    # reference model on CPU; pretrained=False via monkeypatching the ctor's
    # encoder build is invasive — instead construct with pretrained disabled
    import models.vgg as ref_vgg

    orig_vgg16 = ref_vgg.vgg16
    ref_vgg.vgg16 = lambda pretrained=True, **kw: orig_vgg16(
        pretrained=False, **kw)
    try:
        model = ref_gridtd.GridTDModel(E, H, vocab, "vgg16")
    finally:
        ref_vgg.vgg16 = orig_vgg16
    model.eval()

    args = types.SimpleNamespace(save_path="/tmp/refparity", dataset="toy",
                                 height=IMG, width=IMG)
    explainer = ref_gridtd.ExplainGridTDAttention(args, wm_dict, model=model)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    explainer.preprocess_img = lambda path: torch.tensor(img)

    # the reference's beam_search floor-divided with `/` (torch 1.4 integer
    # semantics, gridTDmodel.py:444) and crashes on modern torch; the decoded
    # caption is only an *input* to the LRP walk (decode parity is
    # oracle-tested in test_decoding), so fix the caption here.
    fixed_words = ["w3", "w5", "w1", "w7", "w2"]
    fixed_ids = [wm_dict[w] for w in fixed_words]
    model.beam_search = (
        lambda img, wm, beam_size=3, max_cap_length=20:
        ([" ".join(fixed_words)], list(fixed_ids))
    )

    with torch.no_grad():
        explainer.get_hidden_parameters("fake.jpg")
    T = explainer.caption_length
    assert T >= 1
    ts = list(range(min(T, 2)))
    ref_imgfeat, ref_words, ref_pix = [], [], []
    from LRPtools import lrp_wrapper

    lrp_wrapper.add_lrp(model.img_encoder.encoder)
    for t in ts:
        with torch.no_grad():
            r_feat, r_words = explainer.explain_caption_wordt(t)
        r_pix = explainer.explain_cnn(r_feat)
        ref_imgfeat.append(r_feat.detach().numpy())
        ref_words.append(r_words.detach().numpy())
        ref_pix.append(r_pix.detach().numpy())

    # ---- our side with converted weights ------------------------------
    import jax
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward
    from lrp_imagecaptioning_tpu.explain.gridtd_lrp import (
        explain_word,
        stash_forward,
    )
    from lrp_imagecaptioning_tpu.models import gridtd
    from lrp_imagecaptioning_tpu.models.encoders import encode_image_grid
    from lrp_imagecaptioning_tpu.models.torch_weights import (
        convert_encoder,
        convert_gridtd,
    )

    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=E,
                      hidden_dim=H, vocab_size=vocab, num_pixels=196)
    sd = model.state_dict()
    dec = convert_gridtd(sd, cfg)
    enc = convert_encoder(sd, cfg)

    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    raw, avg = encode_image_grid(enc, img_nhwc)
    feats = gridtd.encode_features(dec, raw, avg)

    # drive our stash with the REFERENCE's decoded caption (isolates LRP
    # parity from decode parity; decode parity is oracle-tested separately)
    tokens = jnp.asarray(explainer.beam_caption_encode[:T], jnp.int32)
    stash = stash_forward(dec, feats, tokens, language_double_bias_i=True)

    # stash cross-check vs the reference's stashed tensors
    np.testing.assert_allclose(
        np.asarray(stash.predictions), explainer.predictions.numpy()[:T],
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(stash.h2[1:]), explainer.h2t.numpy()[1 : T + 1],
        rtol=1e-4, atol=1e-5,
    )

    backward, _ = make_vgg_lrp_backward(enc, img_nhwc)
    for i, t in enumerate(ts):
        target = int(explainer.beam_caption_encode[t + 1])
        we = explain_word(dec, feats, stash, jnp.asarray(t),
                          target=jnp.asarray(target))
        # decoder-walk output: (P, C) -> reference (1, C, h, w)
        got_feat = np.asarray(we.r_img_feature).reshape(14, 14, 512)
        want_feat = ref_imgfeat[i][0].transpose(1, 2, 0)
        mae_feat = np.abs(got_feat - want_feat).mean()
        assert mae_feat <= 1e-4, f"t={t} decoder-walk MAE {mae_feat}"

        got_words = np.asarray(we.r_words)[: t + 1]
        np.testing.assert_allclose(got_words, ref_words[i][: t + 1],
                                   rtol=1e-3, atol=1e-4)

        got_pix = np.asarray(backward(
            jnp.asarray(got_feat)[None]))[0]  # (H, W, 3)
        want_pix = ref_pix[i][0].transpose(1, 2, 0)
        mae_pix = np.abs(got_pix - want_pix).mean()
        denom = np.abs(want_pix).mean() + 1e-12
        assert mae_pix <= 1e-4 or mae_pix / denom <= 1e-3, (
            f"t={t} pixel MAE {mae_pix} (rel {mae_pix / denom})")


@pytest.mark.slow
def test_gridtd_gradient_parity_with_reference(reference):
    """Manual-gradient walk vs ExplainGridTDGradient (gridTDmodel.py:1214)."""
    ref_gridtd = reference
    import models.vgg as ref_vgg

    torch.manual_seed(3)
    wm_dict = _word_map()
    vocab = len(wm_dict)
    orig_vgg16 = ref_vgg.vgg16
    ref_vgg.vgg16 = lambda pretrained=True, **kw: orig_vgg16(
        pretrained=False, **kw)
    try:
        model = ref_gridtd.GridTDModel(E, H, vocab, "vgg16")
    finally:
        ref_vgg.vgg16 = orig_vgg16
    model.eval()

    # build the gradient explainer without its ctor (it loads a checkpoint)
    explainer = ref_gridtd.ExplainGridTDGradient.__new__(
        ref_gridtd.ExplainGridTDGradient)
    explainer.args = types.SimpleNamespace(save_path="/tmp/refparity_g",
                                           dataset="toy", height=IMG,
                                           width=IMG)
    explainer.word_map = wm_dict
    explainer.vocab_size = vocab
    explainer.model = model
    explainer.adalstm_weight_i = model.AdaLSTM.lstm_cell.weight_ih
    explainer.adalstm_weight_h = model.AdaLSTM.lstm_cell.weight_hh
    explainer.adalstm_bias_i = model.AdaLSTM.lstm_cell.bias_ih
    explainer.adalstm_bias_h = model.AdaLSTM.lstm_cell.bias_hh
    explainer.language_weight_i = model.LanguageLSTM.weight_ih
    explainer.language_weight_h = model.LanguageLSTM.weight_hh
    explainer.language_bias_i = model.LanguageLSTM.bias_ih
    explainer.language_bias_h = model.LanguageLSTM.bias_hh
    explainer.output_weight = model.fc.weight

    rng = np.random.default_rng(3)
    img = rng.normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    explainer.preprocess_img = lambda path: torch.tensor(img)
    fixed_words = ["w2", "w6", "w4"]
    fixed_ids = [wm_dict[w] for w in fixed_words]
    model.beam_search = (
        lambda img, wm, beam_size=3, max_cap_length=20:
        ([" ".join(fixed_words)], list(fixed_ids))
    )
    with torch.no_grad():
        explainer.get_hidden_parameters("fake.jpg")
    explainer.image_feature_proj = explainer.image_feature_proj.transpose(1, 2)
    T = explainer.caption_length
    t = min(T - 1, 1)
    with torch.no_grad():
        d_feat, d_words = explainer.explain_caption_wordt(t)
    d_pix = explainer.explain_cnn(d_feat)

    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.explain.cnn_gradient import vgg_gradient
    from lrp_imagecaptioning_tpu.explain.gridtd_gradient import gradient_word
    from lrp_imagecaptioning_tpu.explain.gridtd_lrp import stash_forward
    from lrp_imagecaptioning_tpu.models import gridtd
    from lrp_imagecaptioning_tpu.models.encoders import encode_image_grid
    from lrp_imagecaptioning_tpu.models.torch_weights import (
        convert_encoder,
        convert_gridtd,
    )

    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=E,
                      hidden_dim=H, vocab_size=vocab, num_pixels=196)
    sd = model.state_dict()
    dec = convert_gridtd(sd, cfg)
    enc = convert_encoder(sd, cfg)
    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    raw, avg = encode_image_grid(enc, img_nhwc)
    feats = gridtd.encode_features(dec, raw, avg)
    tokens = jnp.asarray(explainer.beam_caption_encode[:T], jnp.int32)
    # the gradient explainer's manual forward uses the CORRECT biases
    # (gridTDmodel.py:1265) — no double-bias quirk here
    stash = stash_forward(dec, feats, tokens, language_double_bias_i=False)
    target = int(explainer.beam_caption_encode[t + 1])
    we = gradient_word(dec, feats, stash, jnp.asarray(t),
                       target=jnp.asarray(target))
    got_feat = np.asarray(we.r_img_feature).reshape(14, 14, 512)
    want_feat = d_feat.detach().numpy()[0].transpose(1, 2, 0)
    assert np.abs(got_feat - want_feat).mean() <= 1e-4
    np.testing.assert_allclose(np.asarray(we.r_words)[: t + 1],
                               d_words.detach().numpy()[: t + 1],
                               rtol=1e-3, atol=1e-4)
    got_pix = np.asarray(vgg_gradient(enc, img_nhwc,
                                      jnp.asarray(got_feat)[None]))[0]
    want_pix = d_pix.detach().numpy()[0].transpose(1, 2, 0)
    assert np.abs(got_pix - want_pix).mean() <= 1e-4


@pytest.mark.slow
def test_gridtd_lrp_weights_parity_with_reference(reference):
    """Training-time LRP weighting: forwardlrp_context
    (gridTDmodel.py:580-633) vs our forward_lrp_context."""
    ref_gridtd = reference
    import models.vgg as ref_vgg

    torch.manual_seed(4)
    wm_dict = _word_map()
    vocab = len(wm_dict)
    orig_vgg16 = ref_vgg.vgg16
    ref_vgg.vgg16 = lambda pretrained=True, **kw: orig_vgg16(
        pretrained=False, **kw)
    try:
        model = ref_gridtd.GridTDModel(E, H, vocab, "vgg16")
    finally:
        ref_vgg.vgg16 = orig_vgg16
    model.eval()
    rev = {v: k for k, v in wm_dict.items()}
    rng = np.random.default_rng(4)
    img = rng.normal(size=(2, 3, IMG, IMG)).astype(np.float32)
    caps = torch.tensor([[wm_dict["<start>"], wm_dict["w3"], wm_dict["w5"],
                          wm_dict["<end>"], 0, 0]] * 2)
    with torch.no_grad():
        preds, weighted, max_len = model.forwardlrp_context(
            torch.tensor(img), caps, [4, 4], rev)

    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.models import gridtd
    from lrp_imagecaptioning_tpu.models.encoders import encode_image_grid
    from lrp_imagecaptioning_tpu.models.lrp_tuning import (
        forward_lrp_context,
        stop_word_mask,
    )
    from lrp_imagecaptioning_tpu.models.torch_weights import (
        convert_encoder,
        convert_gridtd,
    )
    from lrp_imagecaptioning_tpu.data.vocab import WordMap

    cfg = ModelConfig(model_type="gridtd", encoder="vgg16", embed_dim=E,
                      hidden_dim=H, vocab_size=vocab, num_pixels=196)
    sd = model.state_dict()
    dec = convert_gridtd(sd, cfg)
    enc = convert_encoder(sd, cfg)
    raw, avg = encode_image_grid(enc, jnp.asarray(img.transpose(0, 2, 3, 1)))
    feats = gridtd.encode_features(dec, raw, avg)
    stop = stop_word_mask(WordMap(wm_dict), cfg.padded_vocab)
    logits, w_logits = forward_lrp_context(
        dec, feats, jnp.asarray(caps.numpy(), jnp.int32), stop, num_steps=3
    )
    np.testing.assert_allclose(np.asarray(logits), preds.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(w_logits), weighted.numpy(),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_aoa_lrp_parity_with_reference(reference):
    _ = reference  # ensures stubs + cuda patches installed
    import models.aoamodel as ref_aoa
    import models.vgg as ref_vgg

    torch.manual_seed(1)
    wm_dict = _word_map()
    vocab = len(wm_dict)
    NH = 2  # hidden 12 / 2 heads -> d_k 6

    orig_vgg16 = ref_vgg.vgg16
    ref_vgg.vgg16 = lambda pretrained=True, **kw: orig_vgg16(
        pretrained=False, **kw)
    try:
        model = ref_aoa.AOAModel(E, H, NH, vocab, "vgg16")
    finally:
        ref_vgg.vgg16 = orig_vgg16
    model.eval()

    args = types.SimpleNamespace(save_path="/tmp/refparity_aoa", dataset="toy",
                                 height=IMG, width=IMG, num_head=NH)
    explainer = ref_aoa.ExplainAOAAttention(args, wm_dict, model=model)
    rng = np.random.default_rng(1)
    img = rng.normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    explainer.preprocess_img = lambda path: torch.tensor(img)
    fixed_words = ["w4", "w2", "w9", "w6"]
    fixed_ids = [wm_dict[w] for w in fixed_words]
    model.beam_search = (
        lambda img, wm, beam_size=3, max_cap_length=20:
        ([" ".join(fixed_words)], list(fixed_ids))
    )
    with torch.no_grad():
        explainer.get_hidden_parameters("fake.jpg")
    T = explainer.caption_length
    head = 1
    ts = list(range(min(T, 2)))
    ref_feat, ref_words_l, ref_pix = [], [], []
    from LRPtools import lrp_wrapper

    lrp_wrapper.add_lrp(model.img_encoder.encoder)
    for t in ts:
        with torch.no_grad():
            r_feat, r_words = explainer.explain_caption_wordt(t, head)
        ref_feat.append(r_feat.detach().numpy())
        ref_words_l.append(r_words.detach().numpy())
        ref_pix.append(explainer.explain_cnn(r_feat).detach().numpy())

    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.explain.aoa_lrp import (
        explain_word as aoa_explain_word,
        stash_forward as aoa_stash,
    )
    from lrp_imagecaptioning_tpu.models import aoa
    from lrp_imagecaptioning_tpu.models.torch_weights import (
        convert_aoa,
        convert_encoder,
    )
    from lrp_imagecaptioning_tpu.models.encoders import encode_image_grid

    cfg = ModelConfig(model_type="aoa", encoder="vgg16", embed_dim=E,
                      hidden_dim=H, num_head=NH, vocab_size=vocab,
                      num_pixels=196)
    sd = model.state_dict()
    dec = convert_aoa(sd, cfg)
    enc = convert_encoder(sd, cfg)
    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    raw, _ = encode_image_grid(enc, img_nhwc)
    feats = aoa.encode_features(dec, raw)
    tokens = jnp.asarray(explainer.beam_caption_encode[:T], jnp.int32)
    stash = aoa_stash(dec, feats, tokens, num_head=NH,
                      language_double_bias_i=True)
    np.testing.assert_allclose(
        np.asarray(stash.predictions), explainer.predictions.numpy()[:T],
        rtol=1e-4, atol=1e-4,
    )
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward

    backward, _ = make_vgg_lrp_backward(enc, img_nhwc)
    for i, t in enumerate(ts):
        target = int(explainer.beam_caption_encode[t + 1])
        we = aoa_explain_word(dec, feats, stash, jnp.asarray(t),
                              target=jnp.asarray(target),
                              head_idx=jnp.asarray(head), num_head=NH)
        got = np.asarray(we.r_img_feature).reshape(14, 14, 512)
        want = ref_feat[i][0].transpose(1, 2, 0)
        mae = np.abs(got - want).mean()
        assert mae <= 1e-4, f"t={t} AoA decoder-walk MAE {mae}"
        np.testing.assert_allclose(np.asarray(we.r_words)[: t + 1],
                                   ref_words_l[i][: t + 1],
                                   rtol=1e-3, atol=1e-4)
        # pixel-level: through the hook-based reference CNN LRP
        got_pix = np.asarray(backward(jnp.asarray(got)[None]))[0]
        want_pix = ref_pix[i][0].transpose(1, 2, 0)
        mae_pix = np.abs(got_pix - want_pix).mean()
        denom = np.abs(want_pix).mean() + 1e-12
        assert mae_pix <= 1e-4 or mae_pix / denom <= 1e-3, (
            f"t={t} AoA pixel MAE {mae_pix} (rel {mae_pix / denom})")


@pytest.mark.slow
def test_aoa_gradient_parity_with_reference(reference):
    """AoA manual gradient walk (ExplainAOAGradient, aoamodel.py:1257) incl.
    the differentiated AoA gate and single-head gradient_mha."""
    _ = reference
    import models.aoamodel as ref_aoa
    import models.vgg as ref_vgg

    torch.manual_seed(6)
    wm_dict = _word_map()
    vocab = len(wm_dict)
    NH = 2
    orig_vgg16 = ref_vgg.vgg16
    ref_vgg.vgg16 = lambda pretrained=True, **kw: orig_vgg16(
        pretrained=False, **kw)
    try:
        model = ref_aoa.AOAModel(E, H, NH, vocab, "vgg16")
    finally:
        ref_vgg.vgg16 = orig_vgg16
    model.eval()

    explainer = ref_aoa.ExplainAOAGradient.__new__(ref_aoa.ExplainAOAGradient)
    explainer.args = types.SimpleNamespace(save_path="/tmp/refparity_ag",
                                           dataset="toy", height=IMG,
                                           width=IMG, num_head=NH)
    explainer.word_map = wm_dict
    explainer.rev_word_map = {v: k for k, v in wm_dict.items()}
    explainer.vocab_size = vocab
    explainer.num_head = NH
    explainer.model = model
    explainer.language_weight_i = model.LanguageLSTM.weight_ih
    explainer.language_weight_h = model.LanguageLSTM.weight_hh
    explainer.language_bias_i = model.LanguageLSTM.bias_ih
    explainer.language_bias_h = model.LanguageLSTM.bias_hh
    explainer.output_weight = model.fc.weight

    rng = np.random.default_rng(6)
    img = rng.normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    explainer.preprocess_img = lambda path: torch.tensor(img)
    fixed_words = ["w1", "w8", "w3"]
    fixed_ids = [wm_dict[w] for w in fixed_words]
    model.beam_search = (
        lambda img, wm, beam_size=3, max_cap_length=20:
        ([" ".join(fixed_words)], list(fixed_ids))
    )
    with torch.no_grad():
        explainer.get_hidden_parameters("fake.jpg")
    explainer.image_feature_proj = explainer.image_feature_proj.transpose(1, 2)
    T = explainer.caption_length
    t, head = min(T - 1, 1), 1
    with torch.no_grad():
        d_feat, d_words = explainer.explain_caption_wordt(t, head)

    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.explain.aoa_gradient import gradient_word
    from lrp_imagecaptioning_tpu.explain.aoa_lrp import stash_forward as aoa_stash
    from lrp_imagecaptioning_tpu.models import aoa
    from lrp_imagecaptioning_tpu.models.encoders import encode_image_grid
    from lrp_imagecaptioning_tpu.models.torch_weights import (
        convert_aoa,
        convert_encoder,
    )

    cfg = ModelConfig(model_type="aoa", encoder="vgg16", embed_dim=E,
                      hidden_dim=H, num_head=NH, vocab_size=vocab,
                      num_pixels=196)
    sd = model.state_dict()
    dec = convert_aoa(sd, cfg)
    enc = convert_encoder(sd, cfg)
    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    raw, _ = encode_image_grid(enc, img_nhwc)
    feats = aoa.encode_features(dec, raw)
    tokens = jnp.asarray(explainer.beam_caption_encode[:T], jnp.int32)
    # gradient explainer uses correct biases (aoamodel.py:1298)
    stash = aoa_stash(dec, feats, tokens, num_head=NH,
                      language_double_bias_i=False)
    target = int(explainer.beam_caption_encode[t + 1])
    we = gradient_word(dec, feats, stash, jnp.asarray(t),
                       target=jnp.asarray(target),
                       head_idx=jnp.asarray(head), num_head=NH)
    got = np.asarray(we.r_img_feature).reshape(14, 14, 512)
    want = d_feat.detach().numpy()[0].transpose(1, 2, 0)
    assert np.abs(got - want).mean() <= 1e-4
    np.testing.assert_allclose(np.asarray(we.r_words)[: t + 1],
                               d_words.detach().numpy()[: t + 1],
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_adaptive_gradient_parity_with_reference(reference):
    """Adaptive manual gradient walk (ExplainAdaptiveGradient,
    adaptiveattention.py:851)."""
    _ = reference
    import models.adaptiveattention as ref_ada
    import models.vgg as ref_vgg

    torch.manual_seed(7)
    wm_dict = _word_map()
    vocab = len(wm_dict)
    EA = HA = 12
    orig_vgg16 = ref_vgg.vgg16
    ref_vgg.vgg16 = lambda pretrained=True, **kw: orig_vgg16(
        pretrained=False, **kw)
    try:
        model = ref_ada.AdaptiveAttentionCaptioningModel(EA, HA, vocab, "vgg16")
    finally:
        ref_vgg.vgg16 = orig_vgg16
    model.eval()

    explainer = ref_ada.ExplainAdaptiveGradient.__new__(
        ref_ada.ExplainAdaptiveGradient)
    explainer.args = types.SimpleNamespace(save_path="/tmp/refparity_adg",
                                           dataset="toy", height=IMG,
                                           width=IMG)
    explainer.word_map = wm_dict
    explainer.vocab_size = vocab
    explainer.model = model
    explainer.adalstm_weight_i = model.AdaLSTM.lstm_cell.weight_ih
    explainer.adalstm_weight_h = model.AdaLSTM.lstm_cell.weight_hh
    explainer.adalstm_bias_i = model.AdaLSTM.lstm_cell.bias_ih
    explainer.adalstm_bias_h = model.AdaLSTM.lstm_cell.bias_hh
    explainer.output_weight = model.fc.weight

    rng = np.random.default_rng(7)
    img = rng.normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    explainer.preprocess_img = lambda path: torch.tensor(img)
    fixed_words = ["w6", "w2", "w9"]
    fixed_ids = [wm_dict[w] for w in fixed_words]
    model.beam_search = (
        lambda img, wm, beam_size=3, max_cap_length=20:
        ([" ".join(fixed_words)], list(fixed_ids))
    )
    with torch.no_grad():
        explainer.get_hidden_parameters("fake.jpg")
    explainer.image_feature_proj = explainer.image_feature_proj.transpose(1, 2)
    T = explainer.caption_length
    t = min(T - 1, 1)
    with torch.no_grad():
        d_feat, d_words = explainer.explain_caption_wordt(t)

    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.explain.adaptive_lrp import (
        gradient_word as ada_gradient_word,
        stash_forward as ada_stash,
    )
    from lrp_imagecaptioning_tpu.models import gridtd
    from lrp_imagecaptioning_tpu.models.encoders import encode_image_grid
    from lrp_imagecaptioning_tpu.models.torch_weights import (
        convert_adaptive,
        convert_encoder,
    )

    cfg = ModelConfig(model_type="adaptive", encoder="vgg16", embed_dim=EA,
                      hidden_dim=HA, vocab_size=vocab, num_pixels=196)
    sd = model.state_dict()
    dec = convert_adaptive(sd, cfg)
    enc = convert_encoder(sd, cfg)
    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    raw, avg = encode_image_grid(enc, img_nhwc)
    feats = gridtd.encode_features(dec, raw, avg)
    tokens = jnp.asarray(explainer.beam_caption_encode[:T], jnp.int32)
    stash = ada_stash(dec, feats, tokens)
    target = int(explainer.beam_caption_encode[t + 1])
    we = ada_gradient_word(dec, feats, stash, jnp.asarray(t),
                           target=jnp.asarray(target))
    got = np.asarray(we.r_img_feature).reshape(14, 14, 512)
    want = d_feat.detach().numpy()[0].transpose(1, 2, 0)
    assert np.abs(got - want).mean() <= 1e-4
    np.testing.assert_allclose(np.asarray(we.r_words)[: t + 1],
                               d_words.detach().numpy()[: t + 1],
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_resnet_cnn_lrp_parity_with_reference(reference):
    """Hook-based reference LRP through ResNet-50 (alpha-beta convs, BN-abs,
    Add split, maxpool, identity relus) vs our explicit interpreter."""
    _ = reference
    import models.resnet as ref_resnet
    from LRPtools import lrp_wrapper

    torch.manual_seed(5)
    model = ref_resnet.resnet50(pretrained=False)
    model.eval()
    rng = np.random.default_rng(5)
    # small spatial size keeps CPU time sane; resnet50 on 64px -> 2x2x2048
    img = rng.normal(size=(1, 3, 64, 64)).astype(np.float32)
    seed_r = rng.normal(size=(1, 2048, 2, 2)).astype(np.float32)

    lrp_wrapper.add_lrp(model)
    want = model.compute_lrp(torch.tensor(img),
                             target=torch.tensor(seed_r)).detach().numpy()

    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.explain.resnet_lrp import (
        make_resnet_lrp_backward,
    )
    from lrp_imagecaptioning_tpu.models.resnet import load_torch_resnet_state

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = load_torch_resnet_state(sd, "resnet50")
    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    backward, feats = make_resnet_lrp_backward(params, img_nhwc)

    # forward parity first
    with torch.no_grad():
        want_feats = model(torch.tensor(img)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(feats), want_feats, rtol=1e-3,
                               atol=1e-3)

    got = np.asarray(backward(jnp.asarray(seed_r.transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    mae = np.abs(got - want).mean()
    denom = np.abs(want).mean() + 1e-12
    # NOTE: modern torch's non-full `register_backward_hook` fires at an inner
    # autograd node for multi-node modules (BatchNorm) — torch itself warns
    # "this hook will be missing some grad_input" during this test.  Under the
    # reference's pinned torch 1.4 the hook replaced the whole module's
    # gradient, which is exactly what our interpreter implements; the VGG
    # parity test (no BN) matches to <1e-4.  Bound the BN-hook drift at 1%.
    assert mae / denom <= 1e-2, (mae, mae / denom)


@pytest.mark.slow
def test_resnet_cnn_lrp_parity_torch14_oracle(reference):
    """Tight (MAE <= 1e-4) ResNet LRP parity against a torch-1.4-faithful
    oracle.

    Modern torch's non-full ``register_backward_hook`` fires at an inner
    autograd node for BatchNorm, so running the reference's hook machinery
    directly drifts ~1% (see test_resnet_cnn_lrp_parity_with_reference).
    Under the reference's pinned torch 1.4 the hook replaced the WHOLE
    module's gradient — semantics reproduced here by invoking the reference's
    own rule classes (LRPtools/lrp_modules.py) module-by-module in reverse
    execution order, with residual relevances summing at the split exactly as
    autograd accumulated them (lrp_wrapper.py:42-56).

    Runs in float64 on BOTH sides: the walk divides by near-zero stabilized
    denominators (Add outputs down to ~5e-3 vs EPSILON=0.01), so fp32
    torch-vs-XLA conv drift is amplified ~1e3x and would swamp a tight
    assert; f64 isolates the semantics, which is what this test pins."""
    _ = reference
    import models.resnet as ref_resnet
    from LRPtools import lrp_modules, lrp_wrapper

    torch.manual_seed(5)
    model = ref_resnet.resnet50(pretrained=False)
    model.double()
    model.eval()
    rng = np.random.default_rng(5)
    img = rng.normal(size=(1, 3, 64, 64))
    seed_r = rng.normal(size=(1, 2048, 2, 2))

    # forward with the reference's own save_input_hook to stash module.input
    lrp_wrapper.add_lrp(model)
    with torch.no_grad():
        _ = model(torch.tensor(img))

    params_ab = {"alpha": 1.0, "beta": 0.0, "ignore_bias": True}

    def rule(module, R, method):
        lrp_mod = lrp_modules.get_lrp_module(module)
        inp = module.input[0]
        if isinstance(module, torch.nn.Conv2d):
            stub = (torch.zeros_like(inp), torch.zeros_like(module.weight),
                    None if module.bias is None
                    else torch.zeros_like(module.bias))
        elif isinstance(module, torch.nn.BatchNorm2d):
            stub = (torch.zeros_like(inp), torch.zeros_like(module.weight),
                    torch.zeros_like(module.bias))
        else:
            stub = (torch.zeros_like(inp),)
        out = lrp_mod.propagate_relevance(module, stub, (R,), method,
                                          lrp_params=params_ab)
        return out[0]

    def walk_block(block, R):
        # trailing relu: identity rule. Add splits relevance across paths.
        add_mod = lrp_modules.get_lrp_module(block.add)
        R1, R2 = add_mod.propagate_relevance(
            block.add, None, (R,), "alpha_beta", lrp_params=params_ab)
        R1 = rule(block.bn3, R1, "epsilon")
        R1 = rule(block.conv3, R1, "alpha_beta")
        R1 = rule(block.bn2, R1, "epsilon")
        R1 = rule(block.conv2, R1, "alpha_beta")
        R1 = rule(block.bn1, R1, "epsilon")
        R1 = rule(block.conv1, R1, "alpha_beta")
        if block.downsample is not None:
            R2 = rule(block.downsample[1], R2, "epsilon")
            R2 = rule(block.downsample[0], R2, "alpha_beta")
        # autograd accumulates the two relevances at the split tensor
        return R1 + R2

    with torch.no_grad():
        R = torch.tensor(seed_r)
        for layer in [model.layer4, model.layer3, model.layer2, model.layer1]:
            for block in reversed(list(layer)):
                R = walk_block(block, R)
        R = rule(model.maxpool, R, "alpha_beta")
        R = rule(model.bn1, R, "epsilon")
        want = rule(model.conv1, R, "alpha_beta").numpy()

    import jax

    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.explain.resnet_lrp import (
        make_resnet_lrp_backward,
    )
    from lrp_imagecaptioning_tpu.models.resnet import load_torch_resnet_state

    sd = {k: v.detach().numpy().copy() for k, v in model.state_dict().items()}
    jax.config.update("jax_enable_x64", True)
    try:
        params = load_torch_resnet_state(sd, "resnet50", dtype=np.float64)
        backward, _ = make_resnet_lrp_backward(
            params, jnp.asarray(img.transpose(0, 2, 3, 1), jnp.float64))
        got = np.asarray(backward(
            jnp.asarray(seed_r.transpose(0, 2, 3, 1), jnp.float64)))
    finally:
        jax.config.update("jax_enable_x64", False)
    got = got.transpose(0, 3, 1, 2)
    mae = np.abs(got - want).mean()
    assert mae <= 1e-4, (mae, np.abs(want).mean())


@pytest.mark.slow
def test_adaptive_lrp_parity_with_reference(reference):
    _ = reference
    import models.adaptiveattention as ref_ada
    import models.vgg as ref_vgg

    torch.manual_seed(2)
    wm_dict = _word_map()
    vocab = len(wm_dict)
    # the reference's adaptive stash buffer is sized E+H for an input of
    # width 2E (adaptiveattention.py:640 vs :598) — a latent bug invisible at
    # its E=H=512 config; use E == H here so the reference runs.
    EA = HA = 12
    orig_vgg16 = ref_vgg.vgg16
    ref_vgg.vgg16 = lambda pretrained=True, **kw: orig_vgg16(
        pretrained=False, **kw)
    try:
        model = ref_ada.AdaptiveAttentionCaptioningModel(EA, HA, vocab, "vgg16")
    finally:
        ref_vgg.vgg16 = orig_vgg16
    model.eval()
    args = types.SimpleNamespace(save_path="/tmp/refparity_ada", dataset="toy",
                                 height=IMG, width=IMG)
    explainer = ref_ada.ExplainAdaptiveAttention(args, wm_dict, model=model)
    rng = np.random.default_rng(2)
    img = rng.normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    explainer.preprocess_img = lambda path: torch.tensor(img)
    fixed_words = ["w8", "w1", "w5"]
    fixed_ids = [wm_dict[w] for w in fixed_words]
    model.beam_search = (
        lambda img, wm, beam_size=3, max_cap_length=20:
        ([" ".join(fixed_words)], list(fixed_ids))
    )
    with torch.no_grad():
        explainer.get_hidden_parameters("fake.jpg")
    T = explainer.caption_length
    ts = list(range(min(T, 2)))
    ref_feat, ref_words_l, ref_pix = [], [], []
    from LRPtools import lrp_wrapper

    lrp_wrapper.add_lrp(model.img_encoder.encoder)
    for t in ts:
        with torch.no_grad():
            r_feat, r_words = explainer.explain_caption_wordt(t)
        ref_feat.append(r_feat.detach().numpy())
        ref_words_l.append(r_words.detach().numpy())
        ref_pix.append(explainer.explain_cnn(r_feat).detach().numpy())

    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.explain.adaptive_lrp import (
        explain_word as ada_explain_word,
        stash_forward as ada_stash,
    )
    from lrp_imagecaptioning_tpu.models import gridtd
    from lrp_imagecaptioning_tpu.models.encoders import encode_image_grid
    from lrp_imagecaptioning_tpu.models.torch_weights import (
        convert_adaptive,
        convert_encoder,
    )

    cfg = ModelConfig(model_type="adaptive", encoder="vgg16", embed_dim=EA,
                      hidden_dim=HA, vocab_size=vocab, num_pixels=196)
    sd = model.state_dict()
    dec = convert_adaptive(sd, cfg)
    enc = convert_encoder(sd, cfg)
    img_nhwc = jnp.asarray(img.transpose(0, 2, 3, 1))
    raw, avg = encode_image_grid(enc, img_nhwc)
    feats = gridtd.encode_features(dec, raw, avg)
    tokens = jnp.asarray(explainer.beam_caption_encode[:T], jnp.int32)
    stash = ada_stash(dec, feats, tokens)
    np.testing.assert_allclose(
        np.asarray(stash.predictions), explainer.predictions.numpy()[:T],
        rtol=1e-4, atol=1e-4,
    )
    from lrp_imagecaptioning_tpu.explain.cnn_lrp import make_vgg_lrp_backward

    backward, _ = make_vgg_lrp_backward(enc, img_nhwc)
    for i, t in enumerate(ts):
        target = int(explainer.beam_caption_encode[t + 1])
        we = ada_explain_word(dec, feats, stash, jnp.asarray(t),
                              target=jnp.asarray(target))
        got = np.asarray(we.r_img_feature).reshape(14, 14, 512)
        want = ref_feat[i][0].transpose(1, 2, 0)
        mae = np.abs(got - want).mean()
        assert mae <= 1e-4, f"t={t} adaptive decoder-walk MAE {mae}"
        np.testing.assert_allclose(np.asarray(we.r_words)[: t + 1],
                                   ref_words_l[i][: t + 1],
                                   rtol=1e-3, atol=1e-4)
        # pixel-level: through the hook-based reference CNN LRP
        got_pix = np.asarray(backward(jnp.asarray(got)[None]))[0]
        want_pix = ref_pix[i][0].transpose(1, 2, 0)
        mae_pix = np.abs(got_pix - want_pix).mean()
        denom = np.abs(want_pix).mean() + 1e-12
        assert mae_pix <= 1e-4 or mae_pix / denom <= 1e-3, (
            f"t={t} adaptive pixel MAE {mae_pix} (rel {mae_pix / denom})")

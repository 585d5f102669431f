"""Direct decode/forward parity vs the LIVING reference implementation.

Complements test_reference_parity (which covers the LRP/gradient walks): here
the reference's own ``forward`` (teacher-forced logits, gridTDmodel.py:146-199),
``greedy_search`` (gridTDmodel.py:480-520), ``beam_search``
(gridTDmodel.py:400-478) and ``diverse_beam_search`` (gridTDmodel.py:304-398)
run on CPU with shared random weights, and our jitted fixed-shape versions must
produce identical tokens (and logits MAE <= 1e-4) through the converted params
— for all three model families, over multiple seeds.

The reference's gridTD/adaptive ``beam_search`` (and the AoA
``diverse_beam_search`` group loop) floor-divide with ``/`` — torch-1.4
integer-division semantics that crash on modern torch (gridTDmodel.py:444,
adaptiveattention.py:414, aoamodel.py:360).  Those methods are run here with
``/`` textually rewritten to ``//`` (the intended semantics, which our beam
implements — SURVEY.md §7.5).
"""

import inspect
import sys
import textwrap
import types

import numpy as np
import pytest
import torch

from test_reference_parity import _install_stubs

E, H = 10, 12
NH = 2  # AoA heads: hidden 12 / 2 -> d_k 6
VOCAB_WORDS = 20
IMG = 224  # reference AdaptiveAttention hardcodes 196 pixels


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

    return types.SimpleNamespace(gridtd=ref_gridtd, aoa=ref_aoa, ada=ref_ada)


def _word_map():
    wm = {f"w{i}": i + 1 for i in range(VOCAB_WORDS)}
    wm["<unk>"] = len(wm) + 1
    wm["<start>"] = len(wm) + 1
    wm["<end>"] = len(wm) + 1
    wm["<pad>"] = 0
    return wm


def _build_ref_model(reference, family, seed):
    import models.vgg as ref_vgg

    torch.manual_seed(seed)
    wm = _word_map()
    vocab = len(wm)
    orig_vgg16 = ref_vgg.vgg16
    ref_vgg.vgg16 = lambda pretrained=True, **kw: orig_vgg16(
        pretrained=False, **kw)
    try:
        if family == "gridtd":
            model = reference.gridtd.GridTDModel(E, H, vocab, "vgg16")
        elif family == "aoa":
            model = reference.aoa.AOAModel(E, H, NH, vocab, "vgg16")
        else:
            model = reference.ada.AdaptiveAttentionCaptioningModel(
                E, H, vocab, "vgg16")
    finally:
        ref_vgg.vgg16 = orig_vgg16
    model.eval()
    return model, wm


def _convert(family, model):
    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.models.captioner import (
        Captioner,
        CaptionerParams,
    )
    from lrp_imagecaptioning_tpu.models.torch_weights import (
        convert_adaptive,
        convert_aoa,
        convert_encoder,
        convert_gridtd,
    )

    vocab = model.vocab_size
    cfg = ModelConfig(model_type=family, encoder="vgg16", embed_dim=E,
                      hidden_dim=H, num_head=NH, vocab_size=vocab,
                      num_pixels=196)
    sd = model.state_dict()
    conv = {"gridtd": convert_gridtd, "aoa": convert_aoa,
            "adaptive": convert_adaptive}[family]
    cap = Captioner(cfg)
    params = CaptionerParams(convert_encoder(sd, cfg), conv(sd, cfg))
    return cap, params


def _rewrite_floor_div(model, method_module, method_name):
    """Bind a copy of ``method_name`` with ``/ vocab_size`` -> ``// vocab_size``
    (torch-1.4 integer-div semantics the original code relied on)."""
    src = textwrap.dedent(
        inspect.getsource(getattr(type(model), method_name)))
    fixed = src.replace("top_words / vocab_size", "top_words // vocab_size")
    assert fixed != src, f"nothing rewritten in {method_name}"
    ns = dict(vars(method_module))
    exec(fixed, ns)
    setattr(model, method_name, ns[method_name].__get__(model))


SPECIALS = ("<start>", "<end>", "<unk>", "<pad>")


def _strip(ids, wm):
    special = {wm[s] for s in SPECIALS}
    return [int(i) for i in ids if int(i) not in special]


@pytest.mark.slow
@pytest.mark.parametrize("family", ["gridtd", "aoa", "adaptive"])
def test_forward_and_greedy_parity(reference, family):
    """Teacher-forced logits MAE <= 1e-4 and token-exact greedy captions vs the
    actual reference model, 5 seeds."""
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.data.vocab import (
        BAD_ENDINGS,
        BAD_ENDINGS_AOA,
        WordMap,
        decode_to_words,
        remove_bad_endings,
    )

    bad = BAD_ENDINGS_AOA if family == "aoa" else BAD_ENDINGS
    for seed in range(5):
        model, wm = _build_ref_model(reference, family, seed)
        cap, params = _convert(family, model)
        wmap = WordMap(wm)
        rng = np.random.default_rng(seed)
        img = rng.normal(size=(2, 3, IMG, IMG)).astype(np.float32)

        # --- teacher-forced forward ----------------------------------
        word_ids = rng.integers(1, VOCAB_WORDS + 1, size=(2, 4))
        caps_np = np.zeros((2, 7), np.int64)
        caps_np[:, 0] = wm["<start>"]
        caps_np[:, 1:5] = word_ids
        caps_np[:, 5] = wm["<end>"]
        caplens = [6, 6]
        with torch.no_grad():
            ref_out = model(torch.tensor(img), torch.tensor(caps_np),
                            caplens, None)
        ref_logits = ref_out[0].numpy()

        feats = cap.encode(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
        logits, alphas, betas = cap.forward(
            params, feats, jnp.asarray(caps_np, jnp.int32),
            num_steps=max(caplens) - 1, train=False)
        mae = np.abs(np.asarray(logits) - ref_logits).mean()
        assert mae <= 1e-4, f"{family} seed={seed} forward logits MAE {mae}"
        if family != "aoa":  # AoA forward returns alphas=None (aoamodel.py:212)
            np.testing.assert_allclose(np.asarray(alphas),
                                       ref_out[1].numpy(), atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(betas).reshape(ref_out[2].shape),
                ref_out[2].numpy(), atol=1e-5)

        # --- greedy decode -------------------------------------------
        with torch.no_grad():
            ref_sents, ref_seqs = model.greedy_search(
                torch.tensor(img), wm, max_cap_length=20)
        res = cap.greedy(params, feats, wmap, max_cap_length=20)
        got_tokens = np.asarray(res.tokens)
        for b in range(2):
            got = [int(t) for t in got_tokens[b]]
            if family == "aoa":
                # AoA's greedy returns only the LAST item's stripped ids
                # (aoamodel.py:530 returns `sen_idx` from the final loop turn)
                if b == 1:
                    assert _strip(got, wm) == [int(i) for i in ref_seqs]
            else:
                want = list(ref_seqs[b][1:])  # drop the <start> the ref keeps
                assert got == want, (
                    f"{family} seed={seed} b={b}: tokens {got} != {want}")
            words = decode_to_words(got, wmap)
            sent = " ".join(words)
            # adaptive's greedy skips remove_bad_endings
            # (adaptiveattention.py:489); gridTD/AoA apply their own lists
            if family != "adaptive":
                sent = remove_bad_endings([sent], bad)[0]
            assert sent == ref_sents[b], (
                f"{family} seed={seed} b={b}: {sent!r} != {ref_sents[b]!r}")


@pytest.mark.slow
@pytest.mark.parametrize("family", ["gridtd", "aoa", "adaptive"])
def test_beam_search_parity(reference, family):
    """Token-exact beam-search captions vs the reference (gridTD/adaptive run
    with `/`->`//` rewritten; AoA already uses `//`, aoamodel.py:451)."""
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.data.vocab import WordMap

    mod = {"gridtd": reference.gridtd, "aoa": reference.aoa,
           "adaptive": reference.ada}[family]
    for seed in range(3):
        model, wm = _build_ref_model(reference, family, seed + 10)
        cap, params = _convert(family, model)
        wmap = WordMap(wm)
        rng = np.random.default_rng(seed + 10)
        img = rng.normal(size=(1, 3, IMG, IMG)).astype(np.float32)
        if family != "aoa":
            _rewrite_floor_div(model, mod, "beam_search")
        with torch.no_grad():
            _, ref_idx = model.beam_search(torch.tensor(img), wm,
                                           beam_size=3, max_cap_length=20)

        feats = cap.encode(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
        res = cap.beam_search_single(params, feats, wmap,
                                     beam_size=3, max_cap_length=20)
        got_idx = _strip(np.asarray(res.tokens)[: int(res.length)], wm)
        assert got_idx == [int(i) for i in ref_idx], (
            f"{family} seed={seed}: beam tokens {got_idx} != {list(ref_idx)}")


def _build_ref_bu(reference, family, seed):
    torch.manual_seed(seed)
    wm = _word_map()
    vocab = len(wm)
    if family == "gridtd_bu":
        model = reference.gridtd.GridTDModelBU(E, H, vocab, "bu")
    else:
        model = reference.aoa.AOAModelBU(E, H, NH, vocab, "bu")
    model.eval()
    return model, wm


def _convert_bu(family, model):
    from lrp_imagecaptioning_tpu.config import ModelConfig
    from lrp_imagecaptioning_tpu.models.captioner import (
        Captioner,
        CaptionerParams,
    )
    from lrp_imagecaptioning_tpu.models.torch_weights import (
        convert_aoa,
        convert_gridtd,
    )

    cfg = ModelConfig(model_type=family, encoder="bu", embed_dim=E,
                      hidden_dim=H, num_head=NH, vocab_size=model.vocab_size,
                      num_pixels=36)
    sd = model.state_dict()
    conv = convert_gridtd if family.startswith("gridtd") else convert_aoa
    return Captioner(cfg), CaptionerParams(None, conv(sd, cfg))


@pytest.mark.slow
@pytest.mark.parametrize("family", ["gridtd_bu", "aoa_bu"])
def test_bu_forward_greedy_beam_parity(reference, family):
    """Bottom-up variants (GridTDModelBU gridTDmodel.py:1863, AOAModelBU
    aoamodel.py:1779): teacher-forced logits MAE <= 1e-4, token-exact greedy
    and beam captions on 36x2048 region features, 3 seeds."""
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.data.vocab import WordMap

    mod = reference.gridtd if family.startswith("gridtd") else reference.aoa
    for seed in range(3):
        model, wm = _build_ref_bu(reference, family, seed + 30)
        cap, params = _convert_bu(family, model)
        wmap = WordMap(wm)
        rng = np.random.default_rng(seed + 30)
        feats_np = rng.normal(size=(2, 36, 2048)).astype(np.float32)

        word_ids = rng.integers(1, VOCAB_WORDS + 1, size=(2, 4))
        caps_np = np.zeros((2, 7), np.int64)
        caps_np[:, 0] = wm["<start>"]
        caps_np[:, 1:5] = word_ids
        caps_np[:, 5] = wm["<end>"]
        caplens = [6, 6]
        with torch.no_grad():
            ref_out = model(torch.tensor(feats_np), torch.tensor(caps_np),
                            caplens, None)
        feats = cap.encode(params, jnp.asarray(feats_np))
        logits, _, _ = cap.forward(params, feats,
                                   jnp.asarray(caps_np, jnp.int32),
                                   num_steps=5, train=False)
        mae = np.abs(np.asarray(logits) - ref_out[0].numpy()).mean()
        assert mae <= 1e-4, f"{family} seed={seed} forward MAE {mae}"

        with torch.no_grad():
            _, ref_seqs = model.greedy_search(torch.tensor(feats_np), wm,
                                              max_cap_length=20)
        res = cap.greedy(params, feats, wmap, max_cap_length=20)
        got_tokens = np.asarray(res.tokens)
        for b in range(2):
            got = [int(t) for t in got_tokens[b]]
            if family == "aoa_bu":  # same last-item-only return quirk
                if b == 1:
                    assert _strip(got, wm) == [int(i) for i in ref_seqs]
            else:
                assert got == list(ref_seqs[b][1:]), f"{family} seed={seed}"

        # beam (gridTD-BU uses `/` -> rewrite; AoA-BU uses `//` natively,
        # aoamodel.py:2101)
        if family == "gridtd_bu":
            _rewrite_floor_div(model, mod, "beam_search")
        f1 = feats_np[:1]
        with torch.no_grad():
            _, ref_idx = model.beam_search(torch.tensor(f1), wm,
                                           beam_size=3, max_cap_length=20)
        feats1 = cap.encode(params, jnp.asarray(f1))
        bres = cap.beam_search_single(params, feats1, wmap, beam_size=3,
                                      max_cap_length=20)
        got_idx = _strip(np.asarray(bres.tokens)[: int(bres.length)], wm)
        assert got_idx == [int(i) for i in ref_idx], f"{family} seed={seed}"


@pytest.mark.slow
@pytest.mark.parametrize("family", ["gridtd", "aoa", "adaptive"])
def test_diverse_beam_search_parity(reference, family):
    """Per-group DBS sentences vs the reference (AoA's group loop needs the
    `/`->`//` rewrite, aoamodel.py:360; gridTD/adaptive use `//` natively)."""
    import jax.numpy as jnp

    from lrp_imagecaptioning_tpu.data.vocab import (
        BAD_ENDINGS,
        BAD_ENDINGS_AOA,
        WordMap,
        decode_to_words,
        remove_bad_endings,
    )

    mod = {"gridtd": reference.gridtd, "aoa": reference.aoa,
           "adaptive": reference.ada}[family]
    bad = BAD_ENDINGS_AOA if family == "aoa" else BAD_ENDINGS
    dprob = 0.8 if family == "adaptive" else 0.5
    model, wm = _build_ref_model(reference, family, 21)
    cap, params = _convert(family, model)
    wmap = WordMap(wm)
    rng = np.random.default_rng(21)
    img = rng.normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    if family == "aoa":
        _rewrite_floor_div(model, mod, "diverse_beam_search")
    with torch.no_grad():
        ref_sents = model.diverse_beam_search(
            torch.tensor(img), 3, wm, max_cap_length=20, diversity_prob=dprob)

    feats = cap.encode(params, jnp.asarray(img.transpose(0, 2, 3, 1)))
    results = cap.diverse_beam_search_single(
        params, feats, wmap, beam_size=3, max_cap_length=20,
        diversity_prob=dprob)
    assert len(results) == len(ref_sents) == 3
    for g, (res, want) in enumerate(zip(results, ref_sents)):
        ids = _strip(np.asarray(res.tokens)[: int(res.length)], wm)
        sent = remove_bad_endings(
            [" ".join(decode_to_words(ids, wmap))], bad)[0]
        assert sent == want, f"{family} group {g}: {sent!r} != {want!r}"

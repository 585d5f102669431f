"""Metric parity: our pure-Python BLEU/CIDEr/ROUGE vs the vendored
pycocoevalcap scorers from the reference (SURVEY.md §4e).  The vendored
scorers are pure Python (no Java) for these three metrics, so they run
directly as the golden oracle."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from lrp_imagecaptioning_tpu.metrics.bleu import corpus_bleu
from lrp_imagecaptioning_tpu.metrics.cider import cider_score
from lrp_imagecaptioning_tpu.metrics.meteor import meteor_score
from lrp_imagecaptioning_tpu.metrics.rouge import rouge_l
from lrp_imagecaptioning_tpu.metrics.tokenizer import ptb_tokenize_sentence


def _random_corpus(seed, n_imgs=12, vocab=18, n_refs=3):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]

    def sent():
        n = int(rng.integers(3, 12))
        return " ".join(words[int(i)] for i in rng.integers(0, vocab, n))

    hyps = [sent() for _ in range(n_imgs)]
    refs = [[sent() for _ in range(n_refs)] for _ in range(n_imgs)]
    return hyps, refs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bleu_matches_vendored(seed):
    from pycocoevalcap.bleu.bleu_scorer import BleuScorer

    hyps, refs = _random_corpus(seed)
    scorer = BleuScorer(n=4)
    for h, r in zip(hyps, refs):
        scorer += (h, r)
    want, want_per = scorer.compute_score(option="closest")
    got, got_per = corpus_bleu(hyps, refs, option="closest")
    np.testing.assert_allclose(got, want, rtol=1e-10)
    for k in range(4):
        np.testing.assert_allclose(got_per[k], want_per[k], rtol=1e-10)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cider_matches_vendored(seed):
    from pycocoevalcap.cider.cider import Cider

    hyps, refs = _random_corpus(seed)
    gts = {i: r for i, r in enumerate(refs)}
    res = {i: [h] for i, h in enumerate(hyps)}
    want_avg, want = Cider().compute_score(gts, res)
    got_avg, got = cider_score(hyps, refs)
    np.testing.assert_allclose(got_avg, want_avg, rtol=1e-10)
    np.testing.assert_allclose(got, want, rtol=1e-10)


@pytest.mark.parametrize("seed", [0, 1])
def test_rouge_matches_vendored(seed):
    from pycocoevalcap.rouge.rouge import Rouge

    hyps, refs = _random_corpus(seed)
    gts = {i: r for i, r in enumerate(refs)}
    res = {i: [h] for i, h in enumerate(hyps)}
    want_avg, want = Rouge().compute_score(gts, res)
    got_avg, got = rouge_l(hyps, refs)
    np.testing.assert_allclose(got_avg, want_avg, rtol=1e-10)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_identical_sentences_score_perfectly():
    hyps = ["a dog runs fast", "the cat sits"]
    refs = [[h] for h in hyps]
    bleus, _ = corpus_bleu(hyps, refs)
    assert all(abs(b - 1.0) < 1e-6 for b in bleus)
    r, _ = rouge_l(hyps, refs)
    assert abs(r - 1.0) < 1e-9
    m, _ = meteor_score(hyps, refs)
    assert abs(m - (1.0 - 0.5 / 1**3 * 0)) < 0.51  # penalty <= 0.5, fmean 1


def test_ptb_tokenizer_basics():
    assert ptb_tokenize_sentence("A Dog, runs!") == "a dog runs"
    assert ptb_tokenize_sentence("don't stop") == "do n't stop"
    # brackets survive: the Java tokenizer lowercases tokens to -lrb- but the
    # reference's removal list checks -LRB- (ptbtokenizer.py:21) — quirk kept
    assert ptb_tokenize_sentence("it's a (test)") == "it 's a -lrb- test -rrb-"
    assert ptb_tokenize_sentence("hello...") == "hello"


def test_porter_stemmer_classic_pairs():
    """Porter (1980) published example pairs + common forms."""
    from lrp_imagecaptioning_tpu.metrics.porter import porter_stem

    pairs = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "conformabli": "conform", "radicalli": "radic",
        "differentli": "differ", "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust",
        "dependent": "depend", "adoption": "adopt", "homologou": "homolog",
        "communism": "commun", "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect", "bowdlerize":
        "bowdler", "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }
    errs = {w: porter_stem(w) for w, s in pairs.items()
            if porter_stem(w) != s}
    assert not errs, errs


def test_meteor_stem_stage_matches_inflections():
    """Stem matching credits inflectional variants the exact stage misses."""
    from lrp_imagecaptioning_tpu.metrics.meteor import meteor_score

    exact, _ = meteor_score(["a dog runs"], [["a dog runs"]])
    inflected, _ = meteor_score(["the dogs running"],
                                [["the dog runs"]])
    none, _ = meteor_score(["purple elephant"], [["the dog runs"]])
    assert exact == pytest.approx(1.0 - 0.5 * (1 / 3) ** 3)  # 1 chunk / 3 matches
    assert 0 < inflected  # dogs~dog, running~runs match via stems
    assert inflected > none == 0.0

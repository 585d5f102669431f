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
    assert ptb_tokenize_sentence("it's a (test)") == "it 's a test"
    assert ptb_tokenize_sentence("hello...") == "hello"

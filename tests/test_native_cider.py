"""Native C++ n-gram scorers (CIDEr + BLEU): exact parity with the
(pycocoevalcap-verified) Python scorers, SCST reward path still correct."""

import numpy as np
import pytest

from lrp_imagecaptioning_tpu.metrics.native import (
    _bleu_python_fallback,
    _python_fallback,
    _rouge_python_fallback,
    bleu_native_available,
    bleu_score_ids,
    cider_score_ids,
    native_available,
    rouge_native_available,
    rouge_score_ids,
)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_python(seed):
    rng = np.random.default_rng(seed)
    B = 10
    hyps = [rng.integers(1, 300, rng.integers(1, 15)).astype(np.int32)
            for _ in range(B)]
    refs = [[rng.integers(1, 300, rng.integers(3, 15)).astype(np.int32)
             for _ in range(4)] for _ in range(B)]
    got = cider_score_ids(hyps, refs)
    want = _python_fallback(hyps, refs, 6.0)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_handles_empty_hypothesis():
    # distinct reference documents so idf is nonzero (an ngram shared by every
    # image has idf = log(N) - log(df) = 0 and contributes nothing)
    hyps = [np.zeros(0, np.int32), np.asarray([1, 2, 3], np.int32)]
    refs = [[np.asarray([7, 8, 9], np.int32)],
            [np.asarray([1, 2, 3], np.int32)]]
    got = cider_score_ids(hyps, refs)
    want = _python_fallback(hyps, refs, 6.0)
    np.testing.assert_allclose(got, want, atol=1e-12)
    assert np.isfinite(got).all()
    assert got[1] > got[0]


def test_scst_reward_uses_ids():
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.engine.scst import get_self_critical_reward

    wm = build_word_map([["a", "dog", "runs", "cat", "sits"]], min_word_freq=1)
    # batch of 2 with distinct references so idf does not degenerate
    gen = np.asarray([[wm["a"], wm["dog"], 0, 0],
                      [wm["cat"], wm["runs"], 0, 0]])
    greedy = np.asarray([[wm["a"], wm["runs"], 0, 0],
                         [wm["cat"], wm["runs"], 0, 0]])
    caps = np.asarray([
        [[wm.start, wm["a"], wm["dog"], wm.end, 0]],
        [[wm.start, wm["cat"], wm["sits"], wm.end, 0]],
    ])
    rew = get_self_critical_reward(greedy, caps, gen, wm)
    assert rew.shape == (2, 4)
    assert rew[0, 0] > 0  # sampled matches image-0 refs better than greedy
    # per-image reward broadcast over timesteps
    assert np.all(rew[0] == rew[0, 0])


# ------------------------------------------------------------ native BLEU ----

@pytest.mark.skipif(not bleu_native_available(), reason="no C++ toolchain")
@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("option", ["closest", "shortest", "average"])
def test_native_bleu_matches_python(seed, option):
    rng = np.random.default_rng(seed)
    B = 12
    # small vocab so n-gram overlaps (and clipping) actually occur
    hyps = [rng.integers(1, 12, rng.integers(1, 15)).astype(np.int32)
            for _ in range(B)]
    refs = [[rng.integers(1, 12, rng.integers(2, 15)).astype(np.int32)
             for _ in range(rng.integers(1, 5))] for _ in range(B)]
    corpus, per = bleu_score_ids(hyps, refs, n=4, option=option)
    want_c, want_p = _bleu_python_fallback(hyps, refs, 4, option)
    np.testing.assert_allclose(corpus, want_c, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(per, want_p, rtol=1e-12, atol=1e-12)


@pytest.mark.skipif(not bleu_native_available(), reason="no C++ toolchain")
def test_native_bleu_edge_cases():
    # empty hypothesis, single-token hypothesis (guess_k = 0 for k > 0),
    # exact match, and the closest-reflen shorter-tie quirk (reflens 2 and 4
    # vs testlen 3 -> reflen 2 -> no brevity penalty on the corpus ratio)
    hyps = [np.zeros(0, np.int32), np.asarray([5], np.int32),
            np.asarray([1, 2, 3], np.int32), np.asarray([1, 2, 3], np.int32)]
    refs = [[np.asarray([1, 2], np.int32)],
            [np.asarray([5, 6], np.int32)],
            [np.asarray([1, 2, 3], np.int32)],
            [np.asarray([1, 2], np.int32), np.asarray([1, 2, 3, 4], np.int32)]]
    corpus, per = bleu_score_ids(hyps, refs, n=4)
    want_c, want_p = _bleu_python_fallback(hyps, refs, 4, "closest")
    np.testing.assert_allclose(corpus, want_c, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(per, want_p, rtol=1e-12, atol=1e-12)
    # exact 3-token match: BLEU-2 ~1.0; BLEU-4 is smoothing-dominated
    # (zero 4-gram slots -> tiny/small), faithfully matching pycocoevalcap
    assert per[2, 1] > 0.99


@pytest.mark.skipif(not rouge_native_available(), reason="no C++ toolchain")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_rouge_matches_python(seed):
    rng = np.random.default_rng(seed)
    B = 12
    hyps = [rng.integers(1, 10, rng.integers(0, 15)).astype(np.int32)
            for _ in range(B)]
    refs = [[rng.integers(1, 10, rng.integers(1, 15)).astype(np.int32)
             for _ in range(rng.integers(1, 5))] for _ in range(B)]
    got = rouge_score_ids(hyps, refs)
    want = _rouge_python_fallback(hyps, refs, 1.2)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # exact match scores 1.0
    same = [np.asarray([1, 2, 3], np.int32)]
    np.testing.assert_allclose(
        rouge_score_ids(same, [[same[0]]]), [1.0], atol=1e-15)


def test_scst_reward_bleu_weight_matches_reference_formula():
    """bleu_reward_weight mixes per-item BLEU-4 into the advantage exactly as
    the reference (modelutils.py:227-233): scores = w_c*cider + w_b*bleu4,
    advantage = scores[:B] - scores[B:]."""
    from lrp_imagecaptioning_tpu.data.vocab import build_word_map
    from lrp_imagecaptioning_tpu.engine.scst import (
        array_to_str, get_self_critical_reward)
    from lrp_imagecaptioning_tpu.metrics.bleu import corpus_bleu

    wm = build_word_map([["a", "dog", "runs", "cat", "sits"]], min_word_freq=1)
    gen = np.asarray([[wm["a"], wm["dog"], wm["runs"], 0],
                      [wm["cat"], wm["runs"], 0, 0]])
    greedy = np.asarray([[wm["a"], wm["runs"], 0, 0],
                         [wm["cat"], wm["sits"], 0, 0]])
    caps = np.asarray([
        [[wm.start, wm["a"], wm["dog"], wm["runs"], wm.end]],
        [[wm.start, wm["cat"], wm["sits"], wm.end, 0]],
    ])
    rew = get_self_critical_reward(greedy, caps, gen, wm,
                                   cider_reward_weight=0.0,
                                   bleu_reward_weight=1.0)
    # hand-build the same corpus through the string scorer
    hyps = [array_to_str(gen[i], wm) for i in range(2)]
    hyps += [array_to_str(greedy[i], wm) for i in range(2)]
    refs = [[array_to_str(caps[i][j], wm) for j in range(1)] for i in range(2)]
    _, per = corpus_bleu(hyps, refs + refs)
    want = np.asarray(per[3][:2]) - np.asarray(per[3][2:])
    np.testing.assert_allclose(rew[:, 0], want, rtol=1e-6)  # rew is float32
    assert rew[0, 0] > 0  # sampled hit the full reference; greedy did not

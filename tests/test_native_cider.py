"""Native C++ CIDEr scorer: exact parity with the (pycocoevalcap-verified)
Python scorer, SCST reward path still correct."""

import numpy as np
import pytest

from lrp_imagecaptioning_tpu.metrics.native import (
    _python_fallback,
    cider_score_ids,
    native_available,
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

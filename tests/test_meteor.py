"""METEOR alignment semantics + jar subprocess gating (round-2 verdict #5).

The native aligner must implement the Meteor resolution criteria — maximize
matches, then minimize chunks — not greedy left-to-right; the fixtures below
are hand-computed cases where greedy provably differs.  The jar path speaks
the standard coco-caption ``-stdio`` protocol, exercised with a fake java.
"""

import os
import stat

import numpy as np
import pytest

from lrp_imagecaptioning_tpu.metrics.meteor import _align, meteor_score


def _score(m, ch, nh, nr, alpha=0.9, beta=3.0, gamma=0.5):
    p, q = m / nh, m / nr
    fmean = p * q / (alpha * p + (1 - alpha) * q)
    return fmean * (1 - gamma * (ch / m) ** beta)


def test_align_minimizes_chunks_crossing():
    """h='the cat the dog' vs r='the dog the cat': greedy left-to-right maps
    the0->the0, cat->cat3, the2->the2, dog->dog1 = 4 chunks; the optimal
    alignment pairs ('the cat'->r2,r3; 'the dog'->r0,r1) = 2 chunks."""
    m, ch = _align("the cat the dog".split(), "the dog the cat".split())
    assert (m, ch) == (4, 2)
    avg, _ = meteor_score(["the cat the dog"], [["the dog the cat"]])
    assert avg == pytest.approx(_score(4, 2, 4, 4))  # = 0.9375


def test_align_prefers_contiguous_stem_over_crossing_exact():
    """h='runs running' vs r='running runs': two crossing EXACT matches give
    2 chunks; the straight-through STEM alignment gives 1 chunk with the
    same match count — Meteor's comparator prefers fewer chunks."""
    m, ch = _align("runs running".split(), "running runs".split())
    assert (m, ch) == (2, 1)
    avg, _ = meteor_score(["runs running"], [["running runs"]])
    assert avg == pytest.approx(_score(2, 1, 2, 2))  # = 0.9375


def test_align_classic_insertion():
    """Classic Meteor example: one inserted word splits the alignment into
    exactly two chunks."""
    h = "the president spoke to the audience"
    r = "the president then spoke to the audience"
    m, ch = _align(h.split(), r.split())
    assert (m, ch) == (6, 2)
    avg, _ = meteor_score([h], [[r]])
    assert avg == pytest.approx(_score(6, 2, 6, 7))


def test_align_identical_and_disjoint():
    assert _align("a dog runs".split(), "a dog runs".split()) == (3, 1)
    assert _align("purple elephant".split(), "the dog runs".split())[0] == 0
    avg, _ = meteor_score(["a dog runs"], [["a dog runs"]])
    assert avg == pytest.approx(_score(3, 1, 3, 3))


def test_align_maximizes_matches_before_chunks():
    """A one-chunk alignment with fewer matches must lose to a two-chunk
    alignment with more: h='a b c' r='a x b c' -> 3 matches, 2 chunks
    (a | b c), never the contiguous 2-match 'b c' alone."""
    m, ch = _align("a b c".split(), "a x b c".split())
    assert (m, ch) == (3, 2)


FAKE_JAVA = """#!/usr/bin/env python3
import sys
# speaks the meteor -stdio protocol: one stats line per SCORE line; for the
# EVAL line, one 0.25 per stats block then the 0.5 aggregate
for line in sys.stdin:
    line = line.strip()
    if line.startswith("SCORE"):
        print("stats %d" % len(line.split("|||")))
        sys.stdout.flush()
    elif line.startswith("EVAL"):
        n = line.count("|||")
        for _ in range(n):
            print("0.25")
        print("0.5")
        sys.stdout.flush()
"""


def _install_fake_java(tmp_path, monkeypatch):
    java = tmp_path / "java"
    java.write_text(FAKE_JAVA)
    java.chmod(java.stat().st_mode | stat.S_IEXEC)
    jar = tmp_path / "meteor-1.5.jar"
    jar.write_bytes(b"fake jar")
    monkeypatch.setenv("PATH", f"{tmp_path}{os.pathsep}{os.environ['PATH']}")
    monkeypatch.setenv("METEOR_JAR", str(jar))


def test_meteor_jar_protocol(tmp_path, monkeypatch):
    _install_fake_java(tmp_path, monkeypatch)
    from lrp_imagecaptioning_tpu.metrics.meteor_jar import (
        meteor_available,
        meteor_jar_score,
    )

    assert meteor_available()
    overall, per = meteor_jar_score(
        ["a dog runs", "a cat"], [["a dog runs", "dog running"], ["two cats"]])
    assert overall == 0.5
    assert per == [0.25, 0.25]


def test_meteor_adapter_uses_jar(tmp_path, monkeypatch):
    _install_fake_java(tmp_path, monkeypatch)
    from lrp_imagecaptioning_tpu.metrics import METEOR

    out = METEOR().calculate(
        {0: [{"caption": "a dog runs"}]}, {0: [{"caption": "a dog runs"}]})
    np.testing.assert_allclose(out["meteor"], 0.5)


def test_meteor_degrades_to_native_without_jar(monkeypatch):
    monkeypatch.delenv("METEOR_JAR", raising=False)
    import lrp_imagecaptioning_tpu.metrics.meteor_jar as mj

    monkeypatch.setattr(mj, "find_meteor_jar", lambda: None)
    from lrp_imagecaptioning_tpu.metrics import METEOR

    out = METEOR().calculate(
        {0: [{"caption": "a dog runs"}]}, {0: [{"caption": "a dog runs"}]})
    np.testing.assert_allclose(out["meteor"], _score(3, 1, 3, 3))

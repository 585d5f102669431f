"""METEOR WordNet-synonymy + paraphrase stages (environment-gated corpora).

METEOR 1.5's English pipeline is exact -> stem -> WordNet synonymy ->
paraphrase; the corpora can't ship in a zero-egress build, so the stages
activate via $WORDNET_DIR / $METEOR_PARAPHRASE (mirroring the $METEOR_JAR /
$SPICE_JAR gates) and are protocol-tested here with tiny fake corpora.
"""

import gzip

import numpy as np
import pytest

from lrp_imagecaptioning_tpu.metrics.meteor import _align_spans, meteor_score
from lrp_imagecaptioning_tpu.metrics.wordnet import (
    ParaphraseTable,
    WordNetSynonyms,
    load_paraphrases,
    load_wordnet,
)

WN_HEADER = "  1 This fake header line starts with spaces per WNdb format.\n"

# index line: lemma pos synset_cnt p_cnt ptr... sense_cnt tagsense_cnt offsets
INDEX_NOUN = WN_HEADER + "\n".join([
    "car n 2 3 @ ~ #p 2 2 02958343 02959942",
    "automobile n 1 2 @ ~ 1 0 02958343",
    "bank n 2 1 @ 2 1 09213565 08420278",
    "sports_car n 1 1 @ 1 0 02958343",  # multi-word lemma: excluded
]) + "\n"

INDEX_VERB = WN_HEADER + "\n".join([
    "run v 1 1 @ 1 1 01926311",
    "sprint v 1 1 @ 1 1 01926311",
]) + "\n"


def _write_wordnet(tmp_path):
    d = tmp_path / "dict"
    d.mkdir()
    (d / "index.noun").write_text(INDEX_NOUN)
    (d / "index.verb").write_text(INDEX_VERB)
    return d


def _score(mh, mr, ch, nh, nr, alpha=0.9, beta=3.0, gamma=0.5):
    p, q = mh / nh, mr / nr
    fmean = p * q / (alpha * p + (1 - alpha) * q)
    return fmean * (1 - gamma * (ch / ((mh + mr) / 2)) ** beta)


def test_wordnet_parse_and_synonymy(tmp_path):
    wn = WordNetSynonyms(_write_wordnet(tmp_path))
    assert wn.are_synonyms("car", "automobile")       # share 02958343
    assert wn.are_synonyms("Automobile", "CAR")       # case-folded lookup
    assert wn.are_synonyms("run", "sprint")           # verb index
    assert not wn.are_synonyms("car", "bank")
    assert not wn.are_synonyms("car", "run")          # same-pos offsets only
    assert wn.synsets("sports_car") == frozenset()    # multi-word excluded
    assert wn.synsets("missing") == frozenset()
    assert not wn.are_synonyms("missing", "missing")  # no synsets -> False


def test_wordnet_requires_index_files(tmp_path):
    with pytest.raises(FileNotFoundError):
        WordNetSynonyms(tmp_path)  # empty dir


def test_synonym_stage_adds_matches(tmp_path):
    wn = WordNetSynonyms(_write_wordnet(tmp_path))
    h, r = "a car".split(), "a automobile".split()
    assert _align_spans(h, r) == (1, 1, 1)            # stage off
    assert _align_spans(h, r, syn=wn) == (2, 2, 1)    # contiguous synonym
    # paraphrases=None would consult the env; pass an empty table instead
    avg, _ = meteor_score(["a car"], [["a automobile"]],
                          synonyms=wn, paraphrases=_empty_table())
    assert avg == pytest.approx(_score(2, 2, 1, 2, 2))


def _empty_table():
    class _T:
        max_len = 1

        def paraphrases(self, phrase):
            return set()

    return _T()


def test_exact_preferred_over_synonym_on_ties(tmp_path):
    wn = WordNetSynonyms(_write_wordnet(tmp_path))
    # 'car' could match r0 (exact) or r1 (synonym); both give 1 match /
    # 1 chunk, so the stage-weight tie-break must pick the exact pair (j=0).
    mh, mr, ch = _align_spans(["car"], ["car", "automobile"], syn=wn)
    assert (mh, mr, ch) == (1, 1, 1)


PARAPHRASES = "\n".join([
    "right away ||| immediately",
    "0.9 ||| sofa ||| couch",          # leading weight segment ignored
    "malformed line without sep",      # skipped
    "right away ||| right away",       # identity: skipped
]) + "\n"


def test_paraphrase_table_parse(tmp_path):
    p = tmp_path / "para.txt"
    p.write_text(PARAPHRASES)
    t = ParaphraseTable(p)
    assert t.max_len == 2
    assert ("immediately",) in t.paraphrases(("right", "away"))
    assert ("right", "away") in t.paraphrases(("immediately",))  # symmetric
    assert ("couch",) in t.paraphrases(("sofa",))
    assert t.paraphrases(("malformed",)) == set()


def test_paraphrase_table_gz(tmp_path):
    p = tmp_path / "para.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write(PARAPHRASES)
    assert ("couch",) in ParaphraseTable(p).paraphrases(("sofa",))


def test_paraphrase_span_alignment(tmp_path):
    p = tmp_path / "para.txt"
    p.write_text(PARAPHRASES)
    t = ParaphraseTable(p)
    h = "he left right away".split()
    r = "he left immediately".split()
    assert _align_spans(h, r) == (2, 2, 1)                 # stage off
    mh, mr, ch = _align_spans(h, r, para=t)
    assert (mh, mr, ch) == (4, 3, 1)  # 2x1 span extends the contiguous run
    avg, _ = meteor_score(["he left right away"], [["he left immediately"]],
                          synonyms=_no_syn(), paraphrases=t)
    assert avg == pytest.approx(_score(4, 3, 1, 4, 3))


def _no_syn():
    class _S:
        def are_synonyms(self, a, b):
            return False

    return _S()


def test_single_word_paraphrase(tmp_path):
    p = tmp_path / "para.txt"
    p.write_text(PARAPHRASES)
    t = ParaphraseTable(p)
    mh, mr, ch = _align_spans(["a", "sofa"], ["a", "couch"], para=t)
    assert (mh, mr, ch) == (2, 2, 1)


def test_env_gated_loaders(tmp_path, monkeypatch):
    monkeypatch.delenv("WORDNET_DIR", raising=False)
    monkeypatch.delenv("METEOR_PARAPHRASE", raising=False)
    assert load_wordnet() is None
    assert load_paraphrases() is None

    monkeypatch.setenv("WORDNET_DIR", str(_write_wordnet(tmp_path)))
    para = tmp_path / "p.txt"
    para.write_text(PARAPHRASES)
    monkeypatch.setenv("METEOR_PARAPHRASE", str(para))
    assert load_wordnet().are_synonyms("car", "automobile")
    assert len(load_paraphrases()) > 0

    # scorer picks the corpora up from the environment by default
    avg, _ = meteor_score(["a car"], [["a automobile"]])
    assert avg == pytest.approx(_score(2, 2, 1, 2, 2))


def test_unusable_corpora_warn_and_degrade(tmp_path, monkeypatch):
    monkeypatch.setenv("WORDNET_DIR", str(tmp_path / "nope"))
    monkeypatch.setenv("METEOR_PARAPHRASE", str(tmp_path / "nope.txt"))
    with pytest.warns(UserWarning):
        assert load_wordnet() is None
    with pytest.warns(UserWarning):
        assert load_paraphrases() is None
    avg, _ = meteor_score(["a dog"], [["a dog"]])  # still scores
    assert avg > 0


def test_meteor_adapter_uses_env_corpora(tmp_path, monkeypatch):
    monkeypatch.delenv("METEOR_JAR", raising=False)
    import lrp_imagecaptioning_tpu.metrics.meteor_jar as mj

    monkeypatch.setattr(mj, "find_meteor_jar", lambda: None)
    monkeypatch.setenv("WORDNET_DIR", str(_write_wordnet(tmp_path)))
    from lrp_imagecaptioning_tpu.metrics import METEOR

    out = METEOR().calculate(
        {0: [{"caption": "a car"}]}, {0: [{"caption": "a automobile"}]})
    np.testing.assert_allclose(out["meteor"], _score(2, 2, 1, 2, 2))

"""Stanford-PTB tokenizer golden suite (round-2 verdict #7).

The PTB tokenizer sits under EVERY caption metric (ptbtokenizer.py:28-53);
a silent divergence shifts every reported BLEU/CIDEr/ROUGE number vs the
reference.  Expected outputs below are derived from the CoreNLP PTBTokenizer
spec (ptb3Escaping defaults, ``-lowerCase``) followed by the reference's
punctuation removal — including its case-mismatch quirk that keeps the
lowercased ``-lrb-`` bracket escapes (removal list checks ``-LRB-``).

Deliberate divergences from the real jar are documented in the tokenizer
module docstring (multi-letter abbreviation periods, slash compounds,
assimilations) and are NOT asserted here.
"""

import random
import string

import pytest

from lrp_imagecaptioning_tpu.metrics.tokenizer import (
    ptb_tokenize_sentence, ptb_tokenize_sentence_py)
from lrp_imagecaptioning_tpu.metrics.tokenizer_native import (
    native_available, ptb_tokenize_sentence_native)

GOLDEN = [
    # -- clitics / contractions (PTB: don't -> do n't, can't -> ca n't) -----
    ("don't stop", "do n't stop"),
    ("can't see it", "ca n't see it"),
    ("won't go home", "wo n't go home"),
    ("isn't it nice", "is n't it nice"),
    ("doesn't matter", "does n't matter"),
    ("couldn't find one", "could n't find one"),
    ("shouldn't've done that", "should n't 've done that"),
    ("it's raining", "it 's raining"),
    ("the dog's bone", "the dog 's bone"),
    ("i'm here", "i 'm here"),
    ("we're done", "we 're done"),
    ("they've gone", "they 've gone"),
    ("she'll come", "she 'll come"),
    ("he'd rather walk", "he 'd rather walk"),
    ("james' hat", "james hat"),      # trailing possessive ' stripped
    ("the dogs' toys", "the dogs toys"),
    ("five o'clock shadow", "five o'clock shadow"),  # internal ' kept whole
    ("y'all come back", "y' all come back"),  # PTBLexer special case
    ("'tis the season", "'t is the season"),
    # -- punctuation removal (reference list, ptbtokenizer.py:21-22) --------
    ("a dog runs.", "a dog runs"),
    ("wait... what", "wait what"),
    ("really?!", "really"),
    ("one, two, and three", "one two and three"),
    ("a house -- a home", "a house a home"),
    ("first: second; third", "first second third"),
    ('"a quoted dog"', "a quoted dog"),
    ("the 'best' dog", "the best dog"),
    ("a dog - a cat", "a dog a cat"),
    ("hello!!!", "hello"),
    ("?!...", ""),
    # -- hyphenated compounds stay whole (PTB keeps them joined) ------------
    ("state-of-the-art design", "state-of-the-art design"),
    ("a well-dressed man", "a well-dressed man"),
    ("a t-shirt and jeans", "a t-shirt and jeans"),
    ("an e-mail address", "an e-mail address"),
    ("mother-in-law's house", "mother-in-law 's house"),
    ("a one-of-a-kind two-tone bike", "a one-of-a-kind two-tone bike"),
    # -- numbers ------------------------------------------------------------
    ("1,000 dogs", "1,000 dogs"),
    ("a 3.5 inch screen", "a 3.5 inch screen"),
    ("it costs $5", "it costs $ 5"),          # currency sign splits off
    ("50% off today", "50 % off today"),      # percent sign splits off
    ("$1,000.50 exactly", "$ 1,000.50 exactly"),
    ("the year 2020", "the year 2020"),
    ("2-3 people sitting", "2-3 people sitting"),   # numeric range joined
    ("a 3d movie", "a 3d movie"),
    ("room 101a", "room 101a"),
    # -- brackets: kept lowercase (reference case-mismatch quirk) -----------
    ("a dog (brown) runs", "a dog -lrb- brown -rrb- runs"),
    ("a [sic] cat", "a -lsb- sic -rsb- cat"),
    ("curly {braces} here", "curly -lcb- braces -rcb- here"),
    # -- single-letter acronyms keep periods --------------------------------
    ("the u.s. flag", "the u.s. flag"),
    ("a u.s.a. themed party", "a u.s.a. themed party"),
    ("an m.r.i. machine", "an m.r.i. machine"),
    # -- unicode ------------------------------------------------------------
    ("a café table", "a café table"),
    ("naïve approach", "naïve approach"),
    ("don’t stop", "do n't stop"),            # curly apostrophe normalized
    ("“quoted” words", "quoted words"),        # curly double quotes stripped
    ("em—dash splits", "em dash splits"),      # em dash -> -- -> removed
    ("range 5–6", "range 5 6"),                # en dash -> -- -> removed
    ("her résumé shines", "her résumé shines"),
    # -- case / whitespace / degenerate -------------------------------------
    ("A DOG RUNS", "a dog runs"),
    ("  extra   spaces  ", "extra spaces"),
    ("", ""),
    ("...", ""),
    ("newline\nin caption", "newline in caption"),
    ("MixedCase Dog", "mixedcase dog"),
    # -- symbols kept by the reference (not in its removal list) ------------
    ("black & white photo", "black & white photo"),
    ("#1 dog in town", "# 1 dog in town"),
    ("dogs + cats", "dogs + cats"),
    ("a dog @ the park", "a dog @ the park"),
]


@pytest.mark.parametrize("raw,expected", GOLDEN,
                         ids=[g[0][:30] or "<empty>" for g in GOLDEN])
def test_ptb_golden(raw, expected):
    # the dispatching entry point (native where the toolchain allows)
    assert ptb_tokenize_sentence(raw) == expected
    # the pure-Python scanner must independently pass the same goldens
    assert ptb_tokenize_sentence_py(raw) == expected


# ------------------------------------------------- native C++ tokenizer ----

@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_ptb_native_matches_golden():
    for raw, expected in GOLDEN:
        assert ptb_tokenize_sentence_native(raw) == expected, raw


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_ptb_native_matches_python_randomized():
    """Cross-implementation property test: the C++ scanner and the Python
    scanner must agree byte-for-byte on adversarial random strings over the
    caption-corpus character universe (ASCII, PTB punctuation, unicode
    quotes/dashes, Latin-1 letters, currency)."""
    charset = (string.ascii_letters + string.digits + " " * 20
               + ".,!?;:'\"-()[]{}/$%&*#@+=_" + "’‘“”–—" + "éüçÀÑ€ " + "\n\t")
    rng = random.Random(1234)
    for _ in range(3000):
        s = "".join(rng.choice(charset) for _ in range(rng.randint(0, 60)))
        assert ptb_tokenize_sentence_native(s) == ptb_tokenize_sentence_py(s), repr(s)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_ptb_native_long_sentence_overflow_path():
    """Escape-heavy input whose tokenized form exceeds the 2x first-try
    buffer exercises the retry branch (brackets expand 1 -> 6 bytes)."""
    s = "(" * 500 + " a dog " + ")" * 500
    expected = " ".join(["-lrb-"] * 500 + ["a", "dog"] + ["-rrb-"] * 500)
    assert ptb_tokenize_sentence_native(s) == expected
    assert ptb_tokenize_sentence_py(s) == expected

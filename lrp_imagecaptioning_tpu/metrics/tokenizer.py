"""Pure-Python Stanford-PTB-style tokenizer.

Replaces the reference's Java subprocess (Stanford CoreNLP PTBTokenizer
invoked as ``-preserveLines -lowerCase``, ``pycocoevalcap/tokenizer/
ptbtokenizer.py:28-53``) so evaluation has no JVM dependency (SURVEY.md §2
implication).  Behaviors follow the CoreNLP PTBTokenizer spec with
ptb3Escaping (the CLI default): clitic splitting (``don't -> do n't``,
``can't -> ca n't``), hyphenated words kept whole, currency/percent signs
split off numbers, single-letter acronyms keep their periods, unicode
quotes/dashes normalized to their PTB ASCII escapes.  After tokenization the
reference's punctuation list is removed (ptbtokenizer.py:21-22,64-65).

Replicated reference QUIRK: the Java tokenizer lowercases every token —
including the bracket escapes, which come out ``-lrb-``/``-rrb-`` — but the
removal list checks the UPPERCASE forms ``-LRB-``/``-RRB-``
(ptbtokenizer.py:21).  Brackets therefore survive into the reference's
scored captions, and they survive here too.

Documented divergences from the real jar (each immaterial for caption
corpora, none fixable without the jar): multi-letter abbreviations lose a
trailing period (``ph.d.`` -> ``ph.d``); ``black/white`` splits at the slash
(kept as a ``/`` token) where CoreNLP keeps it whole; assimilations like
``gonna``/``cannot`` are not split.
"""

from __future__ import annotations

import re

# The punctuation tokens the reference removes after tokenization
# (ptbtokenizer.py:21-22).  NOTE: the -LRB- family is listed uppercase but
# tokens arrive lowercased — see the module docstring quirk.
PUNCTUATIONS = {
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
}

_CLITICS = re.compile(r"(?i)('ll|'re|'ve|n't|'s|'m|'d)$")
# PTB special-cased splits (PTBLexer): leading-apostrophe contractions
_SPECIAL = {
    "y'all": ["y'", "all"],
    "'tis": ["'t", "is"],
    "'twas": ["'t", "was"],
}
# ptb3Escaping bracket escapes.  Emitted LOWERCASE like the -lowerCase Java
# output, so the uppercase removal list does NOT strip them (reference quirk).
_BRACKETS = {
    "(": "-lrb-", ")": "-rrb-", "{": "-lcb-", "}": "-rcb-",
    "[": "-lsb-", "]": "-rsb-",
    '"': "''",  # straight double quote -> PTB quote escape (stripped)
}
# unicode normalization the jar's ptb3Escaping performs before tokenizing
_UNICODE_NORM = {
    "’": "'", "‘": "'",   # curly single quotes -> apostrophe
    "“": '"', "”": '"',   # curly double quotes
    "–": " -- ", "—": " -- ",  # en/em dash -> PTB double dash
}
# token alternation, first match wins:
#   ellipsis | double dash | single-letter acronym (u.s.a.) |
#   number (digit-led; commas/periods/hyphens joined: 1,000 3.5 2-3 3d) |
#   word (letter-led; hyphens/apostrophes/periods joined: t-shirt o'clock) |
#   any single non-space symbol
_TOKEN_RE = re.compile(
    r"'t(?:is|was)\b|\.\.\.|--|(?:[^\W\d_]\.){2,}|\d[\w]*(?:[-.,][\w]+)*"
    r"|[^\W\d_][\w]*(?:[-'.][\w]+)*|[^\w\s]"
)


def _ptb_word(tok: str) -> list[str]:
    """Split trailing clitics off a word like PTB does (don't -> do n't)."""
    if tok in _SPECIAL:
        return list(_SPECIAL[tok])
    out = []
    m = _CLITICS.search(tok)
    if m and len(tok) > len(m.group(0)):
        out.extend(_ptb_word(tok[: m.start()]))
        out.append(m.group(0))
    else:
        out.append(tok)
    return out


def ptb_tokenize_sentence(sentence: str) -> str:
    """Tokenize one sentence, returning space-joined tokens with the
    reference's punctuation list removed.  Dispatches to the native C++
    scanner (``native/ptb_tokenizer.cpp``) when the toolchain allows —
    semantics pinned equal by the golden suite + randomized cross-check in
    ``tests/test_ptb_golden.py`` — and falls back to this pure-Python
    implementation otherwise."""
    from .tokenizer_native import native_available, ptb_tokenize_sentence_native

    if native_available():
        return ptb_tokenize_sentence_native(sentence)
    return ptb_tokenize_sentence_py(sentence)


def ptb_tokenize_sentence_py(sentence: str) -> str:
    """The pure-Python scanner (reference implementation for the native
    cross-check; always available)."""
    s = sentence.replace("\n", " ").lower()
    for src, dst in _UNICODE_NORM.items():
        s = s.replace(src, dst)
    toks: list[str] = []
    for raw in _TOKEN_RE.findall(s):
        raw = _BRACKETS.get(raw, raw)
        for t in _ptb_word(raw):
            if t not in PUNCTUATIONS:
                toks.append(t)
    return " ".join(toks)


def ptb_tokenize(captions_for_image: dict) -> dict:
    """Same API shape as the reference PTBTokenizer.tokenize: input
    ``{id: [{'caption': str}, ...]}``, output ``{id: [str, ...]}``."""
    out: dict = {}
    for k, caps in captions_for_image.items():
        out[k] = [ptb_tokenize_sentence(c["caption"]) for c in caps]
    return out

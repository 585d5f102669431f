"""Pure-Python PTB-style tokenizer.

Replaces the reference's Java subprocess (Stanford CoreNLP PTBTokenizer,
``pycocoevalcap/tokenizer/ptbtokenizer.py:28-53``) so evaluation has no JVM
dependency (SURVEY.md §2 implication).  Implements the subset of PTB behavior
that matters for caption scoring: lowercasing, splitting punctuation/clitics,
then removing the same punctuation list the reference strips.
"""

from __future__ import annotations

import re

# The punctuation tokens the reference removes after tokenization
# (ptbtokenizer.py:21-22).
PUNCTUATIONS = {
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
}

_CLITICS = re.compile(
    r"(?i)('ll|'re|'ve|n't|'s|'m|'d)$"
)
_BRACKETS = {"(": "-LRB-", ")": "-RRB-", "{": "-LCB-", "}": "-RCB-"}
# core split: words, multi-char punctuation, single punctuation
_TOKEN_RE = re.compile(r"\.\.\.|--|[\w$%]+(?:['\.][\w]+)*|[^\w\s]")


def _ptb_word(tok: str) -> list[str]:
    """Split trailing clitics off a word like PTB does (don't -> do n't)."""
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
    reference's punctuation list removed."""
    toks: list[str] = []
    for raw in _TOKEN_RE.findall(sentence.replace("\n", " ").lower()):
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

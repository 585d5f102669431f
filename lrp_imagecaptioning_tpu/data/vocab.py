"""Vocabulary / word-map construction and caption encoding.

Byte-compatible with the reference's rules (``dataset/preparedataset.py:149-198``):

- word ids 1..N in first-seen order for words with freq >= ``min_word_freq``
  (3 for Flickr30K, 4 for COCO2017),
- ``<unk>``, ``<start>``, ``<end>`` appended after the regular words,
- ``<pad>`` = 0,
- captions encoded ``<start> w... <end> <pad>*`` padded to ``max_len + 2`` with
  ``caplen = len(tokens) + 2``.
"""

from __future__ import annotations

import json
import re
from collections import Counter
from dataclasses import dataclass
from typing import Iterable, Sequence

PAD, UNK, START, END = "<pad>", "<unk>", "<start>", "<end>"
SPECIALS = (PAD, UNK, START, END)

# Reference tokenizes with nltk's RegexpTokenizer(r'\w+') (preparedataset.py:481).
_WORD_RE = re.compile(r"\w+")


def simple_tokenize(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


@dataclass(frozen=True)
class WordMap:
    """Immutable word->id mapping with the reference's layout."""

    word_to_id: dict[str, int]

    @property
    def id_to_word(self) -> dict[int, str]:
        return {v: k for k, v in self.word_to_id.items()}

    def __len__(self) -> int:
        return len(self.word_to_id)

    def __getitem__(self, word: str) -> int:
        return self.word_to_id[word]

    def __contains__(self, word: str) -> bool:
        return word in self.word_to_id

    @property
    def pad(self) -> int:
        return self.word_to_id[PAD]

    @property
    def unk(self) -> int:
        return self.word_to_id[UNK]

    @property
    def start(self) -> int:
        return self.word_to_id[START]

    @property
    def end(self) -> int:
        return self.word_to_id[END]

    # Note: vocab_size == len(word_map); ids span 0..len (pad=0, words 1..N,
    # specials N+1..N+3) so the embedding table needs len+1 rows.  The reference
    # sizes its embedding as len(word_map) and relies on <pad>=0 never being
    # looked up at the final id — we keep len+1 to be safe and slice logits to
    # vocab_size for parity.
    @property
    def num_embeddings(self) -> int:
        return max(self.word_to_id.values()) + 1

    def get(self, word: str, default: int | None = None) -> int:
        if default is None:
            default = self.unk
        return self.word_to_id.get(word, default)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.word_to_id, f)

    @classmethod
    def load(cls, path: str) -> "WordMap":
        with open(path) as f:
            return cls(json.load(f))


def build_word_map(
    tokenized_captions: Iterable[Sequence[str]], min_word_freq: int
) -> WordMap:
    """Build the word map exactly as ``preparedataset.py:149-157``."""
    freq: Counter[str] = Counter()
    for tokens in tokenized_captions:
        freq.update(tokens)
    words = [w for w in freq.keys() if freq[w] >= min_word_freq]
    word_map = {w: i + 1 for i, w in enumerate(words)}
    word_map[UNK] = len(word_map) + 1
    word_map[START] = len(word_map) + 1
    word_map[END] = len(word_map) + 1
    word_map[PAD] = 0
    return WordMap(word_map)


def encode_caption(
    tokens: Sequence[str], word_map: WordMap, max_len: int
) -> tuple[list[int], int]:
    """``<start> w... <end> <pad>*`` padded to max_len+2 (preparedataset.py:181-186)."""
    if len(tokens) > max_len:
        raise ValueError(f"caption longer than max_len={max_len}: {len(tokens)}")
    enc = (
        [word_map.start]
        + [word_map.get(w) for w in tokens]
        + [word_map.end]
        + [word_map.pad] * (max_len - len(tokens))
    )
    return enc, len(tokens) + 2


def decode_to_words(
    ids: Sequence[int], word_map: WordMap, strip_specials: bool = True
) -> list[str]:
    """Ids -> words, dropping <start>/<end>/<unk>/<pad> like the reference's
    decoders (gridTDmodel.py:475)."""
    rev = word_map.id_to_word
    special_ids = {word_map.start, word_map.end, word_map.unk, word_map.pad}
    out = []
    for i in ids:
        i = int(i)
        if strip_specials and i in special_ids:
            continue
        out.append(rev.get(i, UNK))
    return out


# Trailing function words trimmed from decoded sentences
# (gridTDmodel.py:21 — includes 'and'; aoamodel.py:22 — does not; we keep both
# variants and default to the gridTD list).
BAD_ENDINGS = [
    "with", "in", "on", "of", "a", "at", "to", "for", "an", "this", "his",
    "her", "that", "the", "and",
]
BAD_ENDINGS_AOA = BAD_ENDINGS[:-1]


def bad_endings_for(model_type: str) -> list[str]:
    """The AoA family ships its own list without 'and' (aoamodel.py:22);
    gridTD/adaptive use the full list (gridTDmodel.py:21)."""
    return BAD_ENDINGS_AOA if model_type.startswith("aoa") else BAD_ENDINGS


def remove_bad_endings(sentences: list[str], bad_endings: Sequence[str] = tuple(BAD_ENDINGS)) -> list[str]:
    """Trim trailing function words (gridTDmodel.py:284-302): if trimming would
    empty the sentence, the original is kept."""
    out = []
    bad = set(bad_endings)
    for sentence in sentences:
        words = sentence.split(" ") if sentence else []
        trimmed = list(words)
        while trimmed and trimmed[-1] in bad:
            trimmed.pop()
        out.append(sentence if not trimmed else " ".join(trimmed))
    return out

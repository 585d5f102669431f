"""WordNet synonymy + paraphrase-table lookups for the METEOR scorer.

METEOR 1.5's English configuration runs four match stages — exact, stem,
WordNet synonymy, paraphrase (Denkowski & Lavie 2014; the reference intends
this capability through the absent METEOR jar, ``models/metrics.py:59-73``).
The corpora themselves cannot ship in this zero-egress build, so both stages
are environment-gated, mirroring the ``$METEOR_JAR``/``$SPICE_JAR`` pattern:

- ``$WORDNET_DIR`` — a WordNet ``dict`` directory (the standard WNdb layout:
  ``index.noun``/``index.verb``/``index.adj``/``index.adv``).  Two surface
  forms are synonyms when they share at least one synset, exactly Meteor's
  ``SynonymDictionary`` criterion (it ships synset files derived from these
  indexes).
- ``$METEOR_PARAPHRASE`` — a paraphrase table, plain text or ``.gz``.  Each
  line is ``phrase ||| paraphrase`` (a leading numeric segment, as in some
  ppdb-derived tables, is treated as a weight and ignored).  Lookup is
  symmetrized; multi-word phrases are supported and matched as spans.

Both loaders cache per path, degrade to ``None`` when unset/unreadable, and
are protocol-tested with tiny fake corpora (``tests/test_meteor_corpora.py``).
"""

from __future__ import annotations

import gzip
import os
import warnings
from pathlib import Path

_INDEX_FILES = ("index.noun", "index.verb", "index.adj", "index.adv")


class WordNetSynonyms:
    """Surface-form -> synset-id sets parsed from WordNet index files.

    Index line format (WNdb ``wninput(5WN)``)::

        lemma pos synset_cnt p_cnt [ptr_symbol...] sense_cnt tagsense_cnt
        synset_offset [synset_offset...]

    The last ``synset_cnt`` fields are the offsets; a synset is identified by
    ``(pos, offset)``.  Lemmas are lowercase with underscores for spaces; only
    single-word lemmas participate (multi-word synonymy is the paraphrase
    stage's job).
    """

    def __init__(self, dict_dir: str | Path):
        self._synsets: dict[str, frozenset] = {}
        acc: dict[str, set] = {}
        found_any = False
        for name in _INDEX_FILES:
            path = Path(dict_dir) / name
            if not path.is_file():
                continue
            found_any = True
            with open(path, encoding="utf-8", errors="replace") as f:
                for line in f:
                    if line.startswith(" "):  # license header block
                        continue
                    parts = line.split()
                    if len(parts) < 7:
                        continue
                    lemma, pos = parts[0], parts[1]
                    if "_" in lemma:
                        continue
                    try:
                        synset_cnt = int(parts[2])
                        p_cnt = int(parts[3])
                    except ValueError:
                        continue
                    offsets = parts[4 + p_cnt + 2:]
                    if len(offsets) != synset_cnt:
                        # tolerate trailing-field variations: take the last
                        # synset_cnt fields, which are always the offsets
                        offsets = parts[-synset_cnt:] if synset_cnt else []
                    acc.setdefault(lemma, set()).update(
                        (pos, off) for off in offsets)
        if not found_any:
            raise FileNotFoundError(
                f"no WordNet index.* files under {dict_dir}")
        self._synsets = {w: frozenset(s) for w, s in acc.items()}

    def synsets(self, word: str) -> frozenset:
        return self._synsets.get(word.lower(), frozenset())

    def are_synonyms(self, a: str, b: str) -> bool:
        sa = self.synsets(a)
        return bool(sa) and not sa.isdisjoint(self.synsets(b))


class ParaphraseTable:
    """Symmetrized phrase -> {phrase} table; phrases are word tuples."""

    def __init__(self, path: str | Path):
        self._table: dict[tuple, set] = {}
        self.max_len = 1
        opener = gzip.open if str(path).endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8", errors="replace") as f:
            for line in f:
                segs = [s.strip() for s in line.split("|||")]
                if len(segs) < 2:
                    continue
                try:  # optional leading weight segment (ppdb-style)
                    float(segs[0])
                    segs = segs[1:]
                except ValueError:
                    pass
                if len(segs) < 2:
                    continue
                p1 = tuple(segs[0].lower().split())
                p2 = tuple(segs[1].lower().split())
                if not p1 or not p2 or p1 == p2:
                    continue
                self._table.setdefault(p1, set()).add(p2)
                self._table.setdefault(p2, set()).add(p1)
                self.max_len = max(self.max_len, len(p1), len(p2))

    def paraphrases(self, phrase: tuple) -> set:
        return self._table.get(phrase, set())

    def __len__(self):
        return len(self._table)


_WN_CACHE: dict[str, WordNetSynonyms | None] = {}
_PP_CACHE: dict[str, ParaphraseTable | None] = {}


def load_wordnet() -> WordNetSynonyms | None:
    """$WORDNET_DIR-gated loader; warns once and returns None on failure."""
    dict_dir = os.environ.get("WORDNET_DIR", "")
    if not dict_dir:
        return None
    if dict_dir not in _WN_CACHE:
        try:
            _WN_CACHE[dict_dir] = WordNetSynonyms(dict_dir)
        except (OSError, FileNotFoundError) as e:
            warnings.warn(f"$WORDNET_DIR unusable ({e}); METEOR runs "
                          "without the synonymy stage")
            _WN_CACHE[dict_dir] = None
    return _WN_CACHE[dict_dir]


def load_paraphrases() -> ParaphraseTable | None:
    """$METEOR_PARAPHRASE-gated loader; warns once, None on failure."""
    path = os.environ.get("METEOR_PARAPHRASE", "")
    if not path:
        return None
    if path not in _PP_CACHE:
        try:
            _PP_CACHE[path] = ParaphraseTable(path)
        except OSError as e:
            warnings.warn(f"$METEOR_PARAPHRASE unusable ({e}); METEOR runs "
                          "without the paraphrase stage")
            _PP_CACHE[path] = None
    return _PP_CACHE[path]

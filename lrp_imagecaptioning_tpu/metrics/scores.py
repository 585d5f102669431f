"""Score adapter classes with the reference API (``models/metrics.py:10-89``).

``Score.calculate(id_to_prediction, id_to_references)`` takes dicts of
``{id: [{'caption': str}, ...]}``, PTB-tokenizes both sides (pure Python —
no Java subprocess) and returns ``{name: value}``.  BLEU expands to
``bleu_1..bleu_4`` like the reference adapter (metrics.py:33-48).

SPICE runs the real jar subprocess when java + ``spice-*.jar``/$SPICE_JAR are
present (pycocoevalcap/spice/spice.py), degrading to 0.0 with a warning like
the reference's METEOR fallback (metrics.py:62-67) otherwise.  BERT uses
``bert_score`` if installed, else 0.0.
"""

from __future__ import annotations

import warnings

from .bleu import corpus_bleu
from .cider import cider_score
from .meteor import meteor_score
from .rouge import rouge_l
from .tokenizer import ptb_tokenize


def _paired_lists(id_to_prediction: dict, id_to_references: dict):
    keys = list(id_to_prediction.keys())
    hyps = []
    refs = []
    for k in keys:
        preds = id_to_prediction[k]
        assert len(preds) == 1, "one hypothesis per id (cider.py:43 invariant)"
        hyps.append(preds[0])
        refs.append(list(id_to_references[k]))
    return hyps, refs


class Score:
    def __init__(self, score_name: str):
        self._score_name = score_name

    def _compute(self, hyps: list[str], refs: list[list[str]]):
        raise NotImplementedError

    def calculate(self, id_to_prediction: dict, id_to_references: dict) -> dict:
        preds = ptb_tokenize(id_to_prediction)
        refs = ptb_tokenize(id_to_references)
        hyps, refls = _paired_lists(preds, refs)
        avg = self._compute(hyps, refls)
        return {self._score_name: avg}


class BLEU(Score):
    def __init__(self, n: int = 4):
        super().__init__("bleu")
        self._n = n

    def calculate(self, id_to_prediction: dict, id_to_references: dict) -> dict:
        preds = ptb_tokenize(id_to_prediction)
        refs = ptb_tokenize(id_to_references)
        hyps, refls = _paired_lists(preds, refs)
        bleus, _ = corpus_bleu(hyps, refls, n=self._n)
        return {f"bleu_{i}": float(b) for i, b in enumerate(bleus, start=1)}


class CIDEr(Score):
    def __init__(self):
        super().__init__("cider")

    def _compute(self, hyps, refs):
        avg, _ = cider_score(hyps, refs)
        return float(avg)


class ROUGE(Score):
    def __init__(self):
        super().__init__("rouge")

    def _compute(self, hyps, refs):
        avg, _ = rouge_l(hyps, refs)
        return float(avg)


class METEOR(Score):
    """Real METEOR 1.5 when java + the jar are present ($METEOR_JAR — the
    reference's intended capability, metrics.py:59-73), else the native
    exact+Porter aligner (:mod:`.meteor`)."""

    def __init__(self):
        super().__init__("meteor")

    def _compute(self, hyps, refs):
        from .meteor_jar import meteor_available, meteor_jar_score

        if meteor_available():
            avg, _ = meteor_jar_score(hyps, refs)
            return float(avg)
        avg, _ = meteor_score(hyps, refs)
        return float(avg)


class SPICE(Score):
    """Real SPICE when java + the jar are present (pycocoevalcap/spice/
    spice.py:11,30-96), else warn + 0.0 like the reference's METEOR fallback
    (metrics.py:62-67)."""

    def __init__(self):
        super().__init__("spice")

    def _compute(self, hyps, refs):
        from .spice import spice_available, spice_score

        if spice_available():
            avg, _ = spice_score(hyps, refs)
            return float(avg)
        warnings.warn(
            "SPICE needs java + spice-*.jar ($SPICE_JAR); returning 0.0 "
            "(same graceful degradation as the reference METEOR fallback)."
        )
        return 0.0


class BERT(Score):
    """BERTScore — prefers the ``bert_score`` package if installed (exactly
    what the reference wraps, pycocoevalcap/bert/bert.py:43), else falls back
    to the native implementation (:mod:`.bertscore`, same algorithm on
    transformers directly), else warn + 0.0."""

    def __init__(self):
        super().__init__("bert")

    def _compute(self, hyps, refs):
        try:
            from bert_score import score as bert_score_fn  # type: ignore

            # reference aggregation (bert.py:27-46): one pair per reference
            flat_c = [h for h, rl in zip(hyps, refs) for _ in rl]
            flat_r = [r for rl in refs for r in rl]
            _, _, f1 = bert_score_fn(flat_c, flat_r, lang="en")
            return float(f1.mean())
        except ImportError:
            pass
        except Exception as e:  # package present but scoring failed (e.g. it
            # tried to download roberta-large in a zero-egress environment) —
            # degrade to the native/0.0 chain instead of aborting all metrics
            warnings.warn(f"bert_score package failed ({e}); trying the "
                          "native implementation.")
        from .bertscore import BertScoreUnavailable, bert_score_corpus

        try:
            avg, _ = bert_score_corpus(hyps, refs)
            return float(avg)
        except BertScoreUnavailable as e:
            warnings.warn(
                f"BERTScore unavailable ({e}); returning 0.0 (same graceful "
                "degradation as the reference METEOR fallback).")
            return 0.0
